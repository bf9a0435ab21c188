"""PLKSR — Partial Large-Kernel CNN.

Behavioral parity with /root/reference/neosr/archs/plksr_arch.py:23-409:
CCM/ICCM/DCCM channel mixers, partial large-kernel conv on the first
split_ratio fraction of channels (17x17 default), optional sparse/rect
variants, element-wise attention, 1x1 refine, pixel-shuffle with the
repeat-interleave nearest residual.  NHWC flax (training structure; the
reference's eval-time reparameterization is a deploy optimization).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle, trunc_normal_init
from neosr_tpu.utils.registry import ARCH_REGISTRY


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class DCCM(nn.Module):
    dim: int
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.dim * 2, 3, dtype=self.dtype)(x)
        x = _mish(x) if self.act == "mish" else gelu(x)
        return Conv2d(self.dim, 3, dtype=self.dtype,
                      kernel_init=trunc_normal_init())(x)


class CCM(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = gelu(Conv2d(self.dim * 2, 3, dtype=self.dtype)(x))
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype,
                      kernel_init=trunc_normal_init())(x)


class ICCM(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = gelu(Conv2d(self.dim * 2, 1, padding=0, dtype=self.dtype)(x))
        return Conv2d(self.dim, 3, dtype=self.dtype,
                      kernel_init=trunc_normal_init())(x)


class PLKConv(nn.Module):
    pdim: int
    kernel_size: int
    with_idt: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1, x2 = x[..., : self.pdim], x[..., self.pdim :]
        y = Conv2d(self.pdim, self.kernel_size, dtype=self.dtype,
                   kernel_init=trunc_normal_init())(x1)
        if self.with_idt:
            y = y + x1
        return jnp.concatenate([y, x2], axis=-1)


class RectSparsePLKConv(nn.Module):
    pdim: int
    kernel_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        m = self.kernel_size
        n = self.kernel_size // 3
        x1, x2 = x[..., : self.pdim], x[..., self.pdim :]
        init = trunc_normal_init()
        y = (
            Conv2d(self.pdim, (m, n), dtype=self.dtype, kernel_init=init)(x1)
            + Conv2d(self.pdim, (n, m), dtype=self.dtype, kernel_init=init)(x1)
            + Conv2d(self.pdim, (n, n), dtype=self.dtype, kernel_init=init)(x1)
        )
        return jnp.concatenate([y, x2], axis=-1)


class SparsePLKConv(nn.Module):
    pdim: int
    max_kernel_size: int
    sub_kernel_sizes: Sequence[int]
    dilations: Sequence[int]
    use_max_kernel: bool = False
    with_idt: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1, x2 = x[..., : self.pdim], x[..., self.pdim :]
        init = trunc_normal_init()
        out = x1 if self.with_idt else 0.0
        max_k = self.max_kernel_size
        for k, d in zip(self.sub_kernel_sizes, self.dilations):
            max_k = max(max_k, (k - 1) * d + 1)
            pad = (k // 2) * d
            out = out + nn.Conv(
                self.pdim, (k, k), kernel_dilation=(d, d),
                padding=((pad, pad), (pad, pad)),
                dtype=self.dtype, param_dtype=jnp.float32, kernel_init=init,
            )(x1)
        if self.use_max_kernel:
            out = out + Conv2d(self.pdim, max_k, dtype=self.dtype, kernel_init=init)(x1)
        return jnp.concatenate([out, x2], axis=-1)


class EA(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gate = jax.nn.sigmoid(
            Conv2d(self.dim, 3, dtype=self.dtype, kernel_init=trunc_normal_init())(x)
        )
        return x * gate


class PLKBlock(nn.Module):
    dim: int
    ccm_type: str
    max_kernel_size: int
    split_ratio: float
    lk_type: str = "PLK"
    use_max_kernel: bool = False
    sparse_kernels: Sequence[int] = (5, 5, 5, 5)
    sparse_dilations: Sequence[int] = (1, 2, 3, 4)
    with_idt: bool = False
    use_ea: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        skip = x
        mixer = {"CCM": CCM, "ICCM": ICCM, "DCCM": DCCM}[self.ccm_type]
        x = mixer(self.dim, dtype=self.dtype)(x)
        pdim = int(self.dim * self.split_ratio)
        if self.lk_type == "PLK":
            x = PLKConv(pdim, self.max_kernel_size, self.with_idt, self.dtype)(x)
        elif self.lk_type == "SparsePLK":
            x = SparsePLKConv(
                pdim, self.max_kernel_size, self.sparse_kernels,
                self.sparse_dilations, self.use_max_kernel, self.with_idt,
                self.dtype,
            )(x)
        elif self.lk_type == "RectSparsePLK":
            x = RectSparsePLKConv(pdim, self.max_kernel_size, self.dtype)(x)
        else:
            msg = f"Unknown LK type: {self.lk_type}"
            raise ValueError(msg)
        if self.use_ea:
            x = EA(self.dim, dtype=self.dtype)(x)
        x = Conv2d(self.dim, 1, padding=0, dtype=self.dtype,
                   kernel_init=trunc_normal_init())(x)
        return x + skip


@ARCH_REGISTRY.register()
class plksr(nn.Module):
    dim: int = 64
    n_blocks: int = 28
    upscaling_factor: int = 4
    ccm_type: str = "DCCM"
    kernel_size: int = 17
    split_ratio: float = 0.25
    lk_type: str = "PLK"
    use_max_kernel: bool = False
    sparse_kernels: Sequence[int] = (5, 5, 5, 5)
    sparse_dilations: Sequence[int] = (1, 2, 3, 4)
    with_idt: bool = False
    use_ea: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        u = self.upscaling_factor
        feats = Conv2d(self.dim, 3, dtype=self.dtype,
                       kernel_init=trunc_normal_init())(x)
        for _ in range(self.n_blocks):
            feats = PLKBlock(
                self.dim, self.ccm_type, self.kernel_size, self.split_ratio,
                self.lk_type, self.use_max_kernel, self.sparse_kernels,
                self.sparse_dilations, self.with_idt, self.use_ea, self.dtype,
            )(feats)
        feats = Conv2d(3 * u**2, 3, dtype=self.dtype,
                       kernel_init=trunc_normal_init())(feats)
        out = feats + jnp.repeat(x, u**2, axis=-1)  # nearest residual
        return pixel_shuffle(out, u)


@ARCH_REGISTRY.register()
def plksr_tiny(**kwargs):
    kwargs.setdefault("upscaling_factor", kwargs.pop("upscale", 4))
    return plksr(n_blocks=12, kernel_size=13, use_ea=False, **kwargs)
