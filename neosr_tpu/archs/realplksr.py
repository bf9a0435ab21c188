"""RealPLKSR — PLKSR variant with GroupNorm, Dropout2d and DySample.

Behavioral parity with /root/reference/neosr/archs/realplksr_arch.py:14-167.
NHWC flax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, DySample, pixel_shuffle, trunc_normal_init
from neosr_tpu.archs.plksr import DCCM, EA, PLKConv
from neosr_tpu.utils.registry import ARCH_REGISTRY


class RealPLKBlock(nn.Module):
    dim: int
    kernel_size: int
    split_ratio: float
    norm_groups: int
    use_ea: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        skip = x
        x = DCCM(self.dim, act="mish", dtype=self.dtype)(x)
        x = PLKConv(int(self.dim * self.split_ratio), self.kernel_size,
                    dtype=self.dtype)(x)
        if self.use_ea:
            x = EA(self.dim, dtype=self.dtype)(x)
        x = Conv2d(self.dim, 1, padding=0, dtype=self.dtype,
                   kernel_init=trunc_normal_init())(x)
        # epsilon matches torch GroupNorm (1e-5) for checkpoint parity
        x = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return x + skip


@ARCH_REGISTRY.register()
class realplksr(nn.Module):
    in_ch: int = 3
    out_ch: int = 3
    dim: int = 64
    n_blocks: int = 28
    upscaling_factor: int = 4
    kernel_size: int = 17
    split_ratio: float = 0.25
    use_ea: bool = True
    norm_groups: int = 4
    dropout: float = 0.0
    dysample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        u = self.upscaling_factor
        feats = Conv2d(self.dim, 3, dtype=self.dtype,
                       kernel_init=trunc_normal_init())(x)
        for _ in range(self.n_blocks):
            feats = RealPLKBlock(
                self.dim, self.kernel_size, self.split_ratio,
                self.norm_groups, self.use_ea, self.dtype,
            )(feats)
        if self.dropout > 0:
            # Dropout2d: drop whole channels
            feats = nn.Dropout(
                rate=self.dropout, broadcast_dims=(1, 2),
                deterministic=deterministic,
            )(feats)
        feats = Conv2d(self.out_ch * u**2, 3, dtype=self.dtype,
                       kernel_init=trunc_normal_init())(feats)
        out = feats + jnp.repeat(x, u**2, axis=-1)
        if self.dysample and u != 1:
            groups = self.out_ch if u % 2 != 0 else 4
            return DySample(
                self.in_ch * u**2, self.out_ch, u, groups=groups,
                end_convolution=True, dtype=self.dtype,
            )(out)
        return pixel_shuffle(out, u)


@ARCH_REGISTRY.register()
def realplksr_s(**kwargs):
    kwargs.setdefault("upscaling_factor", kwargs.pop("upscale", 4))
    return realplksr(n_blocks=12, kernel_size=13, use_ea=False, **kwargs)
