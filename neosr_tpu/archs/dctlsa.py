"""DCTLSA — Dense Connection Transformer with Local-Sparse Attention.

Behavioral parity with /root/reference/neosr/archs/dctlsa_arch.py:12-593:
LSAB groups of 2 SwinT blocks using *linear* window attention (softmax over
keys, k^T v association) with a BN+conv LocalModule branch, dense 1x1-fused
concatenation across 6 groups, Dropout2d before the tail, pixel-shuffle
head.  NHWC flax; BatchNorm in batch-statistics mode (purity).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle
from neosr_tpu.archs.ea2fpn import BatchStatNorm
from neosr_tpu.archs.swin_util import window_partition, window_reverse
from neosr_tpu.utils.registry import ARCH_REGISTRY


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.05)


class LocalModule(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = BatchStatNorm(dtype=self.dtype)(x)
        h = Conv2d(c, 1, padding=0, use_bias=False, dtype=self.dtype)(h)
        h = nn.Conv(c, (3, 3), feature_group_count=c, padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = BatchStatNorm(dtype=self.dtype)(h)
        return Conv2d(c, 1, padding=0, use_bias=False, dtype=self.dtype)(h)


class LinearWindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        win = min(self.window_size, h, w)
        local = LocalModule(dtype=self.dtype)(x) + x
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32)(local)
        windows = window_partition(qkv, win)  # (B*nW, n, 3c)
        b_, n, _ = windows.shape
        d = c // self.num_heads
        qkv = windows.reshape(b_, n, 3, self.num_heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-2).astype(v.dtype)
        q = q * (d**-0.5)
        assoc = jnp.einsum("bhnd,bhne->bhde", k, v,
                           preferred_element_type=jnp.float32).astype(v.dtype)
        out = jnp.einsum("bhnd,bhde->bhne", q, assoc)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(out)
        out = window_reverse(out, win, h, w)
        return out + local


class SwinTBlock(nn.Module):
    """One SwinTransformerBlock (dctlsa_arch.py:227-293): attention REPLACES
    the input (the `shortcut` variable is computed but unused in the
    reference), then an MLP residual; no per-block LayerNorms."""

    dim: int
    num_heads: int
    window_size: int = 16
    shift: int = 0
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shift = self.shift
        sx = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
        sx = LinearWindowAttention(self.dim, self.window_size, self.num_heads,
                                   dtype=self.dtype)(sx)
        x = jnp.roll(sx, (shift, shift), axis=(1, 2)) if shift else sx
        hdim = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hdim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(
            gelu(y))
        return x + y


class SwinT(nn.Module):
    """SwinT = BasicLayer depth 2 (dctlsa_arch.py:140-225): reflect-pad to
    the window multiple, ONE patch-embed LayerNorm, a non-shifted then a
    shifted block (no attention mask), crop back."""

    nf: int
    num_head: int
    window_size: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        win = self.window_size
        ph, pw = (-h) % win, (-w) % win
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        for i in range(2):
            x = SwinTBlock(self.nf, self.num_head, win,
                           shift=0 if i % 2 == 0 else win // 2,
                           dtype=self.dtype)(x)
        if ph or pw:
            x = x[:, :h, :w, :]
        return x


class LSAB(nn.Module):
    """LSAB = 2 x SwinT = 4 attention blocks (dctlsa_arch.py:12-21)."""

    nf: int
    num_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = SwinT(self.nf, self.num_head, dtype=self.dtype)(x)
        return SwinT(self.nf, self.num_head, dtype=self.dtype)(x)


@ARCH_REGISTRY.register()
class dctlsa(nn.Module):
    in_nc: int = 3
    nf: int = 55
    num_modules: int = 6
    out_nc: int = 3
    upscale: int = 4
    num_head: int = 5
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        nf = self.nf
        fea = Conv2d(nf, 3, dtype=self.dtype)(x)

        def fuse(t, out_ch):
            return _lrelu(Conv2d(out_ch, 1, padding=0, dtype=self.dtype)(t))

        outs = []
        cat = fea
        cur = fea
        for i in range(self.num_modules):
            b = LSAB(nf, self.num_head, self.dtype)(cur)
            outs.append(b)
            cat = jnp.concatenate([cat, b], axis=-1)
            if i < self.num_modules - 1:
                cur = fuse(cat, nf)

        out_b = fuse(jnp.concatenate(outs, axis=-1), nf)
        if self.dropout > 0:
            out_b = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                               deterministic=deterministic)(out_b)
        out_lr = Conv2d(nf, 3, dtype=self.dtype)(out_b) + fea
        out = Conv2d(self.out_nc * self.upscale**2, 3, dtype=self.dtype)(out_lr)
        return pixel_shuffle(out, self.upscale)
