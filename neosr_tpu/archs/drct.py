"""DRCT — Dense-Residual-Connected Transformer.

Behavioral parity with /root/reference/neosr/archs/drct_arch.py:237-956:
each group (RDG) chains 5 Swin blocks with dense gc-channel growth
(adjust 1x1 convs + lrelu between), 0.2-scaled residual; head count adapts
per stage as heads - ((dim + k*gc) % heads); pixel-shuffle head.  Presets
drct/drct_l/drct_xl/drct_s (drct_arch.py:750-956).  NHWC flax.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, Upsample, lrelu, pixel_shuffle
from neosr_tpu.archs.swin_util import SwinBlock
from neosr_tpu.utils.registry import ARCH_REGISTRY


class RDG(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: float | None
    drop_path: float
    gc: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        win = self.window_size
        gc = self.gc

        def swin(t, shift, mlp_ratio):
            dim = t.shape[-1]
            heads = self.num_heads - (dim % self.num_heads)
            if dim % self.num_heads == 0:
                heads = self.num_heads
            return SwinBlock(
                dim, heads, win, shift, mlp_ratio, self.qkv_bias, self.qk_scale,
                0.0, self.drop_path, self.dtype,
            )(t, deterministic=deterministic)

        def adjust(t, out_ch, act=True):
            t = Conv2d(out_ch, 1, padding=0, dtype=self.dtype)(t)
            return lrelu(t) if act else t

        x1 = adjust(swin(x, 0, self.mlp_ratio), gc)
        x2 = adjust(swin(jnp.concatenate([x, x1], -1), win // 2, self.mlp_ratio), gc)
        x3 = adjust(swin(jnp.concatenate([x, x1, x2], -1), 0, self.mlp_ratio), gc)
        x4 = adjust(swin(jnp.concatenate([x, x1, x2, x3], -1), win // 2, 1.0), gc)
        x5 = adjust(
            swin(jnp.concatenate([x, x1, x2, x3, x4], -1), 0, 1.0), self.dim, act=False
        )
        return x5 * 0.2 + x


@ARCH_REGISTRY.register()
class drct(nn.Module):
    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 16
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    gc: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        num_feat = 64
        mean = jnp.asarray((0.5,) * 3, x.dtype) if self.in_chans == 3 else 0.0
        x = (x - mean) * self.img_range

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype)(x)
        h = feat
        if self.patch_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        dpr = np.linspace(0, self.drop_path_rate, len(self.depths))
        for i in range(len(self.depths)):
            h = RDG(
                self.embed_dim, self.num_heads[i], self.window_size,
                self.mlp_ratio, self.qkv_bias, self.qk_scale,
                float(dpr[i]), self.gc, self.dtype,
            )(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h) + feat

        if self.upsampler == "pixelshuffle":
            h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(h), slope=0.01)  # torch default slope (conv_before_upsample)
            h = Upsample(self.upscale, num_feat, dtype=self.dtype)(h)
            out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)
        else:
            h = Conv2d(self.in_chans * self.upscale**2, 3, dtype=self.dtype)(h)
            out = pixel_shuffle(h, self.upscale)
        return out / self.img_range + mean


@ARCH_REGISTRY.register()
def drct_l(**kwargs):
    kwargs.setdefault("upscale", 4)
    return drct(depths=(6,) * 12, num_heads=(6,) * 12, **kwargs)


@ARCH_REGISTRY.register()
def drct_xl(**kwargs):
    kwargs.setdefault("upscale", 4)
    return drct(depths=(6,) * 14, num_heads=(6,) * 14, **kwargs)


@ARCH_REGISTRY.register()
def drct_s(**kwargs):
    kwargs.setdefault("upscale", 4)
    return drct(embed_dim=48, depths=(2, 2, 2, 2), num_heads=(6, 6, 6, 6), **kwargs)
