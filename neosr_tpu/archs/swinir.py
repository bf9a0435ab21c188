"""SwinIR — image restoration with Swin transformer blocks.

Behavioral parity with /root/reference/neosr/archs/swinir_arch.py:819-1129:
shallow conv -> RSTB groups (Swin blocks + conv, residual) -> conv + global
residual -> pixelshuffle / pixelshuffledirect / nearest+conv heads, 0.5 mean
normalization with img_range.  NHWC flax on the shared swin_util skeleton;
presets swinir_small/medium/large (swinir_arch.py:1093-1129).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import (
    Conv2d,
    NearestConvUpsample,
    Upsample,
    lrelu,
    nearest_upsample,
    pixel_shuffle,
)
from neosr_tpu.archs.swin_util import SwinBlock
from neosr_tpu.utils.registry import ARCH_REGISTRY


class RSTB(nn.Module):
    """Residual Swin Transformer Block group."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop: float = 0.0
    drop_path: Sequence[float] = ()
    resi_connection: str = "1conv"
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # use_checkpoint rematerializes each block's activations in the
        # backward pass (reference swinir_arch.py:502,540) — on TPU this
        # trades MXU FLOPs for HBM, the standard memory lever under jit.
        # The lift is applied to the *call* so param names don't change and
        # checkpoints stay interchangeable with use_checkpoint=false.
        res = x
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            blk = SwinBlock(
                self.dim, self.num_heads, self.window_size,
                0 if i % 2 == 0 else self.window_size // 2,
                self.mlp_ratio, self.qkv_bias, self.qk_scale,
                self.drop, dp, self.dtype,
            )
            if self.use_checkpoint:
                x = nn.remat(SwinBlock.__call__, static_argnums=(2,))(blk, x, deterministic)
            else:
                x = blk(x, deterministic)
        if self.resi_connection == "1conv":
            x = Conv2d(self.dim, 3, dtype=self.dtype)(x)
        else:  # 3conv
            x = lrelu(Conv2d(self.dim // 4, 3, dtype=self.dtype)(x))
            x = lrelu(Conv2d(self.dim // 4, 1, padding=0, dtype=self.dtype)(x))
            x = Conv2d(self.dim, 3, dtype=self.dtype)(x)
        return x + res


@ARCH_REGISTRY.register()
class swinir(nn.Module):
    in_chans: int = 3
    embed_dim: int = 60
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        num_feat = 64
        mean = jnp.asarray((0.5,) * self.in_chans, x.dtype) if self.in_chans == 3 else 0.0
        x = (x - mean) * self.img_range

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype)(x)

        # deep features
        h = feat
        if self.patch_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        start = 0
        for i, depth in enumerate(self.depths):
            h = RSTB(
                self.embed_dim, depth, self.num_heads[i], self.window_size,
                self.mlp_ratio, self.qkv_bias, self.qk_scale, self.drop_rate,
                tuple(float(v) for v in dpr[start : start + depth]),
                self.resi_connection, self.use_checkpoint, self.dtype,
            )(h, deterministic=deterministic)
            start += depth
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)

        if self.resi_connection == "1conv":
            h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h)
        else:
            h = lrelu(Conv2d(self.embed_dim // 4, 3, dtype=self.dtype)(h))
            h = lrelu(Conv2d(self.embed_dim // 4, 1, padding=0, dtype=self.dtype)(h))
            h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h)
        h = h + feat

        # reconstruction
        if self.upsampler == "pixelshuffle":
            # conv_before_upsample uses torch's default LeakyReLU slope 0.01
            # (reference swinir_arch.py:979), unlike the 0.2 used elsewhere
            h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(h), slope=0.01)
            h = Upsample(self.upscale, num_feat, dtype=self.dtype)(h)
            out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)
        elif self.upsampler == "pixelshuffledirect":
            h = Conv2d(self.in_chans * self.upscale**2, 3, dtype=self.dtype)(h)
            out = pixel_shuffle(h, self.upscale)
        elif self.upsampler == "nearest+conv":
            h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(h), slope=0.01)
            h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(nearest_upsample(h, 2)))
            h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(nearest_upsample(h, 2)))
            h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(h))
            out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)
        else:
            out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)

        return out / self.img_range + mean


@ARCH_REGISTRY.register()
def swinir_small(**kwargs):
    kwargs.setdefault("upscale", 4)
    return swinir(
        embed_dim=60, depths=(6, 6, 6, 6), num_heads=(6, 6, 6, 6),
        mlp_ratio=2.0, upsampler="pixelshuffledirect", **kwargs,
    )


@ARCH_REGISTRY.register()
def swinir_medium(**kwargs):
    kwargs.setdefault("upscale", 4)
    return swinir(
        embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
        mlp_ratio=2.0, upsampler="pixelshuffle", **kwargs,
    )


@ARCH_REGISTRY.register()
def swinir_large(**kwargs):
    kwargs.setdefault("upscale", 4)
    return swinir(
        embed_dim=240, depths=(6,) * 9, num_heads=(8,) * 9,
        mlp_ratio=2.0, upsampler="nearest+conv", resi_connection="3conv", **kwargs,
    )
