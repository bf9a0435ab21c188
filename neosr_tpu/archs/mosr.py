"""MOSR — "Mamba-Out" SR (gated CNN blocks).

Behavioral parity with /root/reference/neosr/archs/mosr_arch.py:12-204:
GatedCNNBlocks (norm -> expand -> gated depthwise path -> project, with the
`shortcut - 0.5` residual), ConvBlock shortcut branch, and ps/gps/dys
upsampler options.  NHWC flax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import (
    Conv2d,
    DropPath,
    DySample,
    pixel_shuffle,
    trunc_normal_init,
)
from neosr_tpu.utils.registry import ARCH_REGISTRY


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class GPS(nn.Module):
    """Geo-ensemble PixelShuffle head."""

    dim: int
    scale: int
    out_ch: int = 3
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = Conv2d(self.scale**2 * self.out_ch * 8, self.kernel_size,
                   dtype=self.dtype)(x)
        n, h, w, c = k.shape
        k = k.reshape(n, h, w, 8, c // 8).mean(axis=3)
        return pixel_shuffle(k, self.scale)


class ConvBlock(nn.Module):
    out_channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = _mish(Conv2d(self.out_channel, 3, dtype=self.dtype)(x))
        y = _mish(Conv2d(self.out_channel, 3, dtype=self.dtype)(y))
        sk = Conv2d(self.out_channel, 1, padding=0, dtype=self.dtype)(x)
        return y + sk


class GatedCNNBlock(nn.Module):
    dim: int
    expansion_ratio: float = 8 / 3
    conv_ratio: float = 1.0
    kernel_size: int = 7
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        hidden = int(self.expansion_ratio * self.dim)
        conv_channels = int(self.conv_ratio * self.dim)
        x = Conv2d(hidden * 2, 3, dtype=self.dtype,
                   kernel_init=trunc_normal_init())(x)
        g = x[..., :hidden]
        i = x[..., hidden : 2 * hidden - conv_channels]
        c = x[..., 2 * hidden - conv_channels :]
        c = nn.Conv(
            conv_channels, (self.kernel_size, self.kernel_size),
            feature_group_count=conv_channels, padding=self.kernel_size // 2,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(),
        )(c)
        x = _mish(Conv2d(self.dim, 3, dtype=self.dtype,
                         kernel_init=trunc_normal_init())(
            _mish(g) * jnp.concatenate([i, c], axis=-1)
        ))
        x = DropPath(self.drop_path)(x, deterministic=deterministic)
        return x + (shortcut - 0.5)


@ARCH_REGISTRY.register()
class mosr(nn.Module):
    in_ch: int = 3
    out_ch: int = 3
    upscale: int = 4
    n_block: int = 24
    dim: int = 64
    upsampler: str = "dys"  # "ps" | "gps" | "dys"
    drop_path: float = 0.0
    kernel_size: int = 7
    expansion_ratio: float = 1.5
    conv_ratio: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        import numpy as np

        out_ch = self.in_ch if self.upsampler == "ps" else self.out_ch
        dp_rates = np.linspace(0, self.drop_path, self.n_block)
        h = Conv2d(self.dim, 3, dtype=self.dtype)(x)
        for idx in range(self.n_block):
            h = GatedCNNBlock(
                self.dim, self.expansion_ratio, self.conv_ratio,
                self.kernel_size, float(dp_rates[idx]), self.dtype,
            )(h, deterministic=deterministic)
        h = _mish(Conv2d(self.dim * 2, 3, dtype=self.dtype)(h))
        h = _mish(Conv2d(self.dim, 3, dtype=self.dtype)(h))
        h = Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(h)
        h = h + (ConvBlock(self.dim, self.dtype)(x) - 0.5)

        if self.upsampler == "ps":
            h = Conv2d(out_ch * self.upscale**2, 3, dtype=self.dtype)(h)
            return pixel_shuffle(h, self.upscale)
        if self.upsampler == "gps":
            return GPS(self.dim, self.upscale, out_ch, dtype=self.dtype)(h)
        if self.upsampler == "dys":
            return DySample(self.dim, out_ch, self.upscale, dtype=self.dtype)(h)
        msg = f"upsampler: {self.upsampler} not supported ('ps'|'gps'|'dys')"
        raise ValueError(msg)


@ARCH_REGISTRY.register()
def mosr_t(**kwargs):
    return mosr(n_block=5, dim=48, expansion_ratio=1.5, conv_ratio=1.0, **kwargs)
