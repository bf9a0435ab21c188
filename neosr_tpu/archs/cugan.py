"""Real-CUGAN — cascaded U-Nets with SE blocks (pro mode).

Behavioral parity with /root/reference/neosr/archs/cugan_arch.py:12-332:
VALID convs with explicit reflect pre-padding and negative-pad crops,
SE-gated UNetConv blocks, ConvTranspose upsampling, 2x/3x/4x variants, pro
range mapping (x*0.7+0.15).  NHWC flax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import nearest_upsample, pixel_shuffle
from neosr_tpu.utils.registry import ARCH_REGISTRY


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def _crop(x, n):
    return x[:, n:-n, n:-n, :]


def _conv(x, ch, k, s=1, dtype=jnp.float32):
    return nn.Conv(ch, (k, k), (s, s), padding="VALID", dtype=dtype,
                   param_dtype=jnp.float32,
                   kernel_init=nn.initializers.he_normal())(x)


def _deconv(x, ch, k, s, crop, dtype=jnp.float32):
    # precision="highest": XLA's default conv_transpose lowers inputs on
    # some backends (~5e-4 error vs torch); full precision keeps checkpoint
    # import exact.  Under bf16 dtype this is the normal TPU conv anyway.
    y = nn.ConvTranspose(ch, (k, k), (s, s), padding="VALID", dtype=dtype,
                         param_dtype=jnp.float32, precision="highest")(x)
    return _crop(y, crop) if crop else y


class SEBlock(nn.Module):
    reduction: int = 8
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = x.mean(axis=(1, 2), keepdims=True)
        g = nn.Conv(c // self.reduction, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, param_dtype=jnp.float32)(g)
        g = jax.nn.relu(g)
        g = nn.Conv(c, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=jnp.float32)(g)
        return x * jax.nn.sigmoid(g)


class UNetConv(nn.Module):
    mid_channels: int
    out_channels: int
    se: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _lrelu(_conv(x, self.mid_channels, 3, dtype=self.dtype))
        x = _lrelu(_conv(x, self.out_channels, 3, dtype=self.dtype))
        if self.se:
            x = SEBlock(dtype=self.dtype)(x)
        return x


class UNet1(nn.Module):
    out_channels: int
    deconv: bool
    x3: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = UNetConv(32, 64, se=False, dtype=self.dtype)(x)
        x2 = _lrelu(_conv(x1, 64, 2, 2, dtype=self.dtype))
        x2 = UNetConv(128, 64, se=True, dtype=self.dtype)(x2)
        x2 = _lrelu(_deconv(x2, 64, 2, 2, 0, dtype=self.dtype))
        x3 = _lrelu(_conv(_crop(x1, 4) + x2, 64, 3, dtype=self.dtype))
        if self.deconv:
            if self.x3:
                return _deconv(x3, self.out_channels, 5, 3, 2, dtype=self.dtype)
            return _deconv(x3, self.out_channels, 4, 2, 3, dtype=self.dtype)
        return _conv(x3, self.out_channels, 3, dtype=self.dtype)


class UNet2(nn.Module):
    out_channels: int
    deconv: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = UNetConv(32, 64, se=False, dtype=self.dtype)(x)
        x2 = _lrelu(_conv(x1, 64, 2, 2, dtype=self.dtype))
        x2 = UNetConv(64, 128, se=True, dtype=self.dtype)(x2)
        x3 = _lrelu(_conv(x2, 128, 2, 2, dtype=self.dtype))
        x3 = UNetConv(256, 128, se=True, dtype=self.dtype)(x3)
        x3 = _lrelu(_deconv(x3, 128, 2, 2, 0, dtype=self.dtype))
        x4 = UNetConv(64, 64, se=True, dtype=self.dtype)(_crop(x2, 4) + x3)
        x4 = _lrelu(_deconv(x4, 64, 2, 2, 0, dtype=self.dtype))
        x5 = _lrelu(_conv(_crop(x1, 16) + x4, 64, 3, dtype=self.dtype))
        if self.deconv:
            return _deconv(x5, self.out_channels, 4, 2, 3, dtype=self.dtype)
        return _conv(x5, self.out_channels, 3, dtype=self.dtype)


@ARCH_REGISTRY.register()
class cugan(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    scale: int = 4
    pro: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.scale == 1:
            msg = "1x scale is unsupported by cugan (use 2x, 3x or 4x)."
            raise ValueError(msg)
        x = jnp.clip(x, 0, 1)
        if self.pro:
            x = x * 0.7 + 0.15
        n, h0, w0, c = x.shape
        x00 = x

        mod = 4 if self.scale == 3 else 2
        ph = ((h0 - 1) // mod + 1) * mod
        pw = ((w0 - 1) // mod + 1) * mod
        pad = {2: 18, 3: 14, 4: 19}[self.scale]
        x = jnp.pad(
            x, ((0, 0), (pad, pad + ph - h0), (pad, pad + pw - w0), (0, 0)),
            mode="reflect",
        )

        if self.scale == 4:
            u1_out = 64
        else:
            u1_out = self.out_channels
        u1 = UNet1(u1_out, deconv=True, x3=(self.scale == 3), dtype=self.dtype)(x)
        u2 = UNet2(u1_out, deconv=False, dtype=self.dtype)(u1)
        y = u2 + _crop(u1, 20)

        if self.scale == 4:
            y = _conv(y, 12, 3, dtype=self.dtype)
            y = _crop(y, 1)
            y = pixel_shuffle(y, 2)

        y = y[:, : h0 * self.scale, : w0 * self.scale, :]
        if self.scale == 4:
            y = y + nearest_upsample(x00, 4)
        if self.pro:
            y = (y - 0.15) / 0.7
        return y
