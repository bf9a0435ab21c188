"""MSDAN — Multi-Scale Dense Attention Network.

Behavioral parity with /root/reference/neosr/archs/msdan_arch.py:32-464:
BSConv (pointwise->depthwise) units, EBFB gated multi-kernel block, EMSSA
multi-scale pooled attention, pixel-shuffle upsampler chain, bicubic input
residual.  NHWC flax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle
from neosr_tpu.archs.safmn import adaptive_max_pool, nearest_resize_to
from neosr_tpu.ops.resize import resize_antialias
from neosr_tpu.utils.registry import ARCH_REGISTRY


class BSConv(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.out_channels, 1, padding=0, use_bias=False,
                   dtype=self.dtype)(x)
        k = self.kernel_size
        return nn.Conv(self.out_channels, (k, k), feature_group_count=self.out_channels,
                       padding=k // 2, dtype=self.dtype, param_dtype=jnp.float32)(x)


class EMSSA(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0):
        h, w = x0.shape[1], x0.shape[2]
        c4 = self.channels // 4
        x = Conv2d(c4, 1, padding=0, dtype=self.dtype)(x0)
        s0 = Conv2d(c4, 1, padding=0, dtype=self.dtype)(x)
        outs = [s0]
        for k, factor in ((7, 2), (5, 4), (3, 8)):
            s = adaptive_max_pool(x, max(h // factor, 1), max(w // factor, 1))
            s = BSConv(c4, k, self.dtype)(s)
            outs.append(nearest_resize_to(s, h, w))
        merged = Conv2d(self.channels, 1, padding=0, dtype=self.dtype)(
            jnp.concatenate(outs, axis=-1)
        ) + Conv2d(self.channels, 1, padding=0, dtype=self.dtype)(x)
        gate = jax.nn.sigmoid(Conv2d(self.channels, 1, padding=0,
                                     dtype=self.dtype)(merged))
        return x0 * gate


class EBFB(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def c1(t):
            return Conv2d(self.channels, 1, padding=0, dtype=self.dtype)(t)

        x1 = c1(x)
        x2 = jax.nn.sigmoid(c1(x)) * gelu(BSConv(self.channels, 3, self.dtype)(x))
        out1 = x1 + x2
        x3 = c1(out1)
        x4 = jax.nn.sigmoid(c1(out1)) * gelu(BSConv(self.channels, 5, self.dtype)(out1))
        out2 = x3 + x4
        x5 = c1(out2)
        x6 = jax.nn.sigmoid(c1(out2)) * gelu(BSConv(self.channels, 7, self.dtype)(out2))
        return Conv2d(self.channels, 1, padding=0, dtype=self.dtype)(
            jnp.concatenate([x1, x3, x5, x6], axis=-1)
        )


class DFEB(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0):
        x = EBFB(self.channels, self.dtype)(x0)
        x = EMSSA(self.channels, self.dtype)(x)
        return x + x0


@ARCH_REGISTRY.register()
class msdan(nn.Module):
    channels: int = 48
    num_DFEB: int = 8
    upscale_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        s = self.upscale_factor
        x1 = BSConv(self.channels, 3, self.dtype)(x0)
        x = x1
        for _ in range(self.num_DFEB):
            x = DFEB(self.channels, self.dtype)(x)
        x = x + x1

        # upsampler chain (msdan_arch.py:370-410)
        if s == 2:
            x = BSConv(self.channels, 3, self.dtype)(x)
            x = pixel_shuffle(x, 2)
            x = gelu(BSConv(self.channels, 3, self.dtype)(x))
        elif s == 3:
            x = BSConv(54, 3, self.dtype)(x)
            x = pixel_shuffle(x, 3)
            x = gelu(BSConv(self.channels, 3, self.dtype)(x))
        elif s == 4:
            for _ in range(2):
                x = BSConv(self.channels, 3, self.dtype)(x)
                x = pixel_shuffle(x, 2)
                x = gelu(BSConv(self.channels, 3, self.dtype)(x))
        else:
            msg = f"msdan supports 2x/3x/4x, got {s}"
            raise ValueError(msg)

        x_up = resize_antialias(x0, x0.shape[1] * s, x0.shape[2] * s, "bicubic")
        return x_up + BSConv(3, 3, self.dtype)(x)
