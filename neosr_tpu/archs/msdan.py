"""MSDAN — Multi-Scale Dense Attention Network.

Behavioral parity with /root/reference/neosr/archs/msdan_arch.py:32-464:
BSConv (pointwise->depthwise) units, EBFB gated multi-kernel block with a
SHARED 1x1 conv used six times (msdan_arch.py EBFB.forward), EMSSA
multi-scale pooled attention whose merge conv doubles as the gate conv,
upsampler whose x4 path applies the same x2 stage twice (weight sharing),
pixel-shuffle chain, bicubic input residual.  NHWC flax; modules carry the
reference's attribute names so checkpoint import is 1:1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle
from neosr_tpu.archs.safmn import adaptive_max_pool, nearest_resize_to
from neosr_tpu.ops.resize import resize
from neosr_tpu.utils.registry import ARCH_REGISTRY


class BSConv(nn.Module):
    """BSConvU: bias-free pointwise then depthwise (msdan_arch.py:14-30)."""

    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.out_channels, 1, padding=0, use_bias=False,
                   dtype=self.dtype, name="pw")(x)
        k = self.kernel_size
        return nn.Conv(self.out_channels, (k, k),
                       feature_group_count=self.out_channels,
                       padding=k // 2, dtype=self.dtype,
                       param_dtype=jnp.float32, name="dw")(x)


class EMSSA(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0):
        h, w = x0.shape[1], x0.shape[2]
        c4 = self.channels // 4
        conv1 = Conv2d(self.channels, 1, padding=0, dtype=self.dtype, name="conv1")
        x = Conv2d(c4, 1, padding=0, dtype=self.dtype, name="conv1_down")(x0)
        s0 = Conv2d(c4, 1, padding=0, dtype=self.dtype, name="conv1_mid")(x)
        outs = [s0]
        for k, factor in ((7, 2), (5, 4), (3, 8)):
            s = adaptive_max_pool(x, max(h // factor, 1), max(w // factor, 1))
            s = BSConv(c4, k, self.dtype, name=f"BSConv{k}")(s)
            outs.append(nearest_resize_to(s, h, w))
        merged = conv1(jnp.concatenate(outs, axis=-1)) + Conv2d(
            self.channels, 1, padding=0, dtype=self.dtype, name="conv1_up")(x)
        # the merge conv is REUSED as the gate conv (msdan_arch.py EMSSA)
        return x0 * jax.nn.sigmoid(conv1(merged))


class EBFB(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # ONE shared 1x1 conv evaluated six times (msdan_arch.py EBFB.forward)
        conv1 = Conv2d(self.channels, 1, padding=0, dtype=self.dtype, name="conv1")
        x1 = conv1(x)
        x2 = jax.nn.sigmoid(conv1(x)) * gelu(
            BSConv(self.channels, 3, self.dtype, name="BSConv3")(x))
        out1 = x1 + x2
        x3 = conv1(out1)
        x4 = jax.nn.sigmoid(conv1(out1)) * gelu(
            BSConv(self.channels, 5, self.dtype, name="BSConv5")(out1))
        out2 = x3 + x4
        x5 = conv1(out2)
        x6 = jax.nn.sigmoid(conv1(out2)) * gelu(
            BSConv(self.channels, 7, self.dtype, name="BSConv7")(out2))
        return Conv2d(self.channels, 1, padding=0, dtype=self.dtype,
                      name="conv1_down")(jnp.concatenate([x1, x3, x5, x6], axis=-1))


class DFEB(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0):
        x = EBFB(self.channels, self.dtype, name="EBFB")(x0)
        x = EMSSA(self.channels, self.dtype, name="EMSSA")(x)
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
        x1 = BSConv(self.channels, 3, self.dtype, name="BSConv_first")(x0)
        x = x1
        for i in range(self.num_DFEB):
            x = DFEB(self.channels, self.dtype, name=f"DFEB_{i}")(x)
        x = x + x1

        # upsampler (msdan_arch.py upsampler.forward): the x4 path applies
        # the SAME BSConv_2 / BSConv1_2 pair twice
        if s in (2, 4):
            b2 = BSConv(self.channels, 3, self.dtype, name="BSConv_2")
            b12 = BSConv(self.channels, 3, self.dtype, name="BSConv1_2")
            for _ in range(1 if s == 2 else 2):
                x = pixel_shuffle(b2(x), 2)
                x = gelu(b12(x))
        elif s == 3:
            x = pixel_shuffle(BSConv(54, 3, self.dtype, name="BSConv_3")(x), 3)
            x = gelu(BSConv(self.channels, 3, self.dtype, name="BSConv1_3")(x))
        else:
            msg = f"msdan supports 2x/3x/4x, got {s}"
            raise ValueError(msg)

        # reference residual is plain (non-antialiased) bicubic
        # (msdan_arch.py:438-460, F.interpolate default antialias=False)
        x_up = resize(x0, x0.shape[1] * s, x0.shape[2] * s, "bicubic")
        return x_up + BSConv(3, 3, self.dtype, name="BSConv_last")(x)
