"""SPAN — Swift Parameter-free Attention Network.

Behavioral parity with /root/reference/neosr/archs/span_arch.py:86-294:
Conv3XC re-parameterizable conv blocks (1x1 -> 3x3 -> 1x1 + 1x1 skip), six
SPAB blocks with the parameter-free sigmoid attention (sigmoid(x)-0.5),
concat fusion of [feat, b6', b1, b5_mid], pixel-shuffle tail.  NHWC flax;
the train-time multi-conv structure is kept (XLA fuses the 1x1s); a deploy
path can collapse Conv3XC to a single 3x3 like the reference's eval_conv.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, pixel_shuffle
from neosr_tpu.utils.registry import ARCH_REGISTRY


class Conv3XC(nn.Module):
    c_out: int
    gain: int = 2
    s: int = 1
    use_bias: bool = True
    relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        sk = Conv2d(self.c_out, 1, strides=self.s, padding=0,
                    use_bias=self.use_bias, dtype=self.dtype)(x)
        y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = Conv2d(c_in * self.gain, 1, padding=0, use_bias=self.use_bias,
                   dtype=self.dtype)(y)
        y = Conv2d(self.c_out * self.gain, 3, strides=self.s, padding=0,
                   use_bias=self.use_bias, dtype=self.dtype)(y)
        y = Conv2d(self.c_out, 1, padding=0, use_bias=self.use_bias,
                   dtype=self.dtype)(y)
        out = y + sk
        if self.relu:
            out = jax.nn.leaky_relu(out, negative_slope=0.05)
        return out


class SPAB(nn.Module):
    mid_channels: int | None = None
    out_channels: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c = x.shape[-1]
        mid = self.mid_channels or c
        out_c = self.out_channels or c
        out1 = Conv3XC(mid, gain=2, dtype=self.dtype)(x)
        out1_act = jax.nn.silu(out1)
        out2 = Conv3XC(mid, gain=2, dtype=self.dtype)(out1_act)
        out3 = Conv3XC(out_c, gain=2, dtype=self.dtype)(jax.nn.silu(out2))
        sim_att = jax.nn.sigmoid(out3) - 0.5
        # the reference's SiLU(inplace=True) mutates out1 before it is
        # returned (span_arch.py:207-222), so the activated tensor is what
        # reaches conv_cat via out_b5_2 — match that
        return (out3 + x) * sim_att, out1_act, sim_att


@ARCH_REGISTRY.register()
class span(nn.Module):
    """SPAN generator (reference span_arch.py:225-294)."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    feature_channels: int = 48
    upscale: int = 4
    bias: bool = True
    norm: bool = False
    img_range: float = 1.0
    rgb_mean: tuple[float, float, float] = (0.5, 0.5, 0.5)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.norm:
            mean = jnp.asarray(self.rgb_mean, x.dtype)
            x = (x - mean) * self.img_range

        feat = Conv3XC(self.feature_channels, gain=2, dtype=self.dtype)(x)
        b1, _, _ = SPAB(dtype=self.dtype)(feat)
        b2, _, _ = SPAB(dtype=self.dtype)(b1)
        b3, _, _ = SPAB(dtype=self.dtype)(b2)
        b4, _, _ = SPAB(dtype=self.dtype)(b3)
        b5, _, _ = SPAB(dtype=self.dtype)(b4)
        b6, b5_2, _ = SPAB(dtype=self.dtype)(b5)

        b6 = Conv3XC(self.feature_channels, gain=2, dtype=self.dtype)(b6)
        out = Conv2d(self.feature_channels, 1, padding=0, dtype=self.dtype)(
            jnp.concatenate([feat, b6, b1, b5_2], axis=-1)
        )
        out = Conv2d(self.num_out_ch * self.upscale**2, 3, dtype=self.dtype)(out)
        return pixel_shuffle(out, self.upscale)
