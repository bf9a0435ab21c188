"""SPAN+ — SPAN variant with Mish SPABs and DySample upsampler.

Behavioral parity with /root/reference/neosr/archs/spanplus_arch.py:120-236.
NHWC flax, reusing span's Conv3XC.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, DySample, pixel_shuffle, trunc_normal_init
from neosr_tpu.archs.span import Conv3XC
from neosr_tpu.utils.registry import ARCH_REGISTRY


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class SPABPlus(nn.Module):
    end: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        out1 = Conv3XC(c, gain=2, dtype=self.dtype)(x)
        out1_act = _mish(out1)
        out2 = Conv3XC(c, gain=2, dtype=self.dtype)(out1_act)
        out3 = Conv3XC(c, gain=2, dtype=self.dtype)(_mish(out2))
        sim_att = jax.nn.sigmoid(out3) - 0.5
        out = (out3 + x) * sim_att
        if self.end:
            # reference Mish(inplace=True) mutates out1 before return
            # (spanplus_arch.py:129-145) — the activated tensor escapes
            return out, out1_act
        return out


class SPABS(nn.Module):
    n_blocks: int = 4
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        out_b1 = SPABPlus(dtype=self.dtype)(x)
        h = out_b1
        for _ in range(self.n_blocks):
            h = SPABPlus(dtype=self.dtype)(h)
        out_end, out_x2 = SPABPlus(end=True, dtype=self.dtype)(h)
        out_end = Conv3XC(c, gain=2, dtype=self.dtype)(out_end)
        if self.drop > 0:
            out_end = nn.Dropout(self.drop, broadcast_dims=(1, 2),
                                 deterministic=deterministic)(out_end)
        return Conv2d(c, 1, padding=0, dtype=self.dtype,
                      kernel_init=trunc_normal_init())(
            jnp.concatenate([x, out_end, out_b1, out_x2], axis=-1)
        )


@ARCH_REGISTRY.register()
class spanplus(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    blocks: Sequence[int] = (4,)
    feature_channels: int = 48
    upscale: int = 4
    drop_rate: float = 0.0
    upsampler: str = "dys"  # "dys" | "ps" | "conv" (1x only)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_channels = self.num_out_ch if self.upsampler == "dys" else self.num_in_ch
        h = Conv3XC(self.feature_channels, gain=2, dtype=self.dtype)(x)
        blocks = self.blocks if isinstance(self.blocks, (list, tuple)) else [int(self.blocks)]
        for n_blocks in blocks:
            h = SPABS(n_blocks, self.drop_rate, self.dtype)(h, deterministic)
        if self.upsampler == "ps":
            h = Conv2d(out_channels * self.upscale**2, 3, dtype=self.dtype)(h)
            return pixel_shuffle(h, self.upscale)
        if self.upsampler == "dys":
            return DySample(self.feature_channels, out_channels, self.upscale,
                            dtype=self.dtype)(h)
        if self.upsampler == "conv":
            if self.upscale != 1:
                msg = "conv upsampler supports only 1x"
                raise ValueError(msg)
            return Conv2d(out_channels, 3, dtype=self.dtype)(h)
        msg = f"upsampler: {self.upsampler} not supported ('ps'|'dys'|'conv')"
        raise NotImplementedError(msg)


@ARCH_REGISTRY.register()
def spanplus_sts(**kwargs):
    return spanplus(blocks=(2,), feature_channels=32, upsampler="ps", **kwargs)


@ARCH_REGISTRY.register()
def spanplus_s(**kwargs):
    return spanplus(blocks=(2,), feature_channels=32, **kwargs)


@ARCH_REGISTRY.register()
def spanplus_st(**kwargs):
    return spanplus(upsampler="ps", **kwargs)
