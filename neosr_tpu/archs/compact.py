"""SRVGGNetCompact — the minimal SR baseline.

Behavioral parity with /root/reference/neosr/archs/compact_arch.py:12-85:
first conv -> act, `num_conv` x (conv -> act), conv to C*s^2, pixel-shuffle,
plus a nearest-upsampled input residual.  NHWC, flax.linen.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import (
    Conv2d,
    make_activation,
    nearest_upsample,
    pixel_shuffle,
)
from neosr_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class compact(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = "prelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out = Conv2d(self.num_feat, 3, dtype=self.dtype)(x)
        out = make_activation(self.act_type, self.num_feat, self.dtype)(out)
        for _ in range(self.num_conv):
            out = Conv2d(self.num_feat, 3, dtype=self.dtype)(out)
            out = make_activation(self.act_type, self.num_feat, self.dtype)(out)
        out = Conv2d(self.num_out_ch * self.upscale**2, 3, dtype=self.dtype)(out)
        out = pixel_shuffle(out, self.upscale)
        return out + nearest_upsample(x, self.upscale)
