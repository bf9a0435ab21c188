"""RRDBNet (ESRGAN generator).

Behavioral parity with /root/reference/neosr/archs/esrgan_arch.py:82-214:
pixel-unshuffle input for x1/x2, 23 RRDB blocks (3 residual-dense blocks
each, 0.2 residual scaling), nearest x2 + conv upsampling.  NHWC flax.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import (
    Conv2d,
    conv_kaiming_init,
    lrelu,
    nearest_upsample,
    pixel_unshuffle,
)
from neosr_tpu.utils.registry import ARCH_REGISTRY


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = conv_kaiming_init(0.1)
        x1 = lrelu(Conv2d(self.num_grow_ch, 3, dtype=self.dtype, kernel_init=init)(x))
        x2 = lrelu(Conv2d(self.num_grow_ch, 3, dtype=self.dtype, kernel_init=init)(
            jnp.concatenate([x, x1], axis=-1)))
        x3 = lrelu(Conv2d(self.num_grow_ch, 3, dtype=self.dtype, kernel_init=init)(
            jnp.concatenate([x, x1, x2], axis=-1)))
        x4 = lrelu(Conv2d(self.num_grow_ch, 3, dtype=self.dtype, kernel_init=init)(
            jnp.concatenate([x, x1, x2, x3], axis=-1)))
        x5 = Conv2d(self.num_feat, 3, dtype=self.dtype, kernel_init=init)(
            jnp.concatenate([x, x1, x2, x3, x4], axis=-1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int
    num_grow_ch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype)(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype)(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype)(out)
        return out * 0.2 + x


@ARCH_REGISTRY.register()
class esrgan(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.scale == 2:
            feat = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat = pixel_unshuffle(x, 4)
        else:
            feat = x
        feat = Conv2d(self.num_feat, 3, dtype=self.dtype)(feat)
        body = feat
        # use_checkpoint remats each RRDB: backward recomputes the block
        # instead of streaming ~15 dense-concat activations per block from
        # HBM — the RRDB backward is bandwidth-bound on TPU, so trading
        # FLOPs for traffic can raise throughput and admits larger batches.
        # The lift is applied to the *call* so param names don't change and
        # checkpoints stay interchangeable with use_checkpoint=false.
        for _ in range(self.num_block):
            blk = RRDB(self.num_feat, self.num_grow_ch, self.dtype)
            if self.use_checkpoint:
                body = nn.remat(RRDB.__call__)(blk, body)
            else:
                body = blk(body)
        body = Conv2d(self.num_feat, 3, dtype=self.dtype)(body)
        feat = feat + body
        feat = lrelu(Conv2d(self.num_feat, 3, dtype=self.dtype)(nearest_upsample(feat, 2)))
        feat = lrelu(Conv2d(self.num_feat, 3, dtype=self.dtype)(nearest_upsample(feat, 2)))
        out = Conv2d(self.num_out_ch, 3, dtype=self.dtype)(
            lrelu(Conv2d(self.num_feat, 3, dtype=self.dtype)(feat))
        )
        return out
