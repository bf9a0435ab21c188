"""DITN — Deployment-friendly Inner-patch Transformer Network.

Behavioral parity with /root/reference/neosr/archs/ditn_arch.py:30-340:
UFONE blocks = ITL (channel self-attention over patch tokens, tanh-gated)
then SAL (dilated depthwise spatial attention), pixel-shuffle-direct head,
pad-to-patch-multiple + crop.  NHWC flax.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle
from neosr_tpu.utils.registry import ARCH_REGISTRY


class FeedForward(nn.Module):
    dim: int
    expansion: float
    use_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        x = Conv2d(hidden * 2, 1, padding=0, use_bias=self.use_bias,
                   dtype=self.dtype)(x)
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), feature_group_count=c, padding=1,
                    use_bias=self.use_bias, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = gelu(x1) * x2
        return Conv2d(self.dim, 1, padding=0, use_bias=self.use_bias,
                      dtype=self.dtype)(x)


class ISA(nn.Module):
    """Channel ("inner-patch") self-attention over flattened patch tokens."""

    dim: int
    use_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        qkv = nn.Dense(c * 3, dtype=self.dtype, param_dtype=jnp.float32)(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # channel attention: transpose to (b, c, n)
        q = q.transpose(0, 2, 1)
        k = k.transpose(0, 2, 1)
        v = v.transpose(0, 2, 1)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
        attn = jax.nn.softmax(
            jnp.einsum("bcn,bdn->bcd", q, k, preferred_element_type=jnp.float32)
            * scale, axis=-1,
        ).astype(v.dtype)
        out = jnp.einsum("bcd,bdn->bcn", attn, v)
        out = out.transpose(0, 2, 1).reshape(b, h, w, c)
        return Conv2d(self.dim, 1, padding=0, use_bias=self.use_bias,
                      dtype=self.dtype)(out)


class SDA(nn.Module):
    n_feats: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.zeros_init(), (self.n_feats,))
        x = Conv2d(self.n_feats * 2, 1, padding=0, dtype=self.dtype)(x)
        a, x = jnp.split(x, 2, axis=-1)
        c = a.shape[-1]
        a = nn.Conv(c, (5, 5), feature_group_count=c, padding=2,
                    dtype=self.dtype, param_dtype=jnp.float32)(a)
        a = nn.Conv(c, (7, 7), feature_group_count=c, kernel_dilation=(3, 3),
                    padding=(7 // 2) * 3, dtype=self.dtype,
                    param_dtype=jnp.float32)(a)
        a = Conv2d(c, 1, padding=0, dtype=self.dtype)(a)
        return Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(x * a) \
            * scale.astype(x.dtype)


class ITL(nn.Module):
    n_feats: int
    expansion: float
    use_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(jnp.tanh(x))
        x = x + ISA(self.n_feats, self.use_bias, self.dtype)(h)
        h = Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(jnp.tanh(x))
        return x + FeedForward(self.n_feats, self.expansion, self.use_bias,
                               self.dtype)(h)


class SAL(nn.Module):
    n_feats: int
    expansion: float
    use_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(jnp.tanh(x))
        x = x + SDA(self.n_feats, self.dtype)(h)
        h = Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(jnp.tanh(x))
        return x + FeedForward(self.n_feats, self.expansion, self.use_bias,
                               self.dtype)(h)


@ARCH_REGISTRY.register()
class ditn(nn.Module):
    inp_channels: int = 3
    dim: int = 60
    ITL_blocks: int = 4
    SAL_blocks: int = 4
    UFONE_blocks: int = 1
    ffn_expansion_factor: float = 2.0
    bias: bool = False
    patch_size: int = 8
    upscale: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, old_h, old_w, c = x.shape
        ps = self.patch_size
        pad_h = (-old_h) % ps
        pad_w = (-old_w) % ps
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        h, w = x.shape[1], x.shape[2]

        sft = Conv2d(self.dim, 3, dtype=self.dtype)(x)
        feat = sft
        for _ in range(self.UFONE_blocks):
            # local patches -> ITL stack
            local = feat.reshape(b, h // ps, ps, w // ps, ps, self.dim)
            local = local.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ps, ps, self.dim)
            for _ in range(self.ITL_blocks):
                local = ITL(self.dim, self.ffn_expansion_factor, self.bias,
                            self.dtype)(local)
            local = local.reshape(b, h // ps, w // ps, ps, ps, self.dim)
            feat = local.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, self.dim)
            for _ in range(self.SAL_blocks):
                feat = SAL(self.dim, self.ffn_expansion_factor, self.bias,
                           self.dtype)(feat)

        feat = Conv2d(self.dim, 3, dtype=self.dtype)(feat)
        out = Conv2d(3 * self.upscale**2, 3, dtype=self.dtype)(feat + sft)
        out = pixel_shuffle(out, self.upscale)
        return out[:, : old_h * self.upscale, : old_w * self.upscale, :]
