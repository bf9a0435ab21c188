"""EIMN — Efficient Information Modulation Network.

Behavioral parity with /root/reference/neosr/archs/eimn_arch.py:48-319:
MOLRCM multi-scale dilated-depthwise attention, SADFFM gated FFN with DFFM
dual-feature modulation, per-block layer scales (init 1e-2), per-stage
LayerNorm, pixel-shuffle tail with global residual.  BatchNorm runs in
batch-statistics mode (purity; see ea2fpn note).  NHWC flax.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, DropPath, gelu, pixel_shuffle
from neosr_tpu.archs.ea2fpn import BatchStatNorm
from neosr_tpu.utils.registry import ARCH_REGISTRY


def _dw(x, k, dilation=1, dtype=jnp.float32):
    c = x.shape[-1]
    pad = (k // 2) * dilation
    return nn.Conv(c, (k, k), feature_group_count=c,
                   kernel_dilation=(dilation, dilation),
                   padding=((pad, pad), (pad, pad)), dtype=dtype,
                   param_dtype=jnp.float32)(x)


class DFFM(nn.Module):
    act_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        rc = int(c * self.act_ratio)
        identity = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x_global = gelu(
            Conv2d(rc, 1, padding=0, dtype=self.dtype)(x.mean(axis=(1, 2), keepdims=True))
        )
        x_local = gelu(Conv2d(rc, 1, padding=0, dtype=self.dtype)(x))
        c_attn = jax.nn.sigmoid(Conv2d(c, 1, padding=0, dtype=self.dtype)(x_global))
        g = jnp.broadcast_to(x_global, (*x_local.shape[:-1], rc))
        s_attn = jax.nn.sigmoid(
            Conv2d(1, 1, padding=0, dtype=self.dtype)(
                jnp.concatenate([x_local, g], axis=-1)
            )
        )
        return identity * (c_attn * s_attn)


class SADFFM(nn.Module):
    dim: int
    expand_ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expand_ratio)
        x = Conv2d(hidden * 2, 1, padding=0, dtype=self.dtype)(x)
        x = _dw(x, 3, dtype=self.dtype)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = gelu(x1) * x2
        x = Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(x)
        return DFFM(dtype=self.dtype)(x)


class MOLRCM(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c1 = int((3 / 8) * self.dim)
        c2 = int((1 / 8) * self.dim)
        value = Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(x)
        query = gelu(Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(x))
        query = _dw(query, 5, dtype=self.dtype)
        q1 = _dw(query[..., :c1], 5, dilation=2, dtype=self.dtype)
        q2 = query[..., c1 : c1 + c2]
        q3 = _dw(query[..., c1 + c2 :], 7, dilation=3, dtype=self.dtype)
        fused = Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(
            jnp.concatenate([q1, q2, q3], axis=-1)
        )
        out = jax.nn.silu(fused)
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(out * value)


class EIMNBlock(nn.Module):
    dim: int
    mlp_ratio: float = 2.66
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ls1 = self.param("layer_scale_1",
                         lambda k, s: jnp.full(s, 1e-2, jnp.float32), (self.dim,))
        ls2 = self.param("layer_scale_2",
                         lambda k, s: jnp.full(s, 1e-2, jnp.float32), (self.dim,))
        h = MOLRCM(self.dim, self.dtype)(BatchStatNorm(dtype=self.dtype)(x))
        x = x + DropPath(self.drop_path)(ls1 * h, deterministic=deterministic)
        h = SADFFM(self.dim, self.mlp_ratio, self.dtype)(
            BatchStatNorm(dtype=self.dtype)(x)
        )
        return x + DropPath(self.drop_path)(ls2 * h, deterministic=deterministic)


@ARCH_REGISTRY.register()
class eimn(nn.Module):
    embed_dims: int = 64
    scale: int = 4
    depths: int = 1
    mlp_ratios: float = 2.66
    drop_path_rate: float = 0.0
    num_stages: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = Conv2d(self.embed_dims, 3, dtype=self.dtype)(x)
        identity = h
        dpr = np.linspace(0, self.drop_path_rate, self.depths * self.num_stages)
        cur = 0
        for _ in range(self.num_stages):
            for j in range(self.depths):
                h = EIMNBlock(self.embed_dims, self.mlp_ratios,
                              float(dpr[cur + j]), self.dtype)(h, deterministic)
            cur += self.depths
            # stage norm is a stock nn.LayerNorm in the reference
            # (eimn_arch.py:268) -> torch default eps 1e-5
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv2d(3 * self.scale**2, 3, dtype=self.dtype)(identity + h)
        return pixel_shuffle(h, self.scale)


@ARCH_REGISTRY.register()
def eimn_l(**kwargs):
    kwargs.setdefault("scale", kwargs.pop("upscale", 2))
    return eimn(embed_dims=64, num_stages=16, **kwargs)


@ARCH_REGISTRY.register()
def eimn_a(**kwargs):
    kwargs.setdefault("scale", kwargs.pop("upscale", 2))
    return eimn(embed_dims=64, num_stages=14, **kwargs)
