"""SAFMN — Spatially-Adaptive Feature Modulation network (+ light_safmnpp).

Behavioral parity with /root/reference/neosr/archs/safmn_arch.py:13-291.
NHWC flax; adaptive max-pool implemented with reduce_window (padding to the
window multiple when the spatial size isn't divisible).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle
from neosr_tpu.utils.registry import ARCH_REGISTRY


def adaptive_max_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC adaptive max pool to (out_h, out_w) (torch semantics when
    divisible; padded max-pool otherwise)."""
    n, h, w, c = x.shape
    if h % out_h == 0 and w % out_w == 0:
        kh, kw = h // out_h, w // out_w
    else:
        kh, kw = -(-h // out_h), -(-w // out_w)
        ph, pw = kh * out_h - h, kw * out_w - w
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, kh, kw, 1), "VALID"
    )


def nearest_resize_to(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') to a static target size."""
    h, w = x.shape[1], x.shape[2]
    rows = np.floor(np.arange(out_h) * h / out_h).astype(np.int32)
    cols = np.floor(np.arange(out_w) * w / out_w).astype(np.int32)
    return x[:, rows][:, :, cols]


def _dw(x, k=3, use_bias=True, dtype=jnp.float32):
    c = x.shape[-1]
    return nn.Conv(
        c, (k, k), feature_group_count=c, padding=k // 2, use_bias=use_bias,
        dtype=dtype, param_dtype=jnp.float32,
    )(x)


class SAFM(nn.Module):
    dim: int
    n_levels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        chunks = jnp.split(x, self.n_levels, axis=-1)
        outs = []
        for i, xc in enumerate(chunks):
            if i > 0:
                s = adaptive_max_pool(xc, max(h // 2**i, 1), max(w // 2**i, 1))
                s = _dw(s, 3, dtype=self.dtype)
                s = nearest_resize_to(s, h, w)
            else:
                s = _dw(xc, 3, dtype=self.dtype)
            outs.append(s)
        out = Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(
            jnp.concatenate(outs, axis=-1)
        )
        return gelu(out) * x


class CCM(nn.Module):
    dim: int
    growth: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.growth)
        x = gelu(Conv2d(hidden, 3, dtype=self.dtype)(x))
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(x)


class AttBlock(nn.Module):
    dim: int
    ffn_scale: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = SAFM(self.dim, dtype=self.dtype)(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)) + x
        x = CCM(self.dim, self.ffn_scale, dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        ) + x
        return x


@ARCH_REGISTRY.register()
class safmn(nn.Module):
    dim: int = 36
    num_layers: int = 6
    n_blocks: int = 8
    ffn_scale: float = 2.0
    upscaling_factor: int = 4
    bcie: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        feat = Conv2d(self.dim, 3, dtype=self.dtype)(x)
        h = feat
        if self.bcie:
            for _ in range(self.n_blocks):
                inner = h
                for _ in range(self.num_layers):
                    inner = AttBlock(self.dim, self.ffn_scale, self.dtype)(inner)
                h = Conv2d(self.dim, 3, dtype=self.dtype)(inner) + h
        else:
            for _ in range(self.n_blocks):
                h = AttBlock(self.dim, self.ffn_scale, self.dtype)(h)
        h = h + feat
        h = Conv2d(3 * self.upscaling_factor**2, 3, dtype=self.dtype)(h)
        return pixel_shuffle(h, self.upscaling_factor)


@ARCH_REGISTRY.register()
def safmn_l(**kwargs):
    kwargs.setdefault("upscaling_factor", kwargs.pop("upscale", 4))
    return safmn(dim=128, n_blocks=16, **kwargs)


class SimpleSAFM(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        proj = Conv2d(self.dim, 3, use_bias=False, dtype=self.dtype)(x)
        x0, x1 = jnp.split(proj, 2, axis=-1)
        x2 = adaptive_max_pool(x0, max(h // 8, 1), max(w // 8, 1))
        x2 = _dw(x2, 3, use_bias=False, dtype=self.dtype)
        x2 = jax.image.resize(x2, (x2.shape[0], h, w, x2.shape[-1]), "bilinear")
        x2 = gelu(x2) * x0
        out = jnp.concatenate([x1, x2], axis=-1)
        return Conv2d(self.dim, 1, padding=0, use_bias=False, dtype=self.dtype)(
            gelu(out)
        )


@ARCH_REGISTRY.register()
class light_safmnpp(nn.Module):
    dim: int = 32
    n_blocks: int = 2
    ffn_scale: float = 1.5
    upscaling_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        feat = Conv2d(self.dim, 3, use_bias=False, dtype=self.dtype)(x)
        h = feat
        for _ in range(self.n_blocks):
            h = SimpleSAFM(self.dim, self.dtype)(h)
            hidden = int(self.dim * self.ffn_scale)
            h2 = gelu(Conv2d(hidden, 3, use_bias=False, dtype=self.dtype)(h))
            h = Conv2d(self.dim, 1, padding=0, use_bias=False, dtype=self.dtype)(h2)
        h = h + feat
        h = Conv2d(3 * self.upscaling_factor**2, 3, use_bias=False, dtype=self.dtype)(h)
        return pixel_shuffle(h, self.upscaling_factor)
