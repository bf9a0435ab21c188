"""Omni-SR — spatial + channel omni-attention (block & grid axes).

Behavioral parity with /root/reference/neosr/archs/omnisr_arch.py:208-1123:
OSA blocks = MBConv -> block window attention -> gated conv FFN -> blockwise
channel attention -> FFN -> grid window attention -> FFN -> gridwise channel
attention -> FFN; OSAG groups end with ESA; zero-pad to window multiple.
`omnisr` preset needs explicit `upsampling` + `window_size` like the
reference (convert.py:25-27).  NHWC flax.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle
from neosr_tpu.utils.registry import ARCH_REGISTRY


@functools.lru_cache(maxsize=16)
def _rel_idx(win: int) -> np.ndarray:
    pos = np.stack(np.meshgrid(np.arange(win), np.arange(win), indexing="ij"))
    grid = pos.reshape(2, -1).T
    rel = grid[:, None, :] - grid[None, :, :] + win - 1
    return (rel * np.array([2 * win - 1, 1])).sum(-1)


def _dw(x, k=3, mult_groups=None, use_bias=True, dtype=jnp.float32):
    c = x.shape[-1]
    return nn.Conv(c, (k, k), feature_group_count=c, padding=k // 2,
                   use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32)(x)


class SqueezeExcitation(nn.Module):
    shrinkage_rate: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = int(c * self.shrinkage_rate)
        g = x.mean(axis=(1, 2))
        g = jax.nn.silu(nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                                 param_dtype=jnp.float32)(g))
        g = jax.nn.sigmoid(nn.Dense(c, use_bias=False, dtype=self.dtype,
                                    param_dtype=jnp.float32)(g))
        return x * g[:, None, None, :]


class MBConv(nn.Module):
    dim: int
    expansion_rate: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.expansion_rate * self.dim)
        h = gelu(Conv2d(hidden, 1, padding=0, dtype=self.dtype)(x))
        h = gelu(_dw(h, 3, dtype=self.dtype))
        h = SqueezeExcitation(dtype=self.dtype)(h)
        h = Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(h)
        return h + x


class WindowAttentionPE(nn.Module):
    """Attention over (w1*w2) tokens of block/grid windows, torch Embedding
    style relative bias."""

    dim: int
    dim_head: int
    window_size: int
    with_pe: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B', n, d) pre-normed windows
        b_, n, c = x.shape
        heads = self.dim // self.dim_head
        qkv = nn.Dense(self.dim * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)
        qkv = qkv.reshape(b_, n, 3, heads, self.dim_head).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * self.dim_head**-0.5, k,
                          preferred_element_type=jnp.float32)
        if self.with_pe:
            table = self.param("rel_pos_bias", nn.initializers.normal(1.0),
                               ((2 * self.window_size - 1) ** 2, heads))
            idx = _rel_idx(self.window_size)
            attn = attn + table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, self.dim)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(out)


class GatedConvFFN(nn.Module):
    dim: int
    mult: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.mult)
        h = Conv2d(hidden * 2, 1, padding=0, use_bias=False, dtype=self.dtype)(x)
        h = _dw(h, 3, use_bias=False, dtype=self.dtype)
        x1, x2 = jnp.split(h, 2, axis=-1)
        return Conv2d(self.dim, 1, padding=0, use_bias=False, dtype=self.dtype)(
            gelu(x1) * x2
        )


class ChannelAttention(nn.Module):
    """Blockwise (grid=False) / gridwise (grid=True) channel attention."""

    dim: int
    heads: int
    window_size: int
    grid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ps = self.window_size
        temperature = self.param("temperature", nn.initializers.ones_init(),
                                 (self.heads, 1, 1))
        qkv = Conv2d(c * 3, 1, padding=0, use_bias=False, dtype=self.dtype)(x)
        qkv = _dw(qkv, 3, use_bias=False, dtype=self.dtype)
        d = c // self.heads

        # (b, h/ps, ps, w/ps, ps, 3, heads, d)
        t = qkv.reshape(b, h // ps, ps, w // ps, ps, 3, self.heads, d)
        if self.grid:
            # tokens over (h/ps * w/ps); groups = (ps, ps)
            t = t.transpose(5, 0, 2, 4, 6, 7, 1, 3)  # 3,b,ps,ps,heads,d,h',w'
            t = t.reshape(3, b * ps * ps, self.heads, d, -1)
        else:
            t = t.transpose(5, 0, 1, 3, 6, 7, 2, 4)  # 3,b,h',w',heads,d,ps,ps
            t = t.reshape(3, b * (h // ps) * (w // ps), self.heads, d, -1)
        q, k, v = t[0], t[1], t[2]
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhdn,bhen->bhde", q, k,
                          preferred_element_type=jnp.float32) * temperature
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)

        if self.grid:
            out = out.reshape(b, ps, ps, self.heads, d, h // ps, w // ps)
            out = out.transpose(0, 5, 1, 6, 2, 3, 4)
        else:
            out = out.reshape(b, h // ps, w // ps, self.heads, d, ps, ps)
            out = out.transpose(0, 1, 5, 2, 6, 3, 4)
        out = out.reshape(b, h, w, c)
        return Conv2d(self.dim, 1, padding=0, use_bias=False, dtype=self.dtype)(out)


class ESA(nn.Module):
    n_feats: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = max(self.n_feats // 4, 16)
        c1_ = Conv2d(f, 1, padding=0, dtype=self.dtype)(x)
        c1 = nn.Conv(f, (3, 3), (2, 2), padding="VALID", dtype=self.dtype,
                     param_dtype=jnp.float32)(c1_)
        v_max = jax.lax.reduce_window(
            c1, -jnp.inf, jax.lax.max, (1, 7, 7, 1), (1, 3, 3, 1), "VALID"
        )
        c3 = Conv2d(f, 3, dtype=self.dtype)(v_max)
        c3 = jax.image.resize(c3, (x.shape[0], x.shape[1], x.shape[2], f), "bilinear")
        cf = Conv2d(f, 1, padding=0, dtype=self.dtype)(c1_)
        c4 = Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(c3 + cf)
        return x * jax.nn.sigmoid(c4)


class OSABlock(nn.Module):
    dim: int
    window_size: int
    with_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.window_size
        b, hh, ww, c = x.shape
        x = MBConv(self.dim, 1.0, self.dtype)(x)

        def block_windows(t):  # (b, x, y, w1, w2, d) flattened
            t = t.reshape(b, hh // w, w, ww // w, w, c)
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)

        def block_reverse(t):
            t = t.reshape(b, hh // w, ww // w, w, w, c)
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)

        def grid_windows(t):  # grid: (w1 x) (w2 y) — strided
            t = t.reshape(b, w, hh // w, w, ww // w, c)
            return t.transpose(0, 2, 4, 1, 3, 5).reshape(-1, w * w, c)

        def grid_reverse(t):
            t = t.reshape(b, hh // w, ww // w, w, w, c)
            return t.transpose(0, 3, 1, 4, 2, 5).reshape(b, hh, ww, c)

        # block attention
        win = block_windows(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        att = WindowAttentionPE(self.dim, self.dim // 4, w, self.with_pe,
                                self.dtype)(win)
        x = x + block_reverse(att)
        x = x + GatedConvFFN(self.dim, 1.0, self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        x = x + ChannelAttention(self.dim, 4, w, False, self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        x = x + GatedConvFFN(self.dim, 1.0, self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))

        # grid attention
        win = grid_windows(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        att = WindowAttentionPE(self.dim, self.dim // 4, w, self.with_pe,
                                self.dtype)(win)
        x = x + grid_reverse(att)
        x = x + GatedConvFFN(self.dim, 1.0, self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        x = x + ChannelAttention(self.dim, 4, w, True, self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        x = x + GatedConvFFN(self.dim, 1.0, self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        return x


class OSAG(nn.Module):
    dim: int
    block_num: int
    window_size: int
    with_pe: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for _ in range(self.block_num):
            h = OSABlock(self.dim, self.window_size, self.with_pe, self.dtype)(h)
        h = Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(h)
        return ESA(self.dim, self.dtype)(h + x)


@ARCH_REGISTRY.register()
class omnisr_net(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    res_num: int = 5
    block_num: int = 1
    upsampling: int = 4
    window_size: int = 8
    pe: bool = True
    bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, H, W, _ = x.shape
        win = self.window_size
        pad_h = (-H) % win
        pad_w = (-W) % win
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        residual = Conv2d(self.num_feat, 3, dtype=self.dtype)(x)
        h = residual
        for _ in range(self.res_num):
            h = OSAG(self.num_feat, self.block_num, win, self.pe, self.dtype)(h)
        h = Conv2d(self.num_feat, 3, dtype=self.dtype)(h) + residual
        out = Conv2d(self.num_out_ch * self.upsampling**2, 3, dtype=self.dtype)(h)
        out = pixel_shuffle(out, self.upsampling)
        return out[:, : H * self.upsampling, : W * self.upsampling, :]


@ARCH_REGISTRY.register()
def omnisr(**kwargs):
    kwargs.setdefault("upsampling", kwargs.pop("upscale", 4))
    kwargs.setdefault("window_size", 8)
    return omnisr_net(res_num=5, block_num=1, pe=True, **kwargs)
