"""GRFormer — grouped residual self-attention with rectangular windows.

Behavioral parity with /root/reference/neosr/archs/grformer_arch.py:13-623:
GRSA attention (channels split in two groups with residual linear q/k/v,
cosine attention with clamped logit scale, ESRPB continuous positional bias
MLP with 16*sigmoid), rectangular 8x32 windows whose orientation flips every
other pair of blocks, post-norm residuals, dwconv FFN, pixel-shuffle-direct
tail.  Presets grformer_medium/large.  NHWC flax.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle, trunc_normal_init
from neosr_tpu.archs.dat import rect_shift_mask, rect_window_partition, rect_window_reverse
from neosr_tpu.utils.registry import ARCH_REGISTRY


@functools.lru_cache(maxsize=32)
def _esrpb_tables(hs: int, ws: int) -> tuple[np.ndarray, np.ndarray]:
    rh = np.arange(-(hs - 1), hs, dtype=np.float64) / max(hs - 1, 1)
    rw = np.arange(-(ws - 1), ws, dtype=np.float64) / max(ws - 1, 1)
    table = np.stack(np.meshgrid(rh, rw, indexing="ij"), axis=-1) * 3.2
    table = np.sign(table) * (1 - np.exp(-np.abs(table)))
    coords = np.stack(np.meshgrid(np.arange(hs), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += hs - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return table.reshape(-1, 2).astype(np.float32), rel.sum(-1)


class GRSA(nn.Module):
    dim: int
    window_size: tuple[int, int]
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):  # x: (B_, n, c) windows
        b_, n, c = x.shape
        half = c // 2
        d = c // self.num_heads

        def grl(name, t):
            t0, t1 = t[..., :half], t[..., half:]
            a = t0 + nn.Dense(half, dtype=self.dtype, param_dtype=jnp.float32,
                              name=f"{name}1")(t0)
            b = t1 + nn.Dense(half, dtype=self.dtype, param_dtype=jnp.float32,
                              name=f"{name}2")(t1)
            # interleave groups back (stack then flatten like the reference)
            return jnp.stack([a, b], axis=2).reshape(b_, n, c)

        q = grl("q", x).reshape(b_, n, self.num_heads, d).transpose(0, 2, 1, 3)
        k = grl("k", x).reshape(b_, n, self.num_heads, d).transpose(0, 2, 1, 3)
        v = grl("v", x).reshape(b_, n, self.num_heads, d).transpose(0, 2, 1, 3)

        logit_scale = self.param(
            "logit_scale",
            lambda key, s: jnp.full(s, np.log(10.0), jnp.float32),
            (self.num_heads, 1, 1),
        )
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * jnp.exp(jnp.minimum(logit_scale, np.log(1.0 / 0.01)))

        table, idx = _esrpb_tables(*self.window_size)
        h1 = jax.nn.relu(nn.Dense(128, dtype=self.dtype,
                                  param_dtype=jnp.float32)(jnp.asarray(table)))
        bias_tab = nn.Dense(self.num_heads, use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32)(h1)
        bias = bias_tab[idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = 16.0 * jax.nn.sigmoid(bias.transpose(2, 0, 1))
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)

        o0 = nn.Dense(half, dtype=self.dtype, param_dtype=jnp.float32)(out[..., :half])
        o1 = nn.Dense(half, dtype=self.dtype, param_dtype=jnp.float32)(out[..., half:])
        return jnp.stack([o0, o1], axis=2).reshape(b_, n, c)


class GRSAB(nn.Module):
    dim: int
    num_heads: int
    window_size: tuple[int, int]
    shift_size: tuple[int, int]
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, H, W, c)
        b, h, w, c = x.shape
        hs, ws = self.window_size
        sh, sw = self.shift_size
        if h < hs or w < ws:
            hs, ws = min(h, hs), min(w, ws)
            sh = sw = 0

        shortcut = x
        if sh > 0:
            xs = jnp.roll(x, (-sh, -sw), axis=(1, 2))
            mask = jnp.asarray(rect_shift_mask(h, w, hs, ws, sh, sw))
        else:
            xs = x
            mask = None
        windows = rect_window_partition(xs, hs, ws)
        attn = GRSA(self.dim, (hs, ws), self.num_heads, self.dtype)(windows, mask)
        xs = rect_window_reverse(attn, hs, ws, h, w)
        if sh > 0:
            xs = jnp.roll(xs, (sh, sw), axis=(1, 2))

        # post-norm residuals (grformer_arch.py:399-404)
        x = shortcut + nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(xs)
        # FFN: fc1 -> gelu -> +(dw3 -> gelu -> dw3) -> fc2 (grformer_arch.py
        # FFN/dwconv classes)
        hidden = int(self.dim * self.mlp_ratio)
        y = gelu(nn.Dense(hidden, dtype=self.dtype,
                          param_dtype=jnp.float32)(x))
        dw = nn.Conv(hidden, (3, 3), feature_group_count=hidden, padding=1,
                     dtype=self.dtype, param_dtype=jnp.float32)(y)
        dw = nn.Conv(hidden, (3, 3), feature_group_count=hidden, padding=1,
                     dtype=self.dtype, param_dtype=jnp.float32)(gelu(dw))
        y = y + dw
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(y)
        return x + nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y)


@ARCH_REGISTRY.register()
class grformer(nn.Module):
    in_chans: int = 3
    embed_dim: int = 60
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (3, 3, 3, 3)
    window_size: Sequence[int] = (8, 32)
    mlp_ratio: float = 2.0
    upscale: int = 4
    img_range: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        mean = jnp.asarray((0.5,) * 3, x.dtype) if self.in_chans == 3 else 0.0
        b, H0, W0, _ = x.shape
        # reflect pad to the max-window multiple, crop at the end
        # (grformer_arch.py check_image_size)
        ms = max(self.window_size)
        ph, pw = (-H0) % ms, (-W0) % ms
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        x = (x - mean) * self.img_range

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype)(x)
        h = feat
        w0, w1 = self.window_size[0], self.window_size[1]
        for gi, depth in enumerate(self.depths):
            for i in range(depth):
                # every other PAIR of blocks swaps the rectangle orientation
                # (grformer_arch.py:295-296: bi//2 % 2 == 1 -> (w1, w0));
                # the shift stays derived from the unswapped window
                # (grformer_arch.py:433-435)
                win = (w0, w1) if (i // 2) % 2 == 0 else (w1, w0)
                shift = (0, 0) if i % 2 == 0 else (w0 // 2, w1 // 2)
                h = GRSAB(self.embed_dim, self.num_heads[gi], win, shift,
                          self.mlp_ratio, self.dtype)(h)
            # group residual: conv applied to the blocks' OUTPUT and added
            # back to it (grformer_arch.py GRSAB_Group.forward)
            h = h + Conv2d(self.embed_dim, 3, dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h) + feat
        h = Conv2d(self.in_chans * self.upscale**2, 3, dtype=self.dtype)(h)
        out = pixel_shuffle(h, self.upscale)
        out = out / self.img_range + mean
        return out[:, : H0 * self.upscale, : W0 * self.upscale, :]


@ARCH_REGISTRY.register()
def grformer_medium(**kwargs):
    kwargs.setdefault("upscale", 4)
    return grformer(embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6, **kwargs)


@ARCH_REGISTRY.register()
def grformer_large(**kwargs):
    kwargs.setdefault("upscale", 4)
    return grformer(embed_dim=180, depths=(6,) * 12, num_heads=(6,) * 12, **kwargs)
