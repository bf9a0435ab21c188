"""HMA — Hybrid Multi-Axis Aggregation network.

Behavioral parity with /root/reference/neosr/archs/hma_arch.py:265-1403:
groups interleave FusedConv (LN -> 3x3 expand x6 -> SE -> 1x1) with FAB
window-attention blocks (shift on odd indices), then one GAB per group that
splits channels across grid cross-attention (interval-strided grid shuffle,
two chained AffineTransform attentions with dynamic position bias) and
plain + shifted window attention, fused with a learnable group scale.
Presets hma_medium/hma_large.  NHWC flax on the shared swin skeleton.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, DropPath, gelu, lrelu, trunc_normal_init, Upsample
from neosr_tpu.archs.dat import DynamicPosBias, rect_rel_coords
from neosr_tpu.archs.swin_util import (
    Mlp,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)
from neosr_tpu.utils.registry import ARCH_REGISTRY


class WindowAttentionQKV(nn.Module):
    """W-MSA over precomputed qkv windows (table-based rel pos bias)."""

    dim: int
    window_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qkv_windows, mask=None):
        b_, n, c3 = qkv_windows.shape
        c = c3 // 3
        d = c // self.num_heads
        win = self.window_size
        qkv = qkv_windows.reshape(b_, n, 3, self.num_heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        table = self.param("relative_position_bias_table", trunc_normal_init(),
                           ((2 * win - 1) ** 2, self.num_heads))
        idx = relative_position_index(win, win)
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (d**-0.5), k,
                          preferred_element_type=jnp.float32) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(out)


class FusedConv(nn.Module):
    num_feat: int
    expand_size: int = 6
    attn_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, H, W, C)
        mid = self.num_feat * self.expand_size
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = Conv2d(mid, 3, dtype=self.dtype)(h)
        h = gelu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h))
        # SE
        g = h.mean(axis=(1, 2), keepdims=True)
        rd = int(mid / self.attn_ratio)
        # SEModule act is SiLU (hma_arch.py SEModule)
        g = jax.nn.silu(Conv2d(rd, 1, padding=0, dtype=self.dtype)(g))
        g = jax.nn.sigmoid(Conv2d(mid, 1, padding=0, dtype=self.dtype)(g))
        h = h * g
        h = Conv2d(self.num_feat, 1, padding=0, dtype=self.dtype)(h)
        return h + shortcut


class FAB(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    drop_path: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (b, H, W, C)
        b, h, w, c = x.shape
        win = self.window_size
        shift = self.shift_size
        if min(h, w) <= win:
            shift = 0
            win = min(h, w, win)
        shortcut = x
        xl = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        qkv = nn.Dense(c * 3, dtype=self.dtype, param_dtype=jnp.float32)(xl)
        if shift > 0:
            qkv = jnp.roll(qkv, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, win, shift))
        else:
            mask = None
        windows = window_partition(qkv, win)
        attn = WindowAttentionQKV(self.dim, win, self.num_heads,
                                  self.dtype)(windows, mask)
        xs = window_reverse(attn, win, h, w)
        if shift > 0:
            xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path)(xs, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)(
            y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


class AffineTransform(nn.Module):
    """Attention step with dynamic position bias (hma_arch.py:478-578)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, gh: int, gw: int):
        # q,k,v: (B_, heads, n, d)
        d = q.shape[-1]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (d**-0.5), k,
                          preferred_element_type=jnp.float32)
        biases, idx = rect_rel_coords(gh, gw)
        # reference passes dim//4 and DynamicPosBias divides by 4 again
        # (hma_arch.py AffineTransform/DynamicPosBias) -> hidden = dim//16
        pos = DynamicPosBias(max(self.dim // 16, 1), self.num_heads, self.dtype)(
            jnp.asarray(biases))
        n = gh * gw
        bias = pos[idx.reshape(-1)].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


class GAB(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    interval_size: int
    mlp_ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (b, H, W, C)
        b, h, w, c = x.shape
        win = min(self.window_size, h, w)
        shift = win // 2
        iv = self.interval_size
        gh, gw = h // iv, w // iv
        heads = max(self.num_heads // 2, 1)

        shortcut = x
        qkv = nn.Dense(c * 3, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x_window = qkv[..., : c * 3 // 2]
        x_qkv = qkv[..., c * 3 // 2 :]

        def grid_shuffle(t):
            cc = t.shape[-1]
            t = t.reshape(b, gh, iv, gw, iv, cc)
            t = t.transpose(0, 2, 4, 1, 3, 5)
            return t.reshape(b * iv * iv, gh * gw, cc)

        def grid_unshuffle(t):
            cc = t.shape[-1]
            t = t.reshape(b, iv, iv, gh, gw, cc)
            t = t.transpose(0, 3, 1, 4, 2, 5)
            return t.reshape(b, h, w, cc)

        # grid cross-attention (half channels)
        half = c // 2
        dh = half // heads
        x_grid = nn.Dense(half, dtype=self.dtype, param_dtype=jnp.float32)(
            grid_shuffle(x))
        g = x_grid.reshape(-1, gh * gw, heads, dh).transpose(0, 2, 1, 3)
        t = grid_shuffle(x_qkv).reshape(-1, gh * gw, 3, heads, dh)
        t = t.transpose(2, 0, 3, 1, 4)
        q, k, v = t[0], t[1], t[2]
        y = AffineTransform(half, heads, self.dtype)(g, k, v, gh, gw)
        y = AffineTransform(half, heads, self.dtype)(q, g, y, gh, gw)
        y = y.transpose(0, 2, 1, 3).reshape(-1, gh, gw, half)
        x_grid_attn = grid_unshuffle(y.reshape(b * iv * iv, gh * gw, half)
                                     .reshape(-1, gh * gw, half))

        # window attention on quarter channels (plain + shifted)
        quarter = (c * 3) // 4
        xw = x_window[..., :quarter]
        xw_s = x_window[..., quarter:]
        wa = WindowAttentionQKV(c // 4, win, heads, self.dtype)(
            window_partition(xw, win))
        wa = window_reverse(wa, win, h, w)
        xw_s = jnp.roll(xw_s, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(shift_attn_mask(h, w, win, shift)) if shift > 0 else None
        # the reference NEVER window-partitions the shifted branch: it
        # reshapes (b,h,w,3c/4) row-major into win*win token strips, runs
        # attention, then re-scatters the output AS IF it were window tiles
        # (hma_arch.py GAB.forward x_window_s path). Replicated verbatim.
        was = WindowAttentionQKV(c // 4, win, heads, self.dtype)(
            xw_s.reshape(-1, win * win, (c * 3) // 4), mask)
        was = window_reverse(was, win, h, w)
        # the reference un-rolls the shifted branch on the FLATTENED
        # (b, h*w, c/4) view with dims=(1, 2) — i.e. it rolls the flat token
        # axis and the CHANNEL axis by `shift` (hma_arch.py GAB.forward).
        # Replicated verbatim for checkpoint parity.
        was = was.reshape(b, h * w, c // 4)
        was = jnp.roll(was, (shift, shift), axis=(1, 2))
        was = was.reshape(b, h, w, c // 4)

        merged = jnp.concatenate([wa, was, x_grid_attn], axis=-1)
        merged = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(merged)
        merged = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(merged)

        x = shortcut + merged
        # GAB FFN is POST-norm: x + norm2(mlp(x)) (hma_arch.py GAB.forward)
        y2 = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)(
            x, deterministic=deterministic)
        return x + nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y2)


@ARCH_REGISTRY.register()
class hma(nn.Module):
    in_chans: int = 3
    embed_dim: int = 60
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 8
    interval_size: int = 4
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        num_feat = 64
        mean = jnp.asarray((0.5,) * 3, x.dtype) if self.in_chans == 3 else 0.0
        b, H0, W0, _ = x.shape
        ms = max(self.window_size, self.interval_size)
        ph, pw = (-H0) % ms, (-W0) % ms
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        x = (x - mean) * self.img_range

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype)(x)
        h = feat
        if self.patch_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for gi, depth in enumerate(self.depths):
            res = h
            for i in range(depth):
                if i % 2 == 0:
                    h = FusedConv(self.embed_dim, 6, 2, self.dtype)(h)
                fab = FAB(self.embed_dim, self.num_heads[gi], self.window_size,
                          0 if i % 2 == 0 else self.window_size // 2,
                          self.mlp_ratio, float(dpr[cur + i]), self.dtype)
                if self.use_checkpoint:  # remat (reference hma_arch.py flag)
                    h = nn.remat(FAB.__call__, static_argnums=(2,))(fab, h, deterministic)
                else:
                    h = fab(h, deterministic)
            cur += depth
            g = GAB(self.embed_dim, self.num_heads[gi], self.window_size,
                    self.interval_size, self.mlp_ratio, self.dtype)(h, deterministic)
            scale = self.param(f"group_scale_{gi}", trunc_normal_init(),
                               (self.embed_dim,))
            h = h + g * scale.astype(h.dtype)
            if self.resi_connection == "1conv":
                h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h)
            h = h + res
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h) + feat

        h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(h), slope=0.01)  # torch default slope (conv_before_upsample)
        h = Upsample(self.upscale, num_feat, dtype=self.dtype)(h)
        out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)
        out = out / self.img_range + mean
        return out[:, : H0 * self.upscale, : W0 * self.upscale, :]


@ARCH_REGISTRY.register()
def hma_medium(**kwargs):
    kwargs.setdefault("upscale", 4)
    return hma(embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
               window_size=16, **kwargs)


@ARCH_REGISTRY.register()
def hma_large(**kwargs):
    kwargs.setdefault("upscale", 4)
    return hma(embed_dim=180, depths=(6,) * 12, num_heads=(6,) * 12,
               window_size=24, **kwargs)
