"""DAT — Dual Aggregation Transformer.

Behavioral parity with /root/reference/neosr/archs/dat_arch.py:42-1122:
alternating axial-spatial blocks (dual rectangular-window branches on split
channels with dynamic position bias + AIM conv interaction) and axial-channel
blocks (XCiT-style normalized channel attention + AIM), SGFN spatial-gate
FFN, residual groups with 1conv fusion, pixel-shuffle heads.  Presets
dat_s/dat_m/dat_2 (dat_arch.py:1080-1122).  NHWC flax; shift masks and the
alternate-shift schedule computed from static shapes.  BatchNorm in
batch-statistics mode (see ea2fpn note).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, DropPath, gelu, lrelu, pixel_shuffle, trunc_normal_init, Upsample
from neosr_tpu.archs.ea2fpn import BatchStatNorm
from neosr_tpu.utils.registry import ARCH_REGISTRY


def rect_window_partition(x: jnp.ndarray, hs: int, ws: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // hs, hs, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, hs * ws, c)


def rect_window_reverse(x: jnp.ndarray, hs: int, ws: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    b = x.shape[0] // ((h // hs) * (w // ws))
    x = x.reshape(b, h // hs, w // ws, hs, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


@functools.lru_cache(maxsize=64)
def rect_shift_mask(h: int, w: int, hs: int, ws: int, sh: int, sw: int) -> np.ndarray:
    img = np.zeros((h, w))
    cnt = 0
    for hsl in (slice(0, -hs), slice(-hs, -sh), slice(-sh, None)):
        for wsl in (slice(0, -ws), slice(-ws, -sw), slice(-sw, None)):
            img[hsl, wsl] = cnt
            cnt += 1
    m = img.reshape(h // hs, hs, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, hs * ws)
    am = m[:, None, :] - m[:, :, None]
    return np.where(am != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=64)
def rect_rel_coords(hs: int, ws: int) -> tuple[np.ndarray, np.ndarray]:
    """(biases (M,2) mother-set, index (hs*ws, hs*ws)) for DynamicPosBias."""
    bh = np.arange(1 - hs, hs)
    bw = np.arange(1 - ws, ws)
    biases = np.stack(np.meshgrid(bh, bw, indexing="ij")).reshape(2, -1).T
    coords = np.stack(np.meshgrid(np.arange(hs), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += hs - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return biases.astype(np.float32), rel.sum(-1)


class DynamicPosBias(nn.Module):
    pos_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, biases):  # (M, 2) -> (M, heads)
        h = nn.Dense(self.pos_dim, dtype=self.dtype, param_dtype=jnp.float32)(biases)
        h = nn.Dense(self.pos_dim, dtype=self.dtype, param_dtype=jnp.float32)(
            jax.nn.relu(nn.LayerNorm(dtype=self.dtype)(h)))
        h = nn.Dense(self.pos_dim, dtype=self.dtype, param_dtype=jnp.float32)(
            jax.nn.relu(nn.LayerNorm(dtype=self.dtype)(h)))
        return nn.Dense(self.num_heads, dtype=self.dtype, param_dtype=jnp.float32)(
            jax.nn.relu(nn.LayerNorm(dtype=self.dtype)(h)))


class SpatialAttentionBranch(nn.Module):
    """Rect-window MSA with dynamic position bias."""

    dim: int
    hs: int
    ws: int
    num_heads: int
    qk_scale: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qkv_sp, mask=None):
        # qkv_sp: (b, H, W, 3*dim) already shifted as needed
        b, h, w, _ = qkv_sp.shape
        d = self.dim // self.num_heads
        scale = self.qk_scale or d**-0.5
        windows = rect_window_partition(qkv_sp, self.hs, self.ws)
        b_, n, _ = windows.shape
        qkv = windows.reshape(b_, n, 3, self.num_heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        biases, idx = rect_rel_coords(self.hs, self.ws)
        # reference passes dim//4 and DynamicPosBias divides by 4 AGAIN
        # (dat_arch.py:135,216) -> hidden width = branch_dim // 16
        pos = DynamicPosBias(max(self.dim // 16, 1), self.num_heads, self.dtype)(
            jnp.asarray(biases))
        bias = pos[idx.reshape(-1)].reshape(n, n, self.num_heads).transpose(2, 0, 1)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, self.dim)
        return rect_window_reverse(out, self.hs, self.ws, h, w)


def _bn_gelu_conv(x, ch, dtype):
    x = Conv2d(ch, 1, padding=0, dtype=dtype)(x)
    return gelu(BatchStatNorm(dtype=dtype)(x))


class AxialSpatialAttention(nn.Module):
    dim: int
    num_heads: int
    split_size: Sequence[int] = (2, 4)
    shift: bool = False
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, H, W, C)
        b, h, w, c = x.shape
        s0, s1 = self.split_size[0], self.split_size[1]
        sh, sw = s0 // 2, s1 // 2
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=trunc_normal_init())(x)
        v_img = qkv[..., 2 * c :]

        # pad to split multiples
        ms = max(s0, s1)
        pad_b = (-h) % ms
        pad_r = (-w) % ms
        qkv_p = jnp.pad(qkv, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        def split_qkv(t, lo, hi):
            return jnp.concatenate(
                [t[..., lo:hi], t[..., c + lo : c + hi], t[..., 2 * c + lo : 2 * c + hi]],
                axis=-1,
            )

        half = c // 2
        qkv0 = split_qkv(qkv_p, 0, half)
        qkv1 = split_qkv(qkv_p, half, c)

        if self.shift and min(hp, wp) > ms:
            qkv0 = jnp.roll(qkv0, (-sh, -sw), axis=(1, 2))
            qkv1 = jnp.roll(qkv1, (-sw, -sh), axis=(1, 2))
            m0 = jnp.asarray(rect_shift_mask(hp, wp, s0, s1, sh, sw))
            m1 = jnp.asarray(rect_shift_mask(hp, wp, s1, s0, sw, sh))
            x0 = SpatialAttentionBranch(half, s0, s1, self.num_heads // 2,
                                        self.qk_scale, self.dtype)(qkv0, m0)
            x1 = SpatialAttentionBranch(half, s1, s0, self.num_heads // 2,
                                        self.qk_scale, self.dtype)(qkv1, m1)
            x0 = jnp.roll(x0, (sh, sw), axis=(1, 2))
            x1 = jnp.roll(x1, (sw, sh), axis=(1, 2))
        else:
            x0 = SpatialAttentionBranch(half, s0, s1, self.num_heads // 2,
                                        self.qk_scale, self.dtype)(qkv0)
            x1 = SpatialAttentionBranch(half, s1, s0, self.num_heads // 2,
                                        self.qk_scale, self.dtype)(qkv1)
        attened = jnp.concatenate([x0, x1], axis=-1)[:, :h, :w, :]

        # conv branch + AIM
        cv = nn.Conv(c, (3, 3), feature_group_count=c, padding=1,
                     dtype=self.dtype, param_dtype=jnp.float32)(v_img)
        cv = gelu(BatchStatNorm(dtype=self.dtype)(cv))
        ch_map = _bn_gelu_conv(cv.mean(axis=(1, 2), keepdims=True), c // 8, self.dtype)
        ch_map = Conv2d(c, 1, padding=0, dtype=self.dtype)(ch_map)
        sp_map = _bn_gelu_conv(attened, c // 16, self.dtype)
        sp_map = Conv2d(1, 1, padding=0, dtype=self.dtype)(sp_map)

        attened = attened * jax.nn.sigmoid(ch_map)
        cv = cv * jax.nn.sigmoid(sp_map)
        out = attened + cv
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=trunc_normal_init())(out)


class AxialChannelAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, H, W, C)
        b, h, w, c = x.shape
        n = h * w
        d = c // self.num_heads
        temperature = self.param("temperature", nn.initializers.ones_init(),
                                 (self.num_heads, 1, 1))
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32)(x).reshape(b, n, 3, self.num_heads, d)
        qkv = qkv.transpose(2, 0, 3, 4, 1)  # 3, b, nh, d, n
        q, k, v = qkv[0], qkv[1], qkv[2]
        v_img = v.reshape(b, c, n).reshape(b, self.num_heads * d, h, w)
        v_img = v_img.transpose(0, 2, 3, 1)

        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhdn,bhen->bhde", q, k,
                          preferred_element_type=jnp.float32) * temperature
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)
        out = out.reshape(b, c, n).transpose(0, 2, 1).reshape(b, h, w, c)

        cv = nn.Conv(c, (3, 3), feature_group_count=c, padding=1,
                     dtype=self.dtype, param_dtype=jnp.float32)(v_img)
        cv = gelu(BatchStatNorm(dtype=self.dtype)(cv))
        ch_map = _bn_gelu_conv(out.mean(axis=(1, 2), keepdims=True), c // 8, self.dtype)
        ch_map = Conv2d(c, 1, padding=0, dtype=self.dtype)(ch_map)
        sp_map = _bn_gelu_conv(cv, c // 16, self.dtype)
        sp_map = Conv2d(1, 1, padding=0, dtype=self.dtype)(sp_map)

        out = out * jax.nn.sigmoid(sp_map)
        cv = cv * jax.nn.sigmoid(ch_map)
        res = out + cv
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(res)


class SGFN(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, H, W, C)
        h = gelu(nn.Dense(self.hidden, dtype=self.dtype,
                                 param_dtype=jnp.float32)(x))
        x1, x2 = jnp.split(h, 2, axis=-1)
        x2 = nn.LayerNorm(dtype=self.dtype)(x2)
        x2 = nn.Conv(self.hidden // 2, (3, 3), feature_group_count=self.hidden // 2,
                     padding=1, dtype=self.dtype, param_dtype=jnp.float32)(x2)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x1 * x2)


class DATB(nn.Module):
    dim: int
    num_heads: int
    split_size: Sequence[int]
    expansion_factor: float
    qkv_bias: bool
    qk_scale: float | None
    drop_path: float
    rg_idx: int
    b_idx: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        rg, bi = self.rg_idx, self.b_idx
        shift = (rg % 2 == 0 and bi > 0 and (bi - 2) % 4 == 0) or (
            rg % 2 != 0 and bi % 4 == 0
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if bi % 2 == 0:
            attn = AxialSpatialAttention(
                self.dim, self.num_heads, self.split_size, shift,
                self.qkv_bias, self.qk_scale, self.dtype,
            )(h)
        else:
            attn = AxialChannelAttention(self.dim, self.num_heads,
                                         self.qkv_bias, self.dtype)(h)
        x = x + DropPath(self.drop_path)(attn, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = SGFN(self.dim, int(self.dim * self.expansion_factor), self.dtype)(y)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


@ARCH_REGISTRY.register()
class dat(nn.Module):
    in_chans: int = 3
    embed_dim: int = 180
    split_size: Sequence[int] = (2, 4)
    depth: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (2, 2, 2, 2)
    expansion_factor: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.1
    upscale: int = 4
    img_range: float = 1.0
    resi_connection: str = "1conv"
    upsampler: str = "pixelshuffle"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        num_feat = 64
        mean = jnp.asarray((0.5,) * 3, x.dtype) if self.in_chans == 3 else 0.0
        x = (x - mean) * self.img_range

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype)(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(feat)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depth))
        cur = 0
        for rg_idx, depth in enumerate(self.depth):
            res = h
            for i in range(depth):
                h = DATB(
                    self.embed_dim, self.num_heads[rg_idx], self.split_size,
                    self.expansion_factor, self.qkv_bias, self.qk_scale,
                    float(dpr[cur + i]), rg_idx, i, self.dtype,
                )(h, deterministic)
            cur += depth
            if self.resi_connection == "1conv":
                h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h)
            else:
                h = lrelu(Conv2d(self.embed_dim // 4, 3, dtype=self.dtype)(h))
                h = lrelu(Conv2d(self.embed_dim // 4, 1, padding=0, dtype=self.dtype)(h))
                h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h)
            h = h + res
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h) + feat

        if self.upsampler == "pixelshuffle":
            h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(h), slope=0.01)  # torch default slope (conv_before_upsample)
            h = Upsample(self.upscale, num_feat, dtype=self.dtype)(h)
            out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)
        else:
            h = Conv2d(self.in_chans * self.upscale**2, 3, dtype=self.dtype)(h)
            out = pixel_shuffle(h, self.upscale)
        return out / self.img_range + mean


@ARCH_REGISTRY.register()
def dat_s(**kwargs):
    kwargs.setdefault("upscale", 4)
    return dat(embed_dim=180, depth=(6,) * 6, num_heads=(6,) * 6,
               split_size=(8, 16), expansion_factor=2.0, **kwargs)


@ARCH_REGISTRY.register()
def dat_m(**kwargs):
    kwargs.setdefault("upscale", 4)
    return dat(embed_dim=180, depth=(6,) * 6, num_heads=(6,) * 6,
               split_size=(8, 32), expansion_factor=4.0, **kwargs)


@ARCH_REGISTRY.register()
def dat_2(**kwargs):
    kwargs.setdefault("upscale", 4)
    return dat(embed_dim=180, depth=(6,) * 6, num_heads=(6,) * 6,
               split_size=(8, 32), expansion_factor=2.0, **kwargs)
