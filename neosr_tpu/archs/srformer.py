"""SRFormer — permuted self-attention transformer.

Behavioral parity with /root/reference/neosr/archs/srformer_arch.py:124-1263:
PSA compresses K/V 2x spatially (2x2 blocks folded into channels via the
permuted reshape) so window attention runs (n x n/4); aligned relative
position bias on the permuted grid; ConvFFN; swin-style groups.  Presets
srformer_light / srformer_medium (srformer_arch.py:1232-1263).  NHWC flax.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, DropPath, Upsample, lrelu, pixel_shuffle, trunc_normal_init
from neosr_tpu.archs.atd import ConvFFN
from neosr_tpu.archs.swin_util import window_partition, window_reverse
from neosr_tpu.utils.registry import ARCH_REGISTRY


@functools.lru_cache(maxsize=32)
def psa_rel_index(pw: int) -> np.ndarray:
    """Aligned relative position index (4*pw*pw, pw*pw)."""
    coords = np.stack(np.meshgrid(np.arange(pw), np.arange(pw), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += pw - 1
    rel[:, :, 1] += pw - 1
    rel[:, :, 0] *= 2 * pw - 1
    idx = rel.sum(-1)  # (pw*pw, pw*pw)
    idx = idx.reshape(pw, pw, 1, 1, pw * pw)
    idx = np.tile(idx, (1, 1, 2, 2, 1))
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(4 * pw * pw, pw * pw)
    return idx


@functools.lru_cache(maxsize=32)
def psa_shift_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """(nW, win*win, (win//2)**2) mask between full and permuted tokens."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    full = img.reshape(h // win, win, w // win, win).transpose(0, 2, 1, 3)
    full = full.reshape(-1, win * win)
    sub = img[::2, ::2]
    pw = win // 2
    perm = sub.reshape(h // 2 // pw, pw, w // 2 // pw, pw).transpose(0, 2, 1, 3)
    perm = perm.reshape(-1, pw * pw)
    am = full[:, :, None] - perm[:, None, :]
    return np.where(am != 0, -100.0, 0.0).astype(np.float32)


class PSA(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):  # x: (B_, n, c) windows
        b_, n, c = x.shape
        win = self.window_size
        pw = win // 2
        d = c // self.num_heads
        scale = self.qk_scale or d**-0.5

        kv = nn.Dense(c // 2, use_bias=self.qkv_bias, dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=trunc_normal_init())(x)
        kv = kv.reshape(b_, pw, 2, pw, 2, 2, c // 4)
        kv = kv.transpose(0, 1, 3, 5, 2, 4, 6)
        kv = kv.reshape(b_, n // 4, 2, self.num_heads, d).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32, kernel_init=trunc_normal_init())(x)
        q = q.reshape(b_, n, self.num_heads, d).transpose(0, 2, 1, 3)

        table = self.param(
            "relative_position_bias_table", trunc_normal_init(),
            ((2 * pw - 1) ** 2, self.num_heads),
        )
        idx = psa_rel_index(pw)
        bias = table[idx.reshape(-1)].reshape(n, n // 4, self.num_heads)
        bias = bias.transpose(2, 0, 1)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32) + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n // 4)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n // 4)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=trunc_normal_init())(out)


class PSABlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        win = self.window_size
        shift = self.shift_size
        if min(h, w) <= win:
            shift = 0
            win = min(h, w, win)
        if win % 2 != 0:
            win = max(win - 1, 2)
            shift = 0

        shortcut = x
        xl = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if shift > 0:
            xl = jnp.roll(xl, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(psa_shift_mask(h, w, win, shift))
        else:
            mask = None
        windows = window_partition(xl, win)
        attn = PSA(self.dim, win, self.num_heads, self.qkv_bias, self.qk_scale,
                   self.dtype)(windows, mask)
        xl = window_reverse(attn, win, h, w)
        if shift > 0:
            xl = jnp.roll(xl, (shift, shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path)(xl, deterministic=deterministic)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = ConvFFN(int(self.dim * self.mlp_ratio), self.dim, 5, self.dtype)(y)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


@ARCH_REGISTRY.register()
class srformer(nn.Module):
    in_chans: int = 3
    embed_dim: int = 60
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 16
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "pixelshuffledirect"
    resi_connection: str = "1conv"
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        num_feat = 64
        mean = jnp.asarray((0.5,) * 3, x.dtype) if self.in_chans == 3 else 0.0
        x = (x - mean) * self.img_range

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype)(x)
        h = feat
        if self.patch_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        start = 0
        for gi, depth in enumerate(self.depths):
            res = h
            for i in range(depth):
                blk = PSABlock(
                    self.embed_dim, self.num_heads[gi], self.window_size,
                    0 if i % 2 == 0 else self.window_size // 2,
                    self.mlp_ratio, self.qkv_bias, self.qk_scale,
                    float(dpr[start + i]), self.dtype,
                )
                if self.use_checkpoint:  # remat: recompute in backward (ref srformer_arch.py)
                    h = nn.remat(PSABlock.__call__, static_argnums=(2,))(blk, h, deterministic)
                else:
                    h = blk(h, deterministic)
            start += depth
            if self.resi_connection == "1conv":
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
def srformer_light(**kwargs):
    kwargs.setdefault("upscale", 4)
    return srformer(
        embed_dim=60, depths=(6, 6, 6, 6), num_heads=(6, 6, 6, 6),
        window_size=16, mlp_ratio=2.0, upsampler="pixelshuffledirect", **kwargs,
    )


@ARCH_REGISTRY.register()
def srformer_medium(**kwargs):
    kwargs.setdefault("upscale", 4)
    return srformer(
        embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
        window_size=24, mlp_ratio=2.0, upsampler="pixelshuffle", **kwargs,
    )
