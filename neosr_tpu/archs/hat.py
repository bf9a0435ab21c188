"""HAT — Hybrid Attention Transformer.

Behavioral parity with /root/reference/neosr/archs/hat_arch.py:15-1207:
HAB blocks (window MSA + channel-attention conv branch with conv_scale 0.01),
one OCAB (overlapping cross-attention, overlap_ratio) per group, RHAG
residual groups, pixel-shuffle head.  NHWC flax on the shared swin_util
skeleton; presets hat_s/hat_m/hat_l (hat_arch.py:1150-1207).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, DropPath, gelu, lrelu, trunc_normal_init, Upsample
from neosr_tpu.archs.swin_util import (
    Mlp,
    WindowAttention,
    shift_attn_mask,
    window_partition,
    window_reverse,
)
from neosr_tpu.utils.registry import ARCH_REGISTRY


@functools.lru_cache(maxsize=32)
def rpi_oca(ws: int, wse: int) -> np.ndarray:
    """(ws*ws, wse*wse) index for overlapping cross-attention bias."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    co = co.reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(wse), np.arange(wse), indexing="ij"))
    ce = ce.reshape(2, -1)
    rel = ce[:, None, :] - co[:, :, None]  # 2, ws*ws, wse*wse
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - wse + 1
    rel[:, :, 1] += ws - wse + 1
    rel[:, :, 0] *= ws + wse - 1
    return rel.sum(-1)


def _overlap_windows(x: jnp.ndarray, ws: int, wse: int, nh: int, nw: int) -> jnp.ndarray:
    """Extract overlapping (wse x wse) windows at stride ws from a padded
    NHWC map -> (b, nh, nw, wse, wse, c) using only slices/reshapes/concats.

    Window rows [wi*ws, wi*ws+wse) are assembled from full-height strided
    reshapes at offsets q*ws (q = 0..ceil(wse/ws)), then cropped to wse; the
    same along columns.  Gradient is the mirrored concat/slice — no gather,
    no im2col convolution.
    """
    b = x.shape[0]
    c = x.shape[-1]
    nq = -(-wse // ws)  # pieces per axis

    def expand(t, axis_len, n_blocks, axis):
        # t has spatial axis `axis` of length >= n_blocks*ws + (nq)*ws
        need = (n_blocks + nq - 1) * ws + ws
        pad_amt = need - t.shape[axis]
        if pad_amt > 0:
            cfg = [(0, 0)] * t.ndim
            cfg[axis] = (0, pad_amt)
            t = jnp.pad(t, cfg)
        pieces = []
        for qi in range(nq):
            sl = [slice(None)] * t.ndim
            sl[axis] = slice(qi * ws, qi * ws + n_blocks * ws)
            piece = t[tuple(sl)]
            new_shape = list(piece.shape)
            new_shape[axis : axis + 1] = [n_blocks, ws]
            pieces.append(piece.reshape(new_shape))
        out = jnp.concatenate(pieces, axis=axis + 1)
        sl = [slice(None)] * out.ndim
        sl[axis + 1] = slice(0, wse)
        return out[tuple(sl)]

    t = expand(x, x.shape[1], nh, 1)          # (b, nh, wse, Wp, c)
    t = expand(t, t.shape[3], nw, 3)          # (b, nh, wse, nw, wse, c)
    return t.transpose(0, 1, 3, 2, 4, 5)      # (b, nh, nw, wse, wse, c)


class ChannelAttention(nn.Module):
    num_feat: int
    squeeze_factor: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = jax.nn.relu(Conv2d(self.num_feat // self.squeeze_factor, 1, padding=0,
                               dtype=self.dtype)(y))
        y = jax.nn.sigmoid(Conv2d(self.num_feat, 1, padding=0, dtype=self.dtype)(y))
        return x * y


class CAB(nn.Module):
    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = gelu(Conv2d(self.num_feat // self.compress_ratio, 3,
                               dtype=self.dtype)(x))
        y = Conv2d(self.num_feat, 3, dtype=self.dtype)(y)
        return ChannelAttention(self.num_feat, self.squeeze_factor, self.dtype)(y)


class HAB(nn.Module):
    """Hybrid Attention Block: W-MSA + CAB conv branch."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        win = self.window_size
        shift = self.shift_size
        if min(h, w) <= win:
            shift = 0
            win = min(h, w, win)

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        conv_x = CAB(self.dim, self.compress_ratio, self.squeeze_factor, self.dtype)(x)

        if shift > 0:
            sx = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, win, shift))
        else:
            sx = x
            mask = None
        windows = window_partition(sx, win)
        attn = WindowAttention(self.dim, (win, win), self.num_heads,
                               self.qkv_bias, self.qk_scale, self.dtype)(windows, mask)
        sx = window_reverse(attn, win, h, w)
        if shift > 0:
            sx = jnp.roll(sx, (shift, shift), axis=(1, 2))

        x = shortcut + DropPath(self.drop_path)(sx, deterministic=deterministic) \
            + conv_x * self.conv_scale
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)(
            y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


class OCAB(nn.Module):
    """Overlapping cross-attention block."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        wse = int(self.overlap_ratio * ws) + ws
        pad = (wse - ws) // 2
        d = self.dim // self.num_heads
        scale = self.qk_scale or d**-0.5

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=trunc_normal_init())(x)
        q = qkv[..., : self.dim]
        kv = qkv[..., self.dim :]  # (b, h, w, 2c)

        q_windows = window_partition(q, ws)  # (b*nw, ws*ws, c)

        # overlapping kv windows: pad then extract wse-windows at stride ws.
        # Built from <=ceil(wse/ws)+1 reshaped full-tensor slices + concat —
        # pure data movement. (conv_general_dilated_patches materializes an
        # identity conv filter of wse*wse*2c output channels: ~250 ms/block
        # fwd+bwd on a v5e at production shapes vs ~mem-bandwidth here.)
        kv_pad = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        nh, nw = h // ws, w // ws
        patches = _overlap_windows(kv_pad, ws, wse, nh, nw)
        patches = patches.reshape(b * nh * nw, wse * wse, 2 * c)
        k_windows = patches[..., :c]
        v_windows = patches[..., c:]

        b_, nq, _ = q_windows.shape
        n = k_windows.shape[1]
        qh = q_windows.reshape(b_, nq, self.num_heads, d).transpose(0, 2, 1, 3)
        kh = k_windows.reshape(b_, n, self.num_heads, d).transpose(0, 2, 1, 3)
        vh = v_windows.reshape(b_, n, self.num_heads, d).transpose(0, 2, 1, 3)

        bias_table = self.param(
            "relative_position_bias_table", trunc_normal_init(),
            ((ws + wse - 1) ** 2, self.num_heads),
        )
        idx = rpi_oca(ws, wse)
        bias = bias_table[idx.reshape(-1)].reshape(nq, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)

        attn = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh,
                          preferred_element_type=jnp.float32) + bias[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b_, nq, self.dim)
        out = window_reverse(out, ws, h, w)
        out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=trunc_normal_init())(out)
        x = out + shortcut
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)(
            y, deterministic=deterministic)
        return x + y


class RHAG(nn.Module):
    """Residual Hybrid Attention Group."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: float | None
    drop_path: Sequence[float]
    resi_connection: str = "1conv"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        res = x
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = HAB(
                self.dim, self.num_heads, self.window_size,
                0 if i % 2 == 0 else self.window_size // 2,
                self.compress_ratio, self.squeeze_factor, self.conv_scale,
                self.mlp_ratio, self.qkv_bias, self.qk_scale, dp, self.dtype,
            )(x, deterministic=deterministic)
        x = OCAB(self.dim, self.window_size, self.overlap_ratio, self.num_heads,
                 self.qkv_bias, self.qk_scale, self.mlp_ratio, self.dtype)(
            x, deterministic=deterministic)
        if self.resi_connection == "1conv":
            x = Conv2d(self.dim, 3, dtype=self.dtype)(x)
        return x + res


@ARCH_REGISTRY.register()
class hat(nn.Module):
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
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
        for i, depth in enumerate(self.depths):
            h = RHAG(
                self.embed_dim, depth, self.num_heads[i], self.window_size,
                self.compress_ratio, self.squeeze_factor, self.conv_scale,
                self.overlap_ratio, self.mlp_ratio, self.qkv_bias, self.qk_scale,
                tuple(float(v) for v in dpr[start : start + depth]),
                self.resi_connection, self.dtype,
            )(h, deterministic=deterministic)
            start += depth
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h) + feat

        # reconstruction (presets use pixelshuffle)
        h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(h), slope=0.01)  # torch default slope (conv_before_upsample)
        h = Upsample(self.upscale, num_feat, dtype=self.dtype)(h)
        out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)
        return out / self.img_range + mean


@ARCH_REGISTRY.register()
def hat_s(**kwargs):
    kwargs.setdefault("upscale", 4)
    return hat(
        embed_dim=144, depths=(6,) * 6, num_heads=(6,) * 6, window_size=16,
        compress_ratio=24, squeeze_factor=24, mlp_ratio=2.0,
        upsampler="pixelshuffle", **kwargs,
    )


@ARCH_REGISTRY.register()
def hat_m(**kwargs):
    kwargs.setdefault("upscale", 4)
    return hat(
        embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6, window_size=16,
        compress_ratio=3, squeeze_factor=30, mlp_ratio=2.0,
        upsampler="pixelshuffle", **kwargs,
    )


@ARCH_REGISTRY.register()
def hat_l(**kwargs):
    kwargs.setdefault("upscale", 4)
    return hat(
        embed_dim=180, depths=(6,) * 12, num_heads=(6,) * 12, window_size=16,
        compress_ratio=3, squeeze_factor=30, mlp_ratio=2.0,
        upsampler="pixelshuffle", **kwargs,
    )
