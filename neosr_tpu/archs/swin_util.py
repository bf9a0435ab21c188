"""Shared window-attention transformer library (SwinIR-family skeleton).

TPU-native building blocks for swinir/hat/drct/srformer/... — the skeleton
described in SURVEY.md §3.5 (reference swinir_arch.py): window partition,
relative-position-biased MHSA, cyclic shift with additive masks, MLP,
pixel-shuffle heads.  Design choices for XLA/TPU:

* features stay NHWC end-to-end; window partition is pure reshapes (no
  flatten to (B,L,C) round-trips);
* the shifted-window attention mask and relative-position index are numpy
  constants computed at trace time from static shapes — no device gathers
  of index tensors;
* attention is batched einsum over (B*num_windows, heads, w*w, d): XLA maps
  the batched matmuls onto the MXU directly; a fused Pallas kernel can be
  swapped in via `window_attention` later without touching the archs.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import DropPath, gelu, trunc_normal_init

Dtype = Any


# ---------------------------------------------------------------------------
# window partition / reverse (NHWC)
# ---------------------------------------------------------------------------

def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, win*win, C)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, c)


def window_reverse(x: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, win*win, C) -> (B, H, W, C)"""
    c = x.shape[-1]
    b = x.shape[0] // (h // win * (w // win))
    x = x.reshape(b, h // win, w // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# relative position bias
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def relative_position_index(win_h: int, win_w: int) -> np.ndarray:
    """(win_h*win_w, win_h*win_w) index into a (2h-1)*(2w-1) bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(win_h), np.arange(win_w), indexing="ij")
    )  # 2, h, w
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]  # 2, n, n
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += win_h - 1
    rel[:, :, 1] += win_w - 1
    rel[:, :, 0] *= 2 * win_w - 1
    return rel.sum(-1)  # n, n


@functools.lru_cache(maxsize=64)
def shift_attn_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """Additive (-100/0) mask (nW, win*win, win*win) for shifted windows."""
    img_mask = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    mask = img_mask.reshape(h // win, win, w // win, win)
    mask = mask.transpose(0, 2, 1, 3).reshape(-1, win * win)
    attn_mask = mask[:, None, :] - mask[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# core modules
# ---------------------------------------------------------------------------

class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    act: Callable = gelu
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init())(x)
        x = self.act(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init())(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


def window_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    scale: float | None = None,
    layout: str = "bhnd",
) -> jnp.ndarray:
    """Batched window MHSA core.

    layout="bhnd" (default): q,k,v and the result are (B_, heads, N, d).
    layout="bnhd": q,k,v and the result are (B_, N, heads, d) — the
    layout a packed qkv Dense output already has after a reshape, so the
    caller needs NO 5-D transpose; the head dimension moves into the
    einsum batch spec instead ("bnhd,bmhd->bhnm"), letting XLA fold the
    layout into the dot dimension numbers rather than materializing a
    transposed copy.  Same math, same (B_, heads, N, N) logits either way.

    q,k,v: (B_, heads, N, d); bias: (heads, N, N); mask: (nW, N, N) applied
    cyclically over the window dim.  Returns (B_, heads, N, d).

    KERNEL VERDICT (measured on v5e, rounds 1-2): the XLA batched einsum is
    the right implementation; a hand-written Pallas fusion was built,
    benchmarked (11 ms vs 1.5-2.4 ms for swinir/hat window shapes, both
    per-window and multi-window-tiled variants) and DELETED.  The bound is
    structural, not schedulable: SR transformers use head_dim 30 (embed 180
    / 6 heads), and the MXU contracts in 128-granularity, so the QK^T /
    PV matmuls run at <=30/128 of peak in ANY kernel; packing heads into
    the contraction is algebraically wrong (cross-head sums) and
    block-diagonal packing re-spends the saved FLOPs.  Those attention
    matmuls are only ~20% of block FLOPs — the qkv/mlp/conv matmuls
    (K=180) dominate and XLA already fuses bias+mask+softmax between the
    two einsums here.  The recoverable HBM traffic from a flash-style
    fusion is <1 ms per swinir_medium step — not worth a Mosaic kernel
    that loses 5x on scheduling.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    # bf16 QK^T logits with an fp32-accumulated softmax normalizer, halving
    # the dominant (B_, heads, N, N) intermediate's traffic.  Measured
    # +7.9% on swinir_medium training (46.4 -> 50.0 p/s, BENCH_NOTES round
    # 3) and quality-validated on a training outcome: the swinir_small
    # anchor A/B (identical seeds, 6k iters, BENCH_NOTES round 4) matches
    # fp32 logits within +-0.07 dB at EVERY checkpoint.  Default is AUTO:
    # bf16 logits whenever the block already computes in bf16 (use_amp
    # training/eval — the exact condition the A/B validated), fp32 for
    # fp32 nets (torch-parity and ONNX-export gates stay numerically
    # exact).  NEOSR_ATTN_LOGITS / the `attn_logits` TOML key override.
    mode = os.environ.get("NEOSR_ATTN_LOGITS", "auto")
    bf16_logits = mode == "bf16" or (mode == "auto" and q.dtype == jnp.bfloat16)

    qk_spec, pv_spec = (("bnhd,bmhd->bhnm", "bhnm,bmhd->bnhd")
                        if layout == "bnhd"
                        else ("bhnd,bhmd->bhnm", "bhnm,bhmd->bhnd"))

    def _core(q_, k_, v_, bias_, mask_):
        pref = jnp.bfloat16 if bf16_logits else jnp.float32
        attn = jnp.einsum(qk_spec, q_ * scale, k_,
                          preferred_element_type=pref)
        if bias_ is not None:
            attn = attn + bias_[None].astype(pref)
        if mask_ is not None:
            nw = mask_.shape[0]
            b_ = attn.shape[0]
            attn = attn.reshape(b_ // nw, nw, *attn.shape[1:])
            attn = attn + mask_[None, :, None, :, :].astype(pref)
            attn = attn.reshape(b_, *attn.shape[2:])
        if bf16_logits:
            attn = attn - jax.lax.stop_gradient(
                jnp.max(attn, axis=-1, keepdims=True))
            ex = jnp.exp(attn)
            attn = (ex / jnp.sum(ex, axis=-1, keepdims=True,
                                 dtype=jnp.float32).astype(ex.dtype))
        else:
            attn = jax.nn.softmax(attn, axis=-1)
        attn = attn.astype(v_.dtype)
        return jnp.einsum(pv_spec, attn, v_)

    # remat the (B_, heads, N, N) fp32 logits: they are the dominant
    # activation of every swin-family train step (50 MB/block for
    # swinir_medium b8) and recomputing one QK^T einsum in the backward is
    # far cheaper than streaming them through HBM — this is the flash-
    # attention memory trick at the XLA level, without a custom kernel.
    return jax.checkpoint(
        _core, policy=jax.checkpoint_policies.nothing_saveable
    )(q, k, v, bias, mask)


class WindowAttention(nn.Module):
    """Window MHSA with relative position bias (reference swinir W-MSA)."""

    dim: int
    window_size: tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """x: (B_, N, C) windows; mask: (nW, N, N) or None."""
        b_, n, c = x.shape
        wh, ww = self.window_size
        head_dim = c // self.num_heads

        bias_table = self.param(
            "relative_position_bias_table", trunc_normal_init(),
            ((2 * wh - 1) * (2 * ww - 1), self.num_heads),
        )
        idx = relative_position_index(wh, ww)
        bias = bias_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # heads, n, n

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=trunc_normal_init())(x)
        if os.environ.get("NEOSR_QKV_LAYOUT", "bnhd") == "bnhd":
            # DEFAULT (round 5): transpose-free — the packed Dense output
            # is [q|k|v] along the feature dim (the reference's qkv
            # chunking), so a split + head reshape is layout-preserving
            # and the head dim rides the einsum batch spec instead of a
            # materialized 5-D transpose.  Measured +20.5% on the
            # swinir_medium b8 train step (50.27 -> 60.58 p/s/chip,
            # BENCH_NOTES round 5); bhnd kept as the kill-switch.
            q, k, v = (a.reshape(b_, n, self.num_heads, head_dim)
                       for a in jnp.split(qkv, 3, axis=-1))
            out = window_attention(q, k, v, bias=bias, mask=mask,
                                   scale=self.qk_scale, layout="bnhd")
            out = out.reshape(b_, n, c)
        else:
            qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
            qkv = qkv.transpose(2, 0, 3, 1, 4)  # 3, B_, heads, n, d
            q, k, v = qkv[0], qkv[1], qkv[2]
            out = window_attention(q, k, v, bias=bias, mask=mask,
                                   scale=self.qk_scale)
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=trunc_normal_init())(out)


class SwinBlock(nn.Module):
    """One Swin transformer block on NHWC features."""

    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

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
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, win, shift))
        else:
            mask = None

        windows = window_partition(x, win)
        attn = WindowAttention(
            self.dim, (win, win), self.num_heads, self.qkv_bias,
            self.qk_scale, dtype=self.dtype,
        )(windows, mask)
        x = window_reverse(attn, win, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))

        x = shortcut + DropPath(self.drop_path)(x, deterministic=deterministic)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, drop=self.drop,
                dtype=self.dtype)(y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)
