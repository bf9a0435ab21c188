"""ATD — Adaptive Token Dictionary transformer.

Behavioral parity with /root/reference/neosr/archs/atd_arch.py:39-1237:
each layer combines shifted-window MSA (shared qkv), token-dictionary
cross-attention (ATD-CA with learnable temperature scale), adaptive
category-based MSA (AC-MSA: tokens sorted by dictionary category, grouped,
dense attention per group), a ConvFFN, and adaptive token refinement of the
per-block learnable dictionary.  The category sort/group is jnp.argsort +
take_along_axis with static shapes (TPU-friendly).  Presets atd (class
defaults) and atd_light (atd_arch.py:1223-1237).  NHWC flax.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, lrelu, pixel_shuffle, trunc_normal_init, Upsample
from neosr_tpu.archs.swin_util import (
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)
from neosr_tpu.utils.registry import ARCH_REGISTRY


class ConvFFN(nn.Module):
    hidden: int
    out: int
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (b, h, w, c)
        h = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=trunc_normal_init())(x)
        h = gelu(h)
        k = self.kernel_size
        dw = nn.Conv(self.hidden, (k, k), feature_group_count=self.hidden,
                     padding=(k - 1) // 2, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        h = h + gelu(dw)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=trunc_normal_init())(h)


class WindowAttentionQKV(nn.Module):
    """W-MSA over precomputed qkv windows with relative position bias."""

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

        table = self.param(
            "relative_position_bias_table", trunc_normal_init(),
            ((2 * win - 1) ** 2, self.num_heads),
        )
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
        # output projection (reference atd_arch.py:158,206 — WindowAttention
        # applies self.proj before returning)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=trunc_normal_init())(out)


class ATD_CA(nn.Module):
    """Token-dictionary cross-attention."""

    dim: int
    num_tokens: int
    reducted_dim: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, td):  # x: (b, n, c); td: (b, m, c)
        q = nn.Dense(self.reducted_dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        k = nn.Dense(self.reducted_dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32)(td)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32)(td)
        scale = self.param(
            "scale", lambda key, s: jnp.full(s, 0.5, jnp.float32),
            (self.num_tokens,),
        )
        qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bnr,bmr->bnm", qn, kn,
                          preferred_element_type=jnp.float32)
        attn = attn * (1.0 + jnp.clip(scale, 0, 1) * np.log(self.num_tokens))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn.astype(v.dtype), v)
        return out, attn


class AC_MSA(nn.Module):
    """Adaptive category-based MSA (sort by dictionary category, group)."""

    dim: int
    num_heads: int
    category_size: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qkv, sim):  # qkv: (b, n, 3c); sim: (b, n, m)
        b, n, c3 = qkv.shape
        c = c3 // 3
        gs = min(n, self.category_size)
        ng = (n + gs - 1) // gs
        pad_n = ng * gs - n

        tk_id = jnp.argmax(sim, axis=-1)
        order = jnp.argsort(tk_id, axis=-1, stable=True)
        inverse = jnp.argsort(order, axis=-1)
        shuffled = jnp.take_along_axis(qkv, order[..., None], axis=1)
        if pad_n:
            tail = jnp.flip(shuffled[:, n - pad_n : n, :], axis=1)
            shuffled = jnp.concatenate([shuffled, tail], axis=1)

        d = c // self.num_heads
        y = shuffled.reshape(b, ng, gs, 3, self.num_heads, d)
        y = y.transpose(3, 0, 1, 4, 2, 5)  # 3, b, ng, nh, gs, d
        q, k, v = y[0], y[1], y[2]

        logit_scale = self.param(
            "logit_scale",
            lambda key, s: jnp.full(s, np.log(10.0), jnp.float32), (1, 1),
        )
        ls = jnp.exp(jnp.minimum(logit_scale, np.log(1.0 / 0.01)))
        attn = jnp.einsum("bghnd,bghmd->bghnm", q, k,
                          preferred_element_type=jnp.float32) * ls
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bghnm,bghmd->bghnd", attn, v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, ng * gs, c)[:, :n, :]
        out = jnp.take_along_axis(out, inverse[..., None], axis=1)
        return nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                        param_dtype=jnp.float32)(out)


class InstanceNorm1dAffine(nn.Module):
    """torch InstanceNorm1d(num_tokens, affine=True) on (b, m, n)."""

    num_tokens: int

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        w = self.param("scale", nn.initializers.ones_init(), (self.num_tokens, 1))
        b = self.param("bias", nn.initializers.zeros_init(), (self.num_tokens, 1))
        return (x - mean) / jnp.sqrt(var + 1e-5) * w + b


class ATDTransformerLayer(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    category_size: int
    num_tokens: int
    reducted_dim: int
    convffn_kernel_size: int
    mlp_ratio: float
    qkv_bias: bool = True
    is_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, td):  # x: (b, h, w, c)
        b, h, w, c = x.shape
        win = self.window_size
        shift = self.shift_size
        if min(h, w) <= win:
            shift = 0
            win = min(h, w, win)
        n = h * w

        shortcut = x
        xl = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        tokens = xl.reshape(b, n, c)
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=trunc_normal_init())(tokens)

        # ATD-CA + AC-MSA on flattened tokens
        x_atd, sim_atd = ATD_CA(self.dim, self.num_tokens, self.reducted_dim,
                                self.qkv_bias, self.dtype)(tokens, td)
        x_aca = AC_MSA(self.dim, self.num_heads, self.category_size,
                       self.qkv_bias, self.dtype)(qkv, sim_atd)

        # SW-MSA on qkv reshaped to spatial
        qkv_sp = qkv.reshape(b, h, w, 3 * c)
        if shift > 0:
            qkv_sp = jnp.roll(qkv_sp, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, win, shift))
        else:
            mask = None
        qkv_windows = window_partition(qkv_sp, win)
        attn_windows = WindowAttentionQKV(self.dim, win, self.num_heads,
                                          self.dtype)(qkv_windows, mask)
        x_win = window_reverse(attn_windows, win, h, w)
        if shift > 0:
            x_win = jnp.roll(x_win, (shift, shift), axis=(1, 2))

        x = shortcut + x_win + (x_atd + x_aca).reshape(b, h, w, c)

        # ConvFFN
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = x + ConvFFN(int(self.dim * self.mlp_ratio), self.dim,
                        self.convffn_kernel_size, self.dtype)(y)

        # adaptive token refinement
        if not self.is_last:
            sigma = self.param("sigma", nn.initializers.zeros_init(),
                               (self.num_tokens, 1))
            mask_soft = jax.nn.softmax(
                InstanceNorm1dAffine(self.num_tokens)(
                    sim_atd.transpose(0, 2, 1).astype(jnp.float32)
                ), axis=-1,
            )
            s = jax.nn.sigmoid(sigma)
            td = s * td + (1 - s) * jnp.einsum(
                "btn,bnc->btc", mask_soft.astype(td.dtype), x.reshape(b, n, c)
            )
        return x, td


class ATDB(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    category_size: int
    num_tokens: int
    reducted_dim: int
    convffn_kernel_size: int
    mlp_ratio: float
    qkv_bias: bool = True
    resi_connection: str = "1conv"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        td0 = self.param("td", nn.initializers.normal(1.0),
                         (self.num_tokens, self.dim))
        td = jnp.broadcast_to(td0[None], (b, self.num_tokens, self.dim)).astype(x.dtype)
        res = x
        for i in range(self.depth):
            x, td = ATDTransformerLayer(
                self.dim, self.num_heads, self.window_size,
                0 if i % 2 == 0 else self.window_size // 2,
                self.category_size, self.num_tokens, self.reducted_dim,
                self.convffn_kernel_size, self.mlp_ratio, self.qkv_bias,
                is_last=(i == self.depth - 1), dtype=self.dtype,
            )(x, td)
        if self.resi_connection == "1conv":
            x = Conv2d(self.dim, 3, dtype=self.dtype)(x)
        else:
            x = lrelu(Conv2d(self.dim // 4, 3, dtype=self.dtype)(x))
            x = lrelu(Conv2d(self.dim // 4, 1, padding=0, dtype=self.dtype)(x))
            x = Conv2d(self.dim, 3, dtype=self.dtype)(x)
        return x + res


@ARCH_REGISTRY.register()
class atd(nn.Module):
    in_chans: int = 3
    embed_dim: int = 210
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 16
    category_size: int = 256
    num_tokens: int = 128
    reducted_dim: int = 20
    convffn_kernel_size: int = 5
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    patch_norm: bool = True
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    norm: bool = False  # rgb-mean normalization is OFF by default (atd_arch.py:938,946-951)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        num_feat = 64
        mean = jnp.asarray((0.5,) * 3, x.dtype) if self.in_chans == 3 else 0.0
        if self.norm:
            x = (x - mean) * self.img_range

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype)(x)
        h = feat
        if self.patch_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        for i, depth in enumerate(self.depths):
            h = ATDB(
                self.embed_dim, depth, self.num_heads[i], self.window_size,
                self.category_size, self.num_tokens, self.reducted_dim,
                self.convffn_kernel_size, self.mlp_ratio, self.qkv_bias,
                self.resi_connection, self.dtype,
            )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h) + feat

        if self.upsampler == "pixelshuffle":
            h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(h), slope=0.01)  # torch default slope (conv_before_upsample)
            h = Upsample(self.upscale, num_feat, dtype=self.dtype)(h)
            out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)
        elif self.upsampler == "pixelshuffledirect":
            h = Conv2d(self.in_chans * self.upscale**2, 3, dtype=self.dtype)(h)
            out = pixel_shuffle(h, self.upscale)
        else:
            out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)
        if self.norm:
            out = out / self.img_range + mean
        return out


@ARCH_REGISTRY.register()
def atd_light(**kwargs):
    kwargs.setdefault("upscale", 4)
    return atd(
        embed_dim=48, depths=(6, 6, 6, 6), num_heads=(4, 4, 4, 4),
        category_size=128, num_tokens=64, reducted_dim=8,
        convffn_kernel_size=7, mlp_ratio=1.0,
        upsampler="pixelshuffledirect", **kwargs,
    )
