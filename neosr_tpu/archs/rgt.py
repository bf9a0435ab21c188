"""RGT — Recursive Generalization Transformer.

Behavioral parity with /root/reference/neosr/archs/rgt_arch.py:43-960:
alternating L_SA (dual rect-window attention with dynamic position bias +
depthwise LePE on v) and RG_SA (recursive 4x depthwise downsampling of the
feature map to build compressed K/V, cross-attention with CPE), spatial-gate
MLP, HAI layer-scale input residual per block.  Preset rgt_s (8 groups of 6 /
6 heads).  NHWC flax, sharing DAT's rect-window machinery.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, DropPath, gelu, lrelu, trunc_normal_init, Upsample
from neosr_tpu.archs.dat import (
    SGFN,
    SpatialAttentionBranch,
    rect_shift_mask,
)
from neosr_tpu.utils.registry import ARCH_REGISTRY


class L_SA(nn.Module):
    dim: int
    num_heads: int
    split_size: Sequence[int] = (8, 32)
    shift: bool = False
    qkv_bias: bool = True
    # craft reuses this block but passes attn_mask=(None, None) — its
    # shifted windows run UNMASKED (craft_arch.py forward_features)
    use_mask: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, H, W, C)
        b, h, w, c = x.shape
        s0, s1 = self.split_size[0], self.split_size[1]
        sh, sw = s0 // 2, s1 // 2
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=trunc_normal_init())(x)
        v_img = qkv[..., 2 * c :]

        ms = max(s0, s1)
        pad_b = (-h) % ms
        pad_r = (-w) % ms
        qkv_p = jnp.pad(qkv, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        half = c // 2

        def split_qkv(t, lo, hi):
            return jnp.concatenate(
                [t[..., lo:hi], t[..., c + lo : c + hi], t[..., 2 * c + lo : 2 * c + hi]],
                axis=-1,
            )

        qkv0 = split_qkv(qkv_p, 0, half)
        qkv1 = split_qkv(qkv_p, half, c)

        if self.shift and min(hp, wp) > ms:
            qkv0 = jnp.roll(qkv0, (-sh, -sw), axis=(1, 2))
            qkv1 = jnp.roll(qkv1, (-sw, -sh), axis=(1, 2))
            m0 = jnp.asarray(rect_shift_mask(hp, wp, s0, s1, sh, sw)) \
                if self.use_mask else None
            m1 = jnp.asarray(rect_shift_mask(hp, wp, s1, s0, sw, sh)) \
                if self.use_mask else None
            x0 = SpatialAttentionBranch(half, s0, s1, self.num_heads // 2,
                                        None, self.dtype)(qkv0, m0)
            x1 = SpatialAttentionBranch(half, s1, s0, self.num_heads // 2,
                                        None, self.dtype)(qkv1, m1)
            x0 = jnp.roll(x0, (sh, sw), axis=(1, 2))
            x1 = jnp.roll(x1, (sw, sh), axis=(1, 2))
        else:
            x0 = SpatialAttentionBranch(half, s0, s1, self.num_heads // 2,
                                        None, self.dtype)(qkv0)
            x1 = SpatialAttentionBranch(half, s1, s0, self.num_heads // 2,
                                        None, self.dtype)(qkv1)
        attened = jnp.concatenate([x0, x1], axis=-1)[:, :h, :w, :]

        lcm = nn.Conv(c, (3, 3), feature_group_count=c, padding=1,
                      dtype=self.dtype, param_dtype=jnp.float32)(v_img)
        out = attened + lcm
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=trunc_normal_init())(out)


class RG_SA(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    c_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (b, H, W, C)
        b, h, w, c = x.shape
        cr = int(c * self.c_ratio)
        d_cr = cr // self.num_heads
        d = c // self.num_heads
        scale = (d * self.c_ratio) ** -0.5

        # recursive 4x reduction with ONE shared conv applied _time times
        # (rgt_arch.py RG_SA.forward); train rule log4(H//4), eval rule
        # max(log4(H//16), 2) — eval reduces more for large inputs
        if deterministic:
            _time = max(int(math.log(max(h // 16, 1), 4)),
                        int(math.log(max(w // 16, 1), 4)), 2)
        else:
            _time = max(int(math.log(max(h // 4, 1), 4)),
                        int(math.log(max(w // 4, 1), 4)))
        reduction = nn.Conv(c, (4, 4), (4, 4), feature_group_count=c,
                            padding="VALID", dtype=self.dtype,
                            param_dtype=jnp.float32)
        red = x
        applied = 0
        for _ in range(_time):
            if min(red.shape[1], red.shape[2]) < 4:
                break  # degenerate tiny input: stop before an empty map
            red = reduction(red)
            applied += 1
        if applied == 0:
            # keep the reduction params in the tree (torch always has them)
            # regardless of input size / train-eval _time; XLA DCEs the call
            _ = reduction(jnp.zeros((1, 4, 4, c), x.dtype))
        red = nn.Conv(c, (3, 3), feature_group_count=c, padding=1,
                      dtype=self.dtype, param_dtype=jnp.float32)(red)
        red = Conv2d(cr, 1, padding=0, dtype=self.dtype)(red)
        hr, wr = red.shape[1], red.shape[2]
        red_tokens = red.reshape(b, hr * wr, cr)
        red_tokens = gelu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(red_tokens))

        n = h * w
        tokens = x.reshape(b, n, c)
        q = nn.Dense(cr, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32)(tokens)
        k = nn.Dense(cr, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32)(red_tokens)
        v = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32)(red_tokens)

        qh = q.reshape(b, n, self.num_heads, d_cr).transpose(0, 2, 1, 3)
        kh = k.reshape(b, -1, self.num_heads, d_cr).transpose(0, 2, 1, 3)
        vh = v.reshape(b, -1, self.num_heads, d).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)

        # CPE on v
        v_img = vh.transpose(0, 2, 1, 3).reshape(b, hr, wr, c)
        cpe = nn.Conv(c, (3, 3), feature_group_count=c, padding=1,
                      dtype=self.dtype, param_dtype=jnp.float32)(v_img)
        vh = vh + cpe.reshape(b, -1, self.num_heads, d).transpose(0, 2, 1, 3)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(out)


class RGTBlock(nn.Module):
    dim: int
    num_heads: int
    split_size: Sequence[int]
    mlp_ratio: float
    qkv_bias: bool
    c_ratio: float
    drop_path: float
    rg_idx: int
    b_idx: int
    layerscale_value: float = 1e-4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        rg, bi = self.rg_idx, self.b_idx
        res = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if bi % 2 == 0:
            shift = (rg % 2 == 0 and bi > 0 and (bi - 2) % 4 == 0) or (
                rg % 2 != 0 and bi % 4 == 0
            )
            attn = L_SA(self.dim, self.num_heads, self.split_size, shift,
                        self.qkv_bias, self.dtype)(h)
        else:
            attn = RG_SA(self.dim, self.num_heads, self.qkv_bias,
                         self.c_ratio, self.dtype)(h, deterministic)
        x = x + DropPath(self.drop_path)(attn, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = SGFN(self.dim, int(self.dim * self.mlp_ratio), self.dtype)(y)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        gamma = self.param(
            "gamma", lambda key, s: jnp.full(s, self.layerscale_value, jnp.float32),
            (self.dim,),
        )
        return x + res * gamma.astype(x.dtype)


@ARCH_REGISTRY.register()
class rgt(nn.Module):
    in_chans: int = 3
    embed_dim: int = 180
    depth: Sequence[int] = (6,) * 8
    num_heads: Sequence[int] = (6,) * 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    upscale: int = 4
    img_range: float = 1.0
    resi_connection: str = "1conv"
    split_size: Sequence[int] = (8, 32)
    c_ratio: float = 0.5
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
                h = RGTBlock(
                    self.embed_dim, self.num_heads[rg_idx], self.split_size,
                    self.mlp_ratio, self.qkv_bias, self.c_ratio,
                    float(dpr[cur + i]), rg_idx, i, dtype=self.dtype,
                )(h, deterministic)
            cur += depth
            h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h) + res
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h) + feat

        h = lrelu(Conv2d(num_feat, 3, dtype=self.dtype)(h), slope=0.01)  # torch default slope (conv_before_upsample)
        h = Upsample(self.upscale, num_feat, dtype=self.dtype)(h)
        out = Conv2d(self.in_chans, 3, dtype=self.dtype)(h)
        return out / self.img_range + mean


@ARCH_REGISTRY.register()
def rgt_s(**kwargs):
    kwargs.setdefault("upscale", 4)
    return rgt(depth=(6,) * 6, num_heads=(6,) * 6, **kwargs)
