"""HiT-SR (hit_srf) — hierarchical transformer with expanding windows.

Behavioral parity with /root/reference/neosr/archs/hitsrf_arch.py:16-1157:
per-depth window sizes grow by hier_win_ratios [0.5,1,2,4,6,8] over the base
window; SCC splits DFE-projected features into q/v halves and combines
spatial self-correlation (q against base-window-pooled v via a learnable
spatial linear + dynamic position bias averaged over expansion groups) with
single-head channel self-correlation; post-norm residuals, ConvFFN.  Presets
hit_srf / hit_srf_medium / hit_srf_large.  NHWC flax.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, DropPath, Upsample, lrelu, pixel_shuffle
from neosr_tpu.archs.atd import ConvFFN
from neosr_tpu.archs.dat import DynamicPosBias, rect_rel_coords, rect_window_partition, rect_window_reverse
from neosr_tpu.utils.registry import ARCH_REGISTRY


class DFE(nn.Module):
    """Dual feature extraction: conv branch gated by linear branch."""

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, H, W, C)
        c = x.shape[-1]
        h = lrelu(Conv2d(c // 5, 1, padding=0, dtype=self.dtype)(x))
        h = lrelu(Conv2d(c // 5, 3, dtype=self.dtype)(h))
        h = Conv2d(self.out_features, 1, padding=0, dtype=self.dtype)(h)
        lin = Conv2d(self.out_features, 1, padding=0, dtype=self.dtype)(x)
        return h * lin


class SCC(nn.Module):
    dim: int
    base_win: tuple[int, int]
    window: tuple[int, int]
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, H, W, C), H,W multiples of window
        b, H, W, C = x.shape
        wh, ww = self.window
        bh = min(wh, self.base_win[0])
        bw = min(ww, self.base_win[1])
        heads = self.num_heads
        hd = C // (2 * heads)

        qv = DFE(C, self.dtype)(x)
        windows = rect_window_partition(qv, wh, ww)  # (B_, L, C)
        b_, L, _ = windows.shape
        qv = windows.reshape(b_, L, 2, heads, hd).transpose(2, 0, 3, 1, 4)
        q, v = qv[0], qv[1]  # (B_, heads, L, hd)

        # ---- spatial self-correlation
        ratio = L // (bh * bw)
        v_sp = v.reshape(b_, heads, bh, wh // bh, bw, ww // bw, hd)
        v_sp = v_sp.transpose(0, 1, 2, 4, 6, 3, 5).reshape(b_, heads, bh * bw, hd, ratio)
        v_sp = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                        name="spatial_linear")(v_sp)[..., 0]  # (B_, heads, bh*bw, hd)

        corr = jnp.einsum("bhld,bhmd->bhlm", q, v_sp,
                          preferred_element_type=jnp.float32) / float(hd)

        biases, idx = rect_rel_coords(wh, ww)
        # reference passes dim//4 and DynamicPosBias divides by 4 again
        # (hitsrf_arch.py:193,266) -> hidden width = dim // 16
        pos = DynamicPosBias(max(self.dim // 16, 1), heads, self.dtype)(
            jnp.asarray(biases))
        bias = pos[idx.reshape(-1)].reshape(L, L, heads)
        bias = bias.reshape(L, bh, wh // bh, bw, ww // bw, heads)
        bias = bias.transpose(0, 1, 3, 5, 2, 4).reshape(L, bh * bw, heads, -1)
        bias = bias.mean(-1).transpose(2, 0, 1)  # heads, L, bh*bw
        corr = corr + bias[None]

        x_spatial = jnp.einsum("bhlm,bhmd->bhld", corr.astype(v_sp.dtype), v_sp)
        x_spatial = x_spatial.transpose(0, 2, 1, 3).reshape(b_, L, C // 2)
        x_spatial = rect_window_reverse(x_spatial, wh, ww, H, W)

        # ---- channel self-correlation (single head)
        qc = q.transpose(0, 2, 1, 3).reshape(b_, L, heads * hd)
        vc = v.transpose(0, 2, 1, 3).reshape(b_, L, heads * hd)
        cmap = jnp.einsum("bld,ble->bde", qc, vc,
                          preferred_element_type=jnp.float32) / float(L)
        x_channel = jnp.einsum("bde,ble->bld", cmap.astype(vc.dtype), vc)
        x_channel = rect_window_reverse(x_channel, wh, ww, H, W)

        out = jnp.concatenate([x_spatial, x_channel], axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(out)


class HierarchicalBlock(nn.Module):
    dim: int
    num_heads: int
    base_win: tuple[int, int]
    window: tuple[int, int]
    mlp_ratio: float
    drop_path: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (b, H, W, C)
        b, h, w, c = x.shape
        wh = min(self.window[0], h)
        ww = min(self.window[1], w)
        pad_h = (-h) % wh
        pad_w = (-w) % ww

        shortcut = x
        xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect") \
            if (pad_h or pad_w) else x
        y = SCC(self.dim, self.base_win, (wh, ww), self.num_heads, self.dtype)(xp)
        y = y[:, :h, :w, :]
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y)  # post-norm
        x = shortcut + DropPath(self.drop_path)(y, deterministic=deterministic)

        z = ConvFFN(int(self.dim * self.mlp_ratio), self.dim, 5, self.dtype)(x)
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(z)
        return x + DropPath(self.drop_path)(z, deterministic=deterministic)


@ARCH_REGISTRY.register()
class hit_srf(nn.Module):
    in_chans: int = 3
    embed_dim: int = 60
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    base_win_size: Sequence[int] = (8, 8)
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.0
    patch_norm: bool = True
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "pixelshuffledirect"
    resi_connection: str = "1conv"
    hier_win_ratios: Sequence[float] = (0.5, 1, 2, 4, 6, 8)
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        num_feat = 64
        mean = jnp.asarray((0.5,) * 3, x.dtype) if self.in_chans == 3 else 0.0
        x = (x - mean) * self.img_range

        win_hs = [int(self.base_win_size[0] * r) for r in self.hier_win_ratios]
        win_ws = [int(self.base_win_size[1] * r) for r in self.hier_win_ratios]

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype)(x)
        h = feat
        if self.patch_norm:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for gi, depth in enumerate(self.depths):
            res = h
            for i in range(depth):
                blk = HierarchicalBlock(
                    self.embed_dim, self.num_heads[gi],
                    tuple(self.base_win_size),
                    (win_hs[i % len(win_hs)], win_ws[i % len(win_ws)]),
                    self.mlp_ratio, float(dpr[cur + i]), self.dtype,
                )
                if self.use_checkpoint:  # remat (reference hitsrf_arch.py flag)
                    h = nn.remat(HierarchicalBlock.__call__, static_argnums=(2,))(blk, h, deterministic)
                else:
                    h = blk(h, deterministic)
            cur += depth
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
def hit_srf_medium(**kwargs):
    kwargs.setdefault("upscale", 4)
    return hit_srf(embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
                   base_win_size=(16, 16), **kwargs)


@ARCH_REGISTRY.register()
def hit_srf_large(**kwargs):
    kwargs.setdefault("upscale", 4)
    return hit_srf(embed_dim=180, depths=(6,) * 12, num_heads=(6,) * 12,
                   base_win_size=(24, 24), **kwargs)
