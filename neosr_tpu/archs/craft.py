"""CRAFT — Cross-Refinement Adaptive Fusion Transformer.

Behavioral parity with /root/reference/neosr/archs/craft_arch.py:109-964:
CRFB groups run, per depth step, two SRWAB rect-window attention blocks
(dual H/V branches with dynamic position bias + LePE, shifted on odd
blocks) producing the "low" stream, an HFERB conv/max-pool block producing
the "high" stream, and an HFB hybrid fusion (channel cross-attention with
high as query) merging them; pixel-shuffle-direct tail.  NHWC flax; the
reference marks craft not ONNX-exportable (convert.py:91) — the StableHLO
path here handles it fine.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle
from neosr_tpu.archs.rgt import L_SA
from neosr_tpu.archs.swin_util import Mlp
from neosr_tpu.utils.registry import ARCH_REGISTRY


class SRWAB(nn.Module):
    """Shift rectangle window attention block."""

    dim: int
    num_heads: int
    split_size: Sequence[int]
    shift: bool
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (b, H, W, C)
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        attn = L_SA(self.dim, self.num_heads, self.split_size, self.shift,
                    True, use_mask=False, dtype=self.dtype)(h)
        x = shortcut + attn
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)(
            y, deterministic=deterministic)
        return x + y


class HFERB(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.dim // 2
        short = x
        lfe = gelu(Conv2d(mid, 3, dtype=self.dtype)(x[..., :mid]))
        hfe = jnp.pad(x[..., mid:], ((0, 0), (1, 1), (1, 1), (0, 0)),
                      constant_values=-jnp.inf)
        hfe = jax.lax.reduce_window(hfe, -jnp.inf, jax.lax.max,
                                    (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
        hfe = gelu(Conv2d(mid, 1, padding=0, dtype=self.dtype)(hfe))
        merged = jnp.concatenate([lfe, hfe], axis=-1)
        return short + Conv2d(self.dim, 1, padding=0, dtype=self.dtype)(merged)


class HFB(nn.Module):
    """Hybrid fusion: channel cross-attention, high-freq stream as query."""

    dim: int
    num_heads: int
    ffn_expansion: float = 2.66
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, low, high):
        b, h, w, c = low.shape
        d = c // self.num_heads
        n = h * w

        def norm(t):
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(t)

        ln = norm(low)
        q = Conv2d(c, 1, padding=0, use_bias=False, dtype=self.dtype)(high)
        q = nn.Conv(c, (3, 3), feature_group_count=c, padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(q)
        kv = Conv2d(c * 2, 1, padding=0, use_bias=False, dtype=self.dtype)(ln)
        kv = nn.Conv(c * 2, (3, 3), feature_group_count=c * 2, padding=1,
                     use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(kv)
        k, v = kv[..., :c], kv[..., c:]

        temperature = self.param("temperature", nn.initializers.ones_init(),
                                 (self.num_heads, 1, 1))

        def chan(t):
            return t.reshape(b, n, self.num_heads, d).transpose(0, 2, 3, 1)

        qh, kh, vh = chan(q), chan(k), chan(v)  # b, heads, d, n
        qh = qh / (jnp.linalg.norm(qh, axis=-1, keepdims=True) + 1e-12)
        kh = kh / (jnp.linalg.norm(kh, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("bhdn,bhen->bhde", qh, kh,
                          preferred_element_type=jnp.float32) * temperature
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhde,bhen->bhdn", attn, vh)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        out = Conv2d(c, 1, padding=0, use_bias=False, dtype=self.dtype)(out)
        x = low + out

        # gated dwconv FFN
        y = norm(x)
        hid = int(c * self.ffn_expansion)
        y = Conv2d(hid * 2, 1, padding=0, use_bias=False, dtype=self.dtype)(y)
        y = nn.Conv(hid * 2, (3, 3), feature_group_count=hid * 2, padding=1,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y1, y2 = jnp.split(y, 2, axis=-1)
        y = Conv2d(c, 1, padding=0, use_bias=False, dtype=self.dtype)(
            gelu(y1) * y2)
        return x + y


class CRFB(nn.Module):
    dim: int
    depth: int
    num_heads: int
    split_size: Sequence[int]
    mlp_ratio: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            low = SRWAB(self.dim, self.num_heads, self.split_size, False,
                        self.mlp_ratio, self.dtype)(x, deterministic)
            low = SRWAB(self.dim, self.num_heads, self.split_size, True,
                        self.mlp_ratio, self.dtype)(low, deterministic)
            high = HFERB(self.dim, self.dtype)(x)
            x = HFB(self.dim, self.num_heads, 2.66, self.dtype)(low, high)
        return x


@ARCH_REGISTRY.register()
class craft(nn.Module):
    in_chans: int = 3
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    split_size_0: int = 4
    split_size_1: int = 16
    window_size: int = 16
    mlp_ratio: float = 2.0
    upscale: int = 4
    img_range: float = 1.0
    resi_connection: str = "1conv"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        mean = jnp.asarray((0.5,) * 3, x.dtype) if self.in_chans == 3 else 0.0
        b, H0, W0, _ = x.shape
        # the reference ALWAYS symmetric-pads by (h//ws + 1)*ws - h — a full
        # extra window even when divisible (craft_arch.py forward) — via
        # flip-concat, i.e. edge-inclusive (symmetric) mirroring
        ws = self.window_size
        ph = (H0 // ws + 1) * ws - H0
        pw = (W0 // ws + 1) * ws - W0
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="symmetric")
        x = (x - mean) * self.img_range

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype)(x)
        h = feat
        for gi, depth in enumerate(self.depths):
            res = h
            h = CRFB(self.embed_dim, depth, self.num_heads[gi],
                     (self.split_size_0, self.split_size_1), self.mlp_ratio,
                     self.dtype)(h, deterministic)
            if self.resi_connection == "1conv":
                h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h)
            h = h + res
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        # x = conv_after_body(features) + conv_first-out (craft_arch.py)
        h = Conv2d(self.embed_dim, 3, dtype=self.dtype)(h) + feat
        h = Conv2d(self.in_chans * self.upscale**2, 3, dtype=self.dtype)(h)
        out = pixel_shuffle(h, self.upscale)
        out = out / self.img_range + mean
        return out[:, : H0 * self.upscale, : W0 * self.upscale, :]
