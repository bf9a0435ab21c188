"""MAN — Multi-scale Attention Network.

Behavioral parity with /root/reference/neosr/archs/man_arch.py:12-247:
grouped large-kernel attention at 3 scales (depthwise k + dilated depthwise
+ 1x1) gating parallel depthwise paths, simple gated block (SGAB), LKAT
tail per group, pixel-shuffle head.  NHWC flax; depthwise convs map to
feature_group_count.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from neosr_tpu.archs.arch_util import Conv2d, gelu, pixel_shuffle
from neosr_tpu.utils.registry import ARCH_REGISTRY


def _dwconv(x, k: int, dilation: int = 1, dtype=jnp.float32, name=None):
    c = x.shape[-1]
    pad = (k // 2) * dilation
    return nn.Conv(
        c, (k, k), feature_group_count=c, kernel_dilation=(dilation, dilation),
        padding=((pad, pad), (pad, pad)), dtype=dtype, param_dtype=jnp.float32,
        name=name,
    )(x)


class ChannelScale(nn.Module):
    """Learnable per-channel scale initialized at zero."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.zeros_init(), (x.shape[-1],))
        return x * scale.astype(x.dtype)


class SGAB(nn.Module):
    n_feats: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = Conv2d(self.n_feats * 2, 1, padding=0, dtype=self.dtype)(x)
        a, x = jnp.split(x, 2, axis=-1)
        x = x * _dwconv(a, 7, dtype=self.dtype)
        x = Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(x)
        return ChannelScale()(x) + shortcut


class GroupGLKA(nn.Module):
    n_feats: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = Conv2d(self.n_feats * 2, 1, padding=0, dtype=self.dtype)(x)
        a, x = jnp.split(x, 2, axis=-1)
        a1, a2, a3 = jnp.split(a, 3, axis=-1)

        def lka(t, k1, k2, d):
            t = _dwconv(t, k1, dtype=self.dtype)
            t = _dwconv(t, k2, dilation=d, dtype=self.dtype)
            return Conv2d(t.shape[-1], 1, padding=0, dtype=self.dtype)(t)

        att = jnp.concatenate(
            [
                lka(a1, 3, 5, 2) * _dwconv(a1, 3, dtype=self.dtype),
                lka(a2, 5, 7, 3) * _dwconv(a2, 5, dtype=self.dtype),
                lka(a3, 7, 9, 4) * _dwconv(a3, 7, dtype=self.dtype),
            ],
            axis=-1,
        )
        out = Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(x * att)
        return ChannelScale()(out) + shortcut


class LKAT(nn.Module):
    n_feats: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = gelu(Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(x))
        att = _dwconv(x, 7, dtype=self.dtype)
        att = _dwconv(att, 9, dilation=3, dtype=self.dtype)
        att = Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(att)
        return Conv2d(self.n_feats, 1, padding=0, dtype=self.dtype)(x * att)


class ResGroup(nn.Module):
    n_resblocks: int
    n_feats: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = x
        for _ in range(self.n_resblocks):
            res = GroupGLKA(self.n_feats, self.dtype)(res)
            res = SGAB(self.n_feats, self.dtype)(res)
        return LKAT(self.n_feats, self.dtype)(res) + x


@ARCH_REGISTRY.register()
class man(nn.Module):
    n_resblocks: int = 36
    n_resgroups: int = 1
    n_colors: int = 3
    n_feats: int = 180
    scale: int = 4
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = Conv2d(self.n_feats, 3, dtype=self.dtype)(x)
        res = x
        for _ in range(self.n_resgroups):
            res = ResGroup(self.n_resblocks, self.n_feats, self.dtype)(res)
        if self.n_resgroups > 1:
            res = Conv2d(self.n_feats, 3, dtype=self.dtype)(res) + x
        res = Conv2d(self.n_colors * self.scale**2, 3, dtype=self.dtype)(res)
        return pixel_shuffle(res, self.scale)


@ARCH_REGISTRY.register()
def man_tiny(**kwargs):
    kwargs.setdefault("scale", kwargs.pop("upscale", 4))
    return man(n_resblocks=5, n_feats=48, **kwargs)


@ARCH_REGISTRY.register()
def man_light(**kwargs):
    kwargs.setdefault("scale", kwargs.pop("upscale", 4))
    return man(n_resblocks=24, n_feats=60, **kwargs)
