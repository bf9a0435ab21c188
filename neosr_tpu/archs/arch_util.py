"""Shared building blocks for the architecture zoo (flax.linen, NHWC).

TPU-native counterpart of /root/reference/neosr/archs/arch_util.py — but with
none of its import-time config parsing (net_opt, arch_util.py:12-27): the
upscale factor is passed explicitly by `build_network`.

Layout convention: every module takes and returns NHWC float arrays.  The
pixel (un)shuffle channel ordering matches torch's PixelShuffle so that
reference checkpoints can be ported weight-for-weight: torch's
output[n, c, h*r+i, w*r+j] = input[n, c*r*r + i*r + j, h, w] becomes, in
NHWC, last-dim index (c, i, j) row-major.
"""

from __future__ import annotations

import collections.abc
from itertools import repeat
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def to_2tuple(x: Any) -> tuple:
    if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
        return tuple(x)
    return tuple(repeat(x, 2))


# ---------------------------------------------------------------------------
# pixel shuffle / unshuffle (NHWC, torch-channel-order compatible)
# ---------------------------------------------------------------------------

def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC depth-to-space: (N,H,W,C*r^2) -> (N,H*r,W*r,C)."""
    if scale == 1:
        return x
    n, h, w, c = x.shape
    r = scale
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n h i w j oc
    return x.reshape(n, h * r, w * r, oc)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC space-to-depth: (N,H*r,W*r,C) -> (N,H,W,C*r^2)."""
    if scale == 1:
        return x
    n, hh, ww, c = x.shape
    r = scale
    h, w = hh // r, ww // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n h w c i j
    return x.reshape(n, h, w, c * r * r)


def nearest_upsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC nearest-neighbour integer upsample (repeat rows/cols)."""
    if scale == 1:
        return x
    return jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)


# M[a][t, dr]: tap t (HR offset t-1) of a 3x3 kernel applied after a
# nearest-x2 upsample lands on LR offset dr-1 for output-row phase a
# (floor((2i + a + t - 1) / 2) - i).  Phase 0 folds taps {0,+1} onto LR
# offset 0; phase 1 folds taps {-1,0} onto it.
_PHASE_MAP = [
    [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0]],
    [[0.0, 1.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
]


def phase_upconv2x(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                   dtype: Dtype) -> jnp.ndarray:
    """conv3x3(nearest_upsample(x, 2)) computed as ONE conv at LR.

    A 3x3 conv after a nearest-x2 upsample reads each LR pixel through at
    most a 2x2 LR neighbourhood per output phase, so the HR conv is exactly
    a 4-phase LR conv followed by depth-to-space: each phase kernel is a
    linear fold of the 3x3 taps (``_PHASE_MAP``), embedded in a 3x3 kernel
    with structural zeros so all four phases share one SAME-padded conv.
    Same parameters, same math (zero-pad boundary included) — but Cout
    grows 4x (64 -> 256 = full 128-lane MXU occupancy vs 50%), the conv
    runs on the LR grid, and the nearest_upsample data-formatting op
    disappears.  ESRGAN-tail lever for the esrgan_otf headline ("other
    convs" slice, BENCH_NOTES round-4 table).
    """
    m = jnp.asarray(_PHASE_MAP, kernel.dtype)
    k4 = jnp.einsum("atp,buq,tuio->pqioab", m, m, kernel)
    k4 = k4.reshape(3, 3, kernel.shape[2], kernel.shape[3] * 4)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k4.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + jnp.repeat(bias, 4).astype(y.dtype)
    return pixel_shuffle(y, 2)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU's default, which every reference
    arch uses (no approximate='tanh' anywhere in the reference zoo).
    jax.nn.gelu defaults to the tanh approximation, which costs ~3e-4 of
    forward-parity error."""
    return jax.nn.gelu(x, approximate=False)


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch PReLU semantics, init 0.25)."""

    num_parameters: int = 1
    init_value: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, self.init_value, jnp.float32),
            (self.num_parameters,),
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def make_activation(act_type: str, num_feat: int, dtype: Dtype = jnp.float32) -> Callable:
    if act_type == "relu":
        return jax.nn.relu
    if act_type == "prelu":
        return PReLU(num_parameters=num_feat, dtype=dtype)
    if act_type == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.1)
    if act_type == "gelu":
        return jax.nn.gelu
    if act_type == "silu":
        return jax.nn.silu
    msg = f"Unsupported activation: {act_type}"
    raise ValueError(msg)


def lrelu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=slope)


# ---------------------------------------------------------------------------
# conv helpers
# ---------------------------------------------------------------------------

def conv_kaiming_init(scale: float = 1.0):
    """He-normal (fan_in) initializer optionally scaled (residual blocks)."""
    base = jax.nn.initializers.he_normal(in_axis=(0, 1, 2), out_axis=3)

    def init(key, shape, dtype=jnp.float32):
        w = base(key, shape, dtype)
        return w * scale

    return init


def trunc_normal_init(std: float = 0.02):
    return jax.nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class Conv2d(nn.Module):
    """3x3-style conv with SAME padding by default, NHWC."""

    features: int
    kernel_size: int | tuple[int, int] = 3
    strides: int = 1
    padding: str | int | None = None
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Dtype = jnp.float32
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = to_2tuple(self.kernel_size)
        if self.padding is None:
            pad = ((ks[0] // 2, ks[0] // 2), (ks[1] // 2, ks[1] // 2))
        elif isinstance(self.padding, int):
            pad = ((self.padding, self.padding), (self.padding, self.padding))
        else:
            pad = self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=to_2tuple(self.strides),
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init or nn.initializers.lecun_normal(),
            bias_init=self.bias_init or nn.initializers.zeros_init(),
        )(x)


# ---------------------------------------------------------------------------
# regularization
# ---------------------------------------------------------------------------

class DropPath(nn.Module):
    """Stochastic depth per sample (reference arch_util.py:118-149)."""

    drop_prob: float = 0.0
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool | None = None) -> jnp.ndarray:
        deterministic = nn.merge_param("deterministic", self.deterministic, deterministic)
        if self.drop_prob == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, p=keep_prob, shape=shape)
        return jnp.where(mask, x / keep_prob, 0.0)


# ---------------------------------------------------------------------------
# upsampler heads (SwinIR-family skeleton, reference swinir_arch.py:768-812)
# ---------------------------------------------------------------------------

class Upsample(nn.Module):
    """Pixel-shuffle head: conv->ps(2) repeated for 2^n, or conv->ps(3)."""

    scale: int
    num_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.scale
        if (scale & (scale - 1)) == 0:  # power of two
            n_steps = scale.bit_length() - 1
            for _ in range(n_steps):
                x = Conv2d(4 * self.num_feat, 3, dtype=self.dtype)(x)
                x = pixel_shuffle(x, 2)
        elif scale == 3:
            x = Conv2d(9 * self.num_feat, 3, dtype=self.dtype)(x)
            x = pixel_shuffle(x, 3)
        else:
            msg = f"scale {scale} is not supported (2^n and 3 only)"
            raise ValueError(msg)
        return x


class UpsampleOneStep(nn.Module):
    """Single conv straight to C*scale^2 then pixel-shuffle (lightweight)."""

    scale: int
    num_out_ch: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv2d(self.num_out_ch * self.scale**2, 3, dtype=self.dtype)(x)
        return pixel_shuffle(x, self.scale)


class NearestConvUpsample(nn.Module):
    """nearest x2 + conv (+lrelu), repeated; the 'nearest+conv' head."""

    scale: int
    num_feat: int
    num_out_ch: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.scale in (1, 2, 4, 8)
        s = self.scale
        while s > 1:
            x = nearest_upsample(x, 2)
            x = lrelu(Conv2d(self.num_feat, 3, dtype=self.dtype)(x))
            s //= 2
        x = lrelu(Conv2d(self.num_feat, 3, dtype=self.dtype)(x))
        return Conv2d(self.num_out_ch, 3, dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# DySample dynamic upsampler (reference arch_util.py:30-115)
# ---------------------------------------------------------------------------

class DySample(nn.Module):
    """Content-aware dynamic upsampling ("DySample", 'lp' variant).

    Predicts per-pixel sampling offsets, then bilinearly gathers from the
    input — expressed with static shapes so it jits cleanly.
    """

    in_ch: int
    out_ch: int
    scale: int = 2
    groups: int = 4
    end_convolution: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        r = self.scale
        g = self.groups
        # offset prediction: 2 coords per group per subpixel position.
        # init parity with the reference (arch_util.py:62-64): offset
        # trunc-normal(0.02), scope zero and bias-free
        offset = Conv2d(2 * g * r * r, 1, dtype=self.dtype,
                        kernel_init=trunc_normal_init())(x)
        scope = Conv2d(2 * g * r * r, 1, use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros_init())(x)
        offset = offset * jax.nn.sigmoid(scope) * 0.5 + _init_pos(r, g)

        # offset: (n, h, w, 2*g*r^2) -> absolute sampling grid at HR res
        offset = offset.reshape(n, h, w, 2, g, r, r)
        offset = offset.transpose(0, 1, 5, 2, 6, 4, 3)  # n h r w r g 2
        offset = offset.reshape(n, h * r, w * r, g, 2)

        base_y = jnp.arange(h * r) // r
        base_x = jnp.arange(w * r) // r
        # component order (x, y) matches the torch layout (grid_sample
        # convention, reference arch_util.py:79-103) so imported offset-conv
        # weights keep their meaning
        grid_x = offset[..., 0] + base_x[None, None, :, None]
        grid_y = offset[..., 1] + base_y[None, :, None, None]

        # bilinear gather per group
        xg = x.reshape(n, h, w, g, c // g)
        out = _bilinear_gather(xg, grid_y, grid_x)
        out = out.reshape(n, h * r, w * r, c)
        if self.end_convolution:
            out = Conv2d(self.out_ch, 1, dtype=self.dtype)(out)
        return out


def _init_pos(scale: int, groups: int) -> jnp.ndarray:
    h = (jnp.arange(scale, dtype=jnp.float32) - (scale - 1) / 2) / scale
    gy, gx = jnp.meshgrid(h, h, indexing="ij")
    init = jnp.stack([gx, gy], axis=-1)  # (r, r, 2), (x, y) order
    init = jnp.tile(init[None, :, :, None, :], (1, 1, 1, groups, 1))  # 1 r r g 2
    # layout must match offset reshape above: (2, g, r, r) flattened
    init = init.transpose(0, 4, 3, 1, 2).reshape(1, 1, 1, -1)
    return init


def _bilinear_gather(
    xg: jnp.ndarray, grid_y: jnp.ndarray, grid_x: jnp.ndarray
) -> jnp.ndarray:
    """xg: (n,h,w,g,cg); grid_*: (n,H,W,g) absolute float coords in input."""
    n, h, w, g, cg = xg.shape
    gy = jnp.clip(grid_y, 0.0, h - 1.0)
    gx = jnp.clip(grid_x, 0.0, w - 1.0)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (gy - y0)[..., None]
    wx = (gx - x0)[..., None]

    def gather(yy, xx):
        # vmap over batch and group
        def per_ng(x_one, y_idx, x_idx):
            # x_one: (h, w, cg); y_idx/x_idx: (H, W)
            return x_one[y_idx, x_idx]
        return jax.vmap(  # over batch
            lambda xb, yb, xxb: jax.vmap(  # over group
                per_ng, in_axes=(2, 2, 2), out_axes=2
            )(xb, yb, xxb)
        )(xg, yy, xx)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
