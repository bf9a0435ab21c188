"""Resize as sampling-matrix matmuls — the TPU-native random-resize.

The reference's OTF pipeline resizes by *continuous random factors* with
torch F.interpolate in 'area' / 'bilinear' / 'bicubic' modes
(/root/reference/neosr/models/otf.py:111-126, 165-186), which under jit
would mean a recompile per output shape.  Here a resize is two dense
sampling matrices (out_h x in_h) @ image @ (in_w x out_w): the matrices are
computed from *traced* scales/method codes with broadcasted iota, so one
compiled graph covers every scale, and the contraction runs on the MXU.

Semantics match torch exactly:
* bilinear / bicubic: half-pixel centers, NO antialiasing (F.interpolate
  default), out-of-range taps folded onto the edge columns (coordinate
  clamp / replicate padding);
* area: adaptive average pooling (integer cell boundaries).

A traced `valid` size supports canvas-based pipelines: the signal occupies
slots [0, valid) of a larger static canvas, and the matrices mask/fold at
the traced boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# method codes for traced dispatch
AREA, BILINEAR, BICUBIC = 0, 1, 2
METHOD_CODES = {"area": AREA, "bilinear": BILINEAR, "bicubic": BICUBIC}

_FOLD_TAPS = 3  # >= cubic one-sided support (2) + 1


def _k_linear(d: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _k_cubic(d: jnp.ndarray) -> jnp.ndarray:
    """Keys cubic, a=-0.75 (cv2/torch bicubic convention)."""
    a = -0.75
    at = jnp.abs(d)
    at2, at3 = at * at, at * at * at
    w1 = (a + 2) * at3 - (a + 3) * at2 + 1
    w2 = a * at3 - 5 * a * at2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, w1, jnp.where(at < 2, w2, 0.0))


def _interp_matrix(
    in_size: int,
    out_size: int,
    in_valid: jnp.ndarray,
    out_valid: jnp.ndarray,
    kernel,
) -> jnp.ndarray:
    """Interpolating-kernel matrix with edge folding (torch coordinate clamp)."""
    scale = in_valid / out_valid
    j = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 0)
    i = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 1)
    center = (j + 0.5) * scale - 0.5
    d = i - center
    w = kernel(d)
    fold_r = sum(kernel(d + m) for m in range(1, _FOLD_TAPS + 1))
    fold_l = sum(kernel(d - m) for m in range(1, _FOLD_TAPS + 1))
    w = (
        w * (i < in_valid)
        + fold_r * (i == in_valid - 1)
        + fold_l * (i == 0)
    )
    return w * (j < out_valid)


def _area_matrix(
    in_size: int,
    out_size: int,
    in_valid: jnp.ndarray,
    out_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Adaptive-average-pool matrix (torch mode='area')."""
    j = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 0)
    i = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 1)
    start = jnp.floor(j * in_valid / out_valid)
    end = jnp.ceil((j + 1) * in_valid / out_valid)
    end = jnp.minimum(end, in_valid)
    end = jnp.maximum(end, start + 1)
    w = ((i >= start) & (i < end)).astype(jnp.float32) / (end - start)
    return w * (j < out_valid)


def canvas_resize_matrix(
    in_size: int,
    out_size: int,
    in_valid: jnp.ndarray,
    out_valid: jnp.ndarray,
    method: jnp.ndarray,
) -> jnp.ndarray:
    """(out_size, in_size) matrix resampling canvas slots [0, in_valid) into
    canvas slots [0, out_valid).  in/out_valid and method may be traced."""
    in_valid = jnp.asarray(in_valid, jnp.float32)
    out_valid = jnp.maximum(jnp.asarray(out_valid, jnp.float32), 1.0)
    return jax.lax.switch(
        jnp.clip(method, 0, 2),
        [
            lambda: _area_matrix(in_size, out_size, in_valid, out_valid),
            lambda: _interp_matrix(in_size, out_size, in_valid, out_valid, _k_linear),
            lambda: _interp_matrix(in_size, out_size, in_valid, out_valid, _k_cubic),
        ],
    )


def apply_matrices(x: jnp.ndarray, wh: jnp.ndarray, ww: jnp.ndarray) -> jnp.ndarray:
    """(oh,ih) and (ow,iw) matrices applied to NHWC x -> (n,oh,ow,c)."""
    y = jnp.einsum("oi,niwc->nowc", wh, x, preferred_element_type=jnp.float32)
    return jnp.einsum("oj,nhjc->nhoc", ww, y, preferred_element_type=jnp.float32)


def canvas_resize(
    x: jnp.ndarray,
    in_valid_h: jnp.ndarray,
    in_valid_w: jnp.ndarray,
    out_size_h: int,
    out_size_w: int,
    scale: jnp.ndarray,
    method: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Resize the valid region of an NHWC canvas by traced `scale` into a new
    canvas.  Returns (canvas, valid_h, valid_w)."""
    # torch F.interpolate(scale_factor=s) floors the output size
    vh = jnp.clip(jnp.floor(in_valid_h * scale), 1, out_size_h)
    vw = jnp.clip(jnp.floor(in_valid_w * scale), 1, out_size_w)
    wh = canvas_resize_matrix(x.shape[1], out_size_h, in_valid_h, vh, method)
    ww = canvas_resize_matrix(x.shape[2], out_size_w, in_valid_w, vw, method)
    return apply_matrices(x, wh, ww), vh, vw


def canvas_resize_to(
    x: jnp.ndarray,
    in_valid_h: jnp.ndarray,
    in_valid_w: jnp.ndarray,
    out_h: int,
    out_w: int,
    method: jnp.ndarray,
) -> jnp.ndarray:
    """Resize the valid region to exactly (out_h, out_w), filling the output."""
    wh = canvas_resize_matrix(x.shape[1], out_h, in_valid_h, float(out_h), method)
    ww = canvas_resize_matrix(x.shape[2], out_w, in_valid_w, float(out_w), method)
    return apply_matrices(x, wh, ww)


def aa_matrix(in_size: int, out_size: int, method: str = "bicubic") -> jnp.ndarray:
    """Static ANTIALIASED resize matrix (torch antialias=True semantics)."""
    kernel = _k_cubic if method == "bicubic" else _k_linear
    scale = in_size / out_size
    fs = max(scale, 1.0)
    j = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 0)
    i = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 1)
    center = (j + 0.5) * scale - 0.5
    w = kernel((i - center) / fs)
    return w / jnp.sum(w, axis=1, keepdims=True)


def resize_antialias(
    x: jnp.ndarray, out_h: int, out_w: int, method: str = "bicubic"
) -> jnp.ndarray:
    """Antialiased static resize (torch F.interpolate(antialias=True))."""
    wh = aa_matrix(x.shape[1], out_h, method)
    ww = aa_matrix(x.shape[2], out_w, method)
    return apply_matrices(x, wh, ww)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "method"))
def resize(x: jnp.ndarray, out_h: int, out_w: int, method: str = "bicubic") -> jnp.ndarray:
    """Plain static resize of an NHWC batch (torch F.interpolate parity)."""
    code = jnp.asarray(METHOD_CODES[method], jnp.int32)
    return canvas_resize_to(
        x, jnp.asarray(float(x.shape[1])), jnp.asarray(float(x.shape[2])),
        out_h, out_w, code,
    )
