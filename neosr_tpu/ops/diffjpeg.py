"""Differentiable JPEG on device — DCT as 8x8 matmuls (MXU-friendly).

Capability parity with the reference's DiffJPEG
(/root/reference/neosr/utils/diffjpeg.py:43-555): RGB->YCbCr (JPEG
convention), 2x2 chroma subsampling, 8x8 block DCT, quantization with the
standard luminance/chrominance tables scaled by a per-sample quality factor
(quality_to_factor, diffjpeg.py:48-61), differentiable rounding
round(x)+(x-round(x))^3, then the inverse pipeline.  The 2D DCT/iDCT are
D @ X @ D^T contractions, so the whole op is a chain of small matmuls plus
elementwise work that XLA fuses; quality is a traced (B,) vector.
Input NHWC in [0,1]; H and W must be multiples of 16 (the OTF canvases are).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
).T  # the reference transposes the tables (diffjpeg.py:16-38); kept for
# bit-parity with models trained against it

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]],
    dtype=np.float32,
).T

# orthonormal DCT-II matrix (8x8)
_k = np.arange(8)
_n = np.arange(8)
_DCT = np.sqrt(2.0 / 8.0) * np.cos((2 * _n[None, :] + 1) * _k[:, None] * np.pi / 16.0)
_DCT[0, :] *= 1.0 / np.sqrt(2.0)
_DCT = _DCT.astype(np.float32)

_RGB2YCBCR = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    dtype=np.float32,
).T
_YCBCR_SHIFT = np.array([0.0, 128.0, 128.0], dtype=np.float32)
_YCBCR2RGB = np.linalg.inv(_RGB2YCBCR.T).T.astype(np.float32)


def diff_round(x: jnp.ndarray) -> jnp.ndarray:
    r = jnp.round(x)
    return r + (x - r) ** 3


def quality_to_factor(quality: jnp.ndarray) -> jnp.ndarray:
    q = jnp.asarray(quality, jnp.float32)
    return jnp.where(q < 50, 5000.0 / q, 200.0 - q * 2.0) / 100.0


def _to_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W) -> (B, H/8 * W/8, 8, 8)"""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, -1, 8, 8)


def _from_blocks(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def _dct2(blocks: jnp.ndarray) -> jnp.ndarray:
    d = jnp.asarray(_DCT)
    return jnp.einsum("ij,bnjk,lk->bnil", d, blocks, d, preferred_element_type=jnp.float32)


def _idct2(blocks: jnp.ndarray) -> jnp.ndarray:
    d = jnp.asarray(_DCT)
    return jnp.einsum("ji,bnjk,kl->bnil", d, blocks, d, preferred_element_type=jnp.float32)


def _channel_roundtrip(
    plane: jnp.ndarray, table: np.ndarray, factor: jnp.ndarray, rounding
) -> jnp.ndarray:
    """plane: (B,H,W) in [0,255]-ish; factor: (B,)"""
    h, w = plane.shape[1], plane.shape[2]
    blocks = _to_blocks(plane - 128.0)
    coeff = _dct2(blocks)
    qtab = jnp.asarray(table)[None, None] * factor[:, None, None, None]
    quant = rounding(coeff / qtab)
    deq = quant * qtab
    rec = _idct2(deq) + 128.0
    return _from_blocks(rec, h, w)


def diff_jpeg(
    x: jnp.ndarray,
    quality: jnp.ndarray,
    rounding=diff_round,
) -> jnp.ndarray:
    """JPEG round-trip.  x: NHWC RGB [0,1], H,W % 16 == 0; quality: (B,)."""
    b, h, w, c = x.shape
    assert h % 16 == 0 and w % 16 == 0, "diff_jpeg needs H,W multiples of 16"
    factor = quality_to_factor(quality)

    img = x.astype(jnp.float32) * 255.0
    ycbcr = img @ jnp.asarray(_RGB2YCBCR) + jnp.asarray(_YCBCR_SHIFT)
    y = ycbcr[..., 0]
    # 2x2 average chroma subsampling
    cb = ycbcr[..., 1].reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr = ycbcr[..., 2].reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    y_rec = _channel_roundtrip(y, Y_TABLE, factor, rounding)
    cb_rec = _channel_roundtrip(cb, C_TABLE, factor, rounding)
    cr_rec = _channel_roundtrip(cr, C_TABLE, factor, rounding)

    # chroma upsample (nearest repeat, matching the reference's repeat)
    cb_up = jnp.repeat(jnp.repeat(cb_rec, 2, axis=1), 2, axis=2)
    cr_up = jnp.repeat(jnp.repeat(cr_rec, 2, axis=1), 2, axis=2)

    ycbcr_rec = jnp.stack([y_rec, cb_up, cr_up], axis=-1) - jnp.asarray(_YCBCR_SHIFT)
    rgb = ycbcr_rec @ jnp.asarray(_YCBCR2RGB)
    return jnp.clip(rgb / 255.0, 0.0, 1.0)
