"""Color-space conversions (BT.601 YCbCr), numpy + jax variants.

Behavioral counterpart of /root/reference/neosr/utils/color_util.py (rgb2ycbcr
etc.): identical BT.601 coefficients and the MATLAB-style [16,235] luma range,
so Y-channel PSNR/SSIM match the reference's numbers exactly.  The jnp
variants run inside jit for on-device validation.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# BT.601 full->studio swing coefficients (MATLAB rgb2ycbcr convention)
_Y_COEF = np.array([65.481, 128.553, 24.966], dtype=np.float64)
_CB_COEF = np.array([-37.797, -74.203, 112.0], dtype=np.float64)
_CR_COEF = np.array([112.0, -93.786, -18.214], dtype=np.float64)


def rgb2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """HWC RGB float32 [0,1] -> YCbCr float32 [0,1] (or Y only)."""
    img = img.astype(np.float64)
    if y_only:
        out = img @ _Y_COEF + 16.0
        out = out[..., None]
    else:
        mat = np.stack([_Y_COEF, _CB_COEF, _CR_COEF], axis=1)
        out = img @ mat + np.array([16.0, 128.0, 128.0])
    return (out / 255.0).astype(np.float32)


def bgr2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    return rgb2ycbcr(img[..., ::-1], y_only=y_only)


def rgb2ycbcr_jnp(img: jnp.ndarray, y_only: bool = True) -> jnp.ndarray:
    """NHWC RGB [0,1] -> YCbCr [0,1] on device (float32)."""
    img = img.astype(jnp.float32)
    y_coef = jnp.asarray(_Y_COEF, dtype=jnp.float32)
    if y_only:
        out = img @ y_coef + 16.0
        out = out[..., None]
    else:
        mat = jnp.asarray(
            np.stack([_Y_COEF, _CB_COEF, _CR_COEF], axis=1), dtype=jnp.float32
        )
        out = img @ mat + jnp.asarray([16.0, 128.0, 128.0], dtype=jnp.float32)
    return out / 255.0


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    """HWC YCbCr float32 [0,1] -> RGB float32 [0,1] (BT.601 inverse)."""
    img = img.astype(np.float64) * 255.0
    mat = np.linalg.inv(np.stack([_Y_COEF, _CB_COEF, _CR_COEF], axis=1))
    out = (img - np.array([16.0, 128.0, 128.0])) @ mat
    return out.astype(np.float32)
