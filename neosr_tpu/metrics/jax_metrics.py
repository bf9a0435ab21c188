"""On-device (jit-safe) PSNR / SSIM.

Same conventions as metrics/calculate.py (0-255 range, MATLAB SSIM window)
so device numbers track the numpy parity versions to ~1e-4; used in the fast
validation path to keep metric math on the TPU.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from neosr_tpu.utils.color_util import rgb2ycbcr_jnp


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def _maybe_y(img: jnp.ndarray, test_y_channel: bool) -> jnp.ndarray:
    if test_y_channel:
        return rgb2ycbcr_jnp(img / 255.0, y_only=True) * 255.0
    return img


@functools.partial(jax.jit, static_argnames=("crop_border", "test_y_channel"))
def psnr_jnp(
    img: jnp.ndarray,
    img2: jnp.ndarray,
    crop_border: int = 4,
    test_y_channel: bool = False,
) -> jnp.ndarray:
    """img, img2: HWC float in [0,255]."""
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, :]
    img = _maybe_y(img.astype(jnp.float32), test_y_channel)
    img2 = _maybe_y(img2.astype(jnp.float32), test_y_channel)
    mse = jnp.mean((img - img2) ** 2)
    return 10.0 * jnp.log10(255.0**2 / jnp.maximum(mse, 1e-12))


@functools.partial(jax.jit, static_argnames=("crop_border", "test_y_channel"))
def ssim_jnp(
    img: jnp.ndarray,
    img2: jnp.ndarray,
    crop_border: int = 4,
    test_y_channel: bool = False,
) -> jnp.ndarray:
    """MATLAB-equivalent SSIM on device. img, img2: HWC float [0,255]."""
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, :]
    img = _maybe_y(img.astype(jnp.float32), test_y_channel)
    img2 = _maybe_y(img2.astype(jnp.float32), test_y_channel)

    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    window = jnp.asarray(_gaussian_window(), dtype=jnp.float32)
    # depthwise 'valid' conv: HWC -> NHWC with C as channels
    x = img[None]
    y = img2[None]
    c = x.shape[-1]
    kern = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # HWIO, grouped

    def dwconv(z):
        return jax.lax.conv_general_dilated(
            z, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu1 = dwconv(x)
    mu2 = dwconv(y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = dwconv(x * x) - mu1_sq
    sigma2_sq = dwconv(y * y) - mu2_sq
    sigma12 = dwconv(x * y) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
