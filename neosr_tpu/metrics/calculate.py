"""PSNR / SSIM metrics.

Parity targets /root/reference/neosr/metrics/calculate.py:15-160: PSNR on
float64 in [0,255] with crop_border and optional BT.601 Y-channel; SSIM with
the MATLAB convention (11x11 Gaussian sigma 1.5, C1/C2 from K1=0.01/K2=0.03,
valid-region mean).  Numpy versions are the parity-grade reference; jnp
versions (metrics/jax_metrics.py) run inside jit for fast validation.
"""

from __future__ import annotations

import cv2
import numpy as np

from neosr_tpu.utils.color_util import rgb2ycbcr
from neosr_tpu.utils.registry import METRIC_REGISTRY


def _to_y_channel(img: np.ndarray) -> np.ndarray:
    """img: HWC RGB float [0,255] -> HW1 Y float [0,255]."""
    img = img.astype(np.float32) / 255.0
    img = rgb2ycbcr(img, y_only=True)
    return img * 255.0


def _prepare(img: np.ndarray, crop_border: int, test_y_channel: bool) -> np.ndarray:
    img = img.astype(np.float64)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel and img.ndim == 3 and img.shape[2] == 3:
        # already-grayscale (color="y" runs) passes through, matching the
        # reference's to_y_channel guard (metric_util.py:35-51)
        img = _to_y_channel(img)
    return img.astype(np.float64)


@METRIC_REGISTRY.register()
def calculate_psnr(
    img: np.ndarray,
    img2: np.ndarray,
    crop_border: int = 4,
    test_y_channel: bool = False,
    **kwargs,
) -> float:
    """PSNR between two HWC uint8/float images in [0,255]."""
    assert img.shape == img2.shape, f"Image shapes differ: {img.shape}, {img2.shape}."
    img = _prepare(np.asarray(img), crop_border, test_y_channel)
    img2 = _prepare(np.asarray(img2), crop_border, test_y_channel)
    mse = np.mean((img - img2) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def _ssim(img: np.ndarray, img2: np.ndarray) -> float:
    """Single-channel SSIM, MATLAB convention (valid region)."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return float(ssim_map.mean())


@METRIC_REGISTRY.register()
def calculate_ssim(
    img: np.ndarray,
    img2: np.ndarray,
    crop_border: int = 4,
    test_y_channel: bool = False,
    **kwargs,
) -> float:
    """SSIM between two HWC uint8/float images in [0,255] (mean over C)."""
    assert img.shape == img2.shape, f"Image shapes differ: {img.shape}, {img2.shape}."
    img = _prepare(np.asarray(img), crop_border, test_y_channel)
    img2 = _prepare(np.asarray(img2), crop_border, test_y_channel)
    ssims = [_ssim(img[..., i], img2[..., i]) for i in range(img.shape[2])]
    return float(np.array(ssims).mean())
