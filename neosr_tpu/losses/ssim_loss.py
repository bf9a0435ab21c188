"""Multi-scale SSIM loss (1 - msssim).

Behavioral parity with /root/reference/neosr/losses/ssim_loss.py:66-163:
depthwise 11x11 sigma-1.5 Gaussian, 5 scales with the standard MS-SSIM
weights, avg-pool downsampling with odd-size zero padding, fp32 math (the
reference forces fp32 under AMP; here the loss simply computes in fp32).
NHWC.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from neosr_tpu.utils.registry import LOSS_REGISTRY

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(window_size: int, sigma: float) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    w = np.exp(-0.5 * x**2 / (sigma * sigma))
    w /= w.sum()
    return np.outer(w, w).astype(np.float32)


def _dwconv(x: jnp.ndarray, kern2d: jnp.ndarray, padding: int) -> jnp.ndarray:
    c = x.shape[-1]
    kern = jnp.tile(kern2d[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _avg_pool2(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """torch F.avg_pool2d(k=2,s=2,padding=p) equivalent (zeros included)."""
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    n, h, w, c = x.shape
    x = x[:, : h - h % 2, : w - w % 2, :]
    x = x.reshape(n, x.shape[1] // 2, 2, x.shape[2] // 2, 2, c)
    return x.mean(axis=(2, 4))


@LOSS_REGISTRY.register()
@dataclass
class mssim_loss:
    window_size: int = 11
    in_channels: int = 3
    sigma: float = 1.5
    K1: float = 0.01
    K2: float = 0.03
    L: int = 1
    padding: int | None = None
    loss_weight: float = 1.0
    _kernel: np.ndarray = field(init=False, repr=False)

    def __post_init__(self) -> None:
        if self.window_size % 2 != 1:
            msg = "Window size must be odd."
            raise ValueError(msg)
        self._kernel = _gaussian_kernel(self.window_size, self.sigma)
        self.C1 = (self.K1 * self.L) ** 2
        self.C2 = (self.K2 * self.L) ** 2

    def _ssim(self, x, y, kern, pad):
        mu_x = _dwconv(x, kern, pad)
        mu_y = _dwconv(y, kern, pad)
        sigma2_x = _dwconv(x * x, kern, pad) - mu_x * mu_x
        sigma2_y = _dwconv(y * y, kern, pad) - mu_y * mu_y
        sigma_xy = _dwconv(x * y, kern, pad) - mu_x * mu_y
        a1 = 2 * mu_x * mu_y + self.C1
        a2 = 2 * sigma_xy + self.C2
        b1 = mu_x**2 + mu_y**2 + self.C1
        b2 = sigma2_x + sigma2_y + self.C2
        l1 = a1 / b1
        cs = a2 / b2
        return l1 * cs, cs

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, **kwargs) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)
        kern = jnp.asarray(self._kernel)
        pad = self.padding if self.padding is not None else self.window_size // 2

        msssim = jnp.ones([], jnp.float32)
        for i, w in enumerate(_MS_WEIGHTS):
            ssim, cs = self._ssim(x, y, kern, pad)
            ssim_m = jnp.maximum(ssim.mean(), 1e-8)
            cs_m = jnp.maximum(cs.mean(), 1e-8)
            if i == len(_MS_WEIGHTS) - 1:
                msssim = msssim * ssim_m**w
            else:
                msssim = msssim * cs_m**w
                pad_h = x.shape[1] % 2
                pad_w = x.shape[2] % 2
                x = _avg_pool2(x, pad_h, pad_w)
                y = _avg_pool2(y, pad_h, pad_w)
        return self.loss_weight * (1.0 - msssim)
