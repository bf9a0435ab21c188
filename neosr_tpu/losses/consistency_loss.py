"""Color / luma consistency loss (Oklab chroma + CIELAB L*).

Behavioral parity with /root/reference/neosr/losses/consistency_loss.py:14-192:
sRGB linearization, Oklab chroma (a,b) shifted by +0.5 and clamped, CIE L*
luma (with the reference's exact piecewise formula), optional 21x3 Gaussian
blur on the luma path, optional cosine-similarity term gated below 1e-3
(expressed as a jnp.where so it stays jit-able), saturation/brightness
targets.  NHWC.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from neosr_tpu.losses.basic_loss import chc_loss, l1_loss
from neosr_tpu.utils.registry import LOSS_REGISTRY


def _gaussian_blur_kernel(ksize: int = 21, sigma: float = 3.0) -> np.ndarray:
    x = np.arange(ksize) - ksize // 2
    w = np.exp(-0.5 * (x / sigma) ** 2)
    w /= w.sum()
    return np.outer(w, w).astype(np.float32)


def _blur(x: jnp.ndarray, kern2d: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    pad = kern2d.shape[0] // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kern = jnp.tile(kern2d[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        xp, kern, (1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def lin_rgb(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        img <= 0.04045, img / 12.92, jnp.power(jnp.abs(img + 0.055) / 1.055, 2.4)
    )


def rgb_to_oklab_chroma(img: jnp.ndarray) -> jnp.ndarray:
    """NHWC RGB [0,1] -> (N,H,W,2) Oklab (a,b)."""
    img = lin_rgb(img)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    l = 0.4122214708 * r + 0.5363325363 * g + 0.0514459929 * b
    m = 0.2119034982 * r + 0.6806995451 * g + 0.1073969566 * b
    s = 0.0883024619 * r + 0.2817188376 * g + 0.6299787005 * b
    cbrt = lambda t: jnp.sign(t) * jnp.abs(t) ** (1 / 3)
    l_, m_, s_ = cbrt(l), cbrt(m), cbrt(s)
    a = 1.9779984951 * l_ - 2.4285922050 * m_ + 0.4505937099 * s_
    b2 = 0.0259040371 * l_ + 0.7827717662 * m_ - 0.8086757660 * s_
    return jnp.stack([a, b2], axis=-1)


def rgb_to_l_star(img: jnp.ndarray) -> jnp.ndarray:
    """NHWC RGB [0,1] -> (N,H,W) L* in [0,1] (reference's exact piecewise)."""
    img = lin_rgb(img)
    y = img @ jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)
    out = jnp.where(
        y <= (216 / 24389),
        y * (y * (24389 / 27)),
        jnp.sign(y) * jnp.abs(y) ** (1 / 3) * 116 - 16,
    )
    return jnp.clip(out / 100.0, 0.0, 1.0)


def _cosim(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    eps = 1e-20
    dot = jnp.sum(a * b, axis=axis)
    norm = jnp.maximum(
        jnp.linalg.norm(a, axis=axis) * jnp.linalg.norm(b, axis=axis), eps
    )
    return jnp.mean(1.0 - dot / norm)


@LOSS_REGISTRY.register()
@dataclass
class consistency_loss:
    criterion: str = "chc"
    blur: bool = True
    cosim: bool = True
    saturation: float = 1.0
    brightness: float = 1.0
    loss_weight: float = 1.0

    def __post_init__(self) -> None:
        if self.criterion == "l1":
            self._crit = l1_loss
        elif self.criterion == "chc":
            self._crit = chc_loss(loss_lambda=0, clip_min=0, clip_max=1)
        else:
            msg = f"{self.criterion} criterion has not been supported."
            raise NotImplementedError(msg)
        self._blur_kernel = _gaussian_blur_kernel(21, 3.0) if self.blur else None

    def __call__(self, net_output: jnp.ndarray, gt: jnp.ndarray, **kwargs) -> jnp.ndarray:
        net_output = jnp.clip(net_output.astype(jnp.float32), 1 / 255, 1.0)
        gt = jnp.clip(gt.astype(jnp.float32), 1 / 255, 1.0)

        if self.blur:
            kern = jnp.asarray(self._blur_kernel)
            no_b = jnp.clip(_blur(net_output, kern), 0, 1)
            gt_b = jnp.clip(_blur(gt, kern), 0, 1)
            input_luma = rgb_to_l_star(no_b)
            target_luma = rgb_to_l_star(gt_b) * self.brightness
        else:
            input_luma = rgb_to_l_star(net_output)
            target_luma = rgb_to_l_star(gt) * self.brightness

        input_chroma = jnp.clip(rgb_to_oklab_chroma(net_output) + 0.5, 0, 1)
        target_chroma = jnp.clip(
            rgb_to_oklab_chroma(gt) * self.saturation + 0.5, 0, 1
        )

        loss = self._crit(input_luma, target_luma) + self._crit(
            input_chroma, target_chroma
        )

        if self.cosim:
            # reference computes CosineSimilarity over torch dim=1:
            # chroma -> channel axis; luma (N,H,W) -> H axis
            cos_c = _cosim(input_chroma, target_chroma, axis=-1)
            cos_l = _cosim(input_luma, target_luma, axis=1)
            cos = 0.5 * cos_c + 0.5 * cos_l
            loss = loss + jnp.where(cos < 1e-3, cos, 0.0)

        return loss * self.loss_weight
