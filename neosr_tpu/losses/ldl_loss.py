"""LDL loss (locally discriminative learning artifact map).

Behavioral parity with /root/reference/neosr/losses/ldl_loss.py:14-103: the
residual magnitude map's local 7x7 unbiased variance (reflect padding) times
the per-sample global variance^(1/5) weights both images before the
criterion.  The local variance is computed with box-filter convolutions
(E[x^2]-E[x]^2, Bessel-corrected) instead of unfold — same numbers, fused by
XLA.  NHWC.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from neosr_tpu.losses.basic_loss import chc_loss, huber_loss, l1_loss, mse_loss
from neosr_tpu.utils.registry import LOSS_REGISTRY


def _box_filter(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """VALID box sum over kxk windows, single channel NHWC."""
    kern = jnp.ones((k, k, 1, 1), jnp.float32)
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def local_variance(residual: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Unbiased local variance over ksize x ksize reflect-padded windows.

    residual: (N, H, W, 1) -> (N, H, W, 1)
    """
    pad = (ksize - 1) // 2
    rp = jnp.pad(residual, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    n = ksize * ksize
    s1 = _box_filter(rp, ksize)
    s2 = _box_filter(rp * rp, ksize)
    var = (s2 - s1 * s1 / n) / (n - 1)
    return jnp.maximum(var, 0.0)


@LOSS_REGISTRY.register()
@dataclass
class ldl_loss:
    criterion: str = "chc"
    loss_weight: float = 1.0
    ksize: int = 7

    def __post_init__(self) -> None:
        if self.criterion == "chc":
            self._crit = chc_loss(loss_lambda=0, clip_min=0, clip_max=1)
        elif self.criterion == "l1":
            self._crit = l1_loss
        elif self.criterion == "l2":
            self._crit = mse_loss
        elif self.criterion == "huber":
            self._crit = huber_loss
        else:
            msg = f"{self.criterion} criterion has not been supported."
            raise NotImplementedError(msg)

    def __call__(self, net_output: jnp.ndarray, gt: jnp.ndarray, **kwargs) -> jnp.ndarray:
        net_output = net_output.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        residual = jnp.sum(jnp.abs(gt - net_output), axis=-1, keepdims=True)
        patch_w = jnp.var(residual, axis=(1, 2, 3), keepdims=True, ddof=1) ** (1 / 5)
        pixel_w = local_variance(residual, self.ksize)
        overall = patch_w * pixel_w
        return self._crit(overall * net_output, overall * gt) * self.loss_weight
