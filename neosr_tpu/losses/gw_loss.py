"""Gradient-weighted loss.

Capability parity with /root/reference/neosr/losses/gw_loss.py:14-107
(4-direction Sobel difference maps modulating an element-wise reduction).
Note: the reference accidentally reassigns its 45/135-degree kernels to the
0/90 kernels (gw_loss.py:61-62), making "4-direction" really 2-direction.
The default replicates that behavior exactly (parity-tested); pass
``fixed_kernels=True`` for the four genuine directions.
NHWC; the gradient maps are computed on the channel-mean (luma-ish) image.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from neosr_tpu.losses.basic_loss import chc_loss, huber_loss, l1_loss, mse_loss
from neosr_tpu.utils.registry import LOSS_REGISTRY

_SOBEL = {
    "0": np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32),
    "90": np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32),
    "45": np.array([[-2, -1, 0], [-1, 0, 1], [0, 1, 2]], np.float32),
    "135": np.array([[0, -1, -2], [1, 0, -1], [2, 1, 0]], np.float32),
}


def _sobel_conv(x: jnp.ndarray, kern2d: np.ndarray) -> jnp.ndarray:
    kern = jnp.asarray(kern2d)[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@LOSS_REGISTRY.register()
@dataclass
class gw_loss:
    corner: bool = True
    criterion: str | None = None
    loss_weight: float = 1.0
    # False (default) replicates the reference's kernel aliasing
    # (45 deg -> 0 deg, 135 deg -> 90 deg, gw_loss.py:61-62)
    fixed_kernels: bool = False

    def __post_init__(self) -> None:
        crits = {"l1": l1_loss, "l2": mse_loss, "huber": huber_loss}
        if self.criterion is None:
            self._crit = None
        elif self.criterion == "chc":
            self._crit = chc_loss()
        elif self.criterion in crits:
            self._crit = crits[self.criterion]
        else:
            msg = f"{self.criterion} criterion has not been supported."
            raise NotImplementedError(msg)

    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, **kwargs) -> jnp.ndarray:
        x1 = x1.astype(jnp.float32)
        x2 = x2.astype(jnp.float32)
        y1 = x1.mean(axis=-1, keepdims=True)
        y2 = x2.mean(axis=-1, keepdims=True)

        kernels = dict(_SOBEL)
        if not self.fixed_kernels:
            kernels["45"] = _SOBEL["0"]
            kernels["135"] = _SOBEL["90"]
        diffs = {
            k: jnp.abs(_sobel_conv(y1, kern) - _sobel_conv(y2, kern))
            for k, kern in kernels.items()
        }

        if self._crit is not None:
            reduction = self._crit(x1, x2)
        else:
            reduction = jnp.abs(x1 - x2)

        if self.corner:
            loss = reduction
            for d in diffs.values():
                loss = loss * (1.0 + 4.0 * d)
        else:
            d = jnp.max(jnp.concatenate(list(diffs.values()), axis=-1), axis=-1, keepdims=True)
            loss = (1.0 + 4.0 * d) * reduction
        return jnp.mean(loss) * self.loss_weight
