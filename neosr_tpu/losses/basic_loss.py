"""Pixel losses: L1 / MSE / Huber / CHC.

Behavioral parity with /root/reference/neosr/losses/basic_loss.py:24-219
(including chc's clipped pseudo-Huber + cosine-similarity term with
clip_min/max defaults 1/255 and 254/255).  All losses here are pure-jnp
callables `loss(pred, target) -> scalar` over NHWC arrays, safe inside jit;
the cosine similarity runs over the channel axis (last in NHWC).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from neosr_tpu.utils.registry import LOSS_REGISTRY

_reduction_modes = ("none", "mean", "sum")


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def l1_loss(pred, target, reduction: str = "mean"):
    return _reduce(jnp.abs(pred - target), reduction)


def mse_loss(pred, target, reduction: str = "mean"):
    return _reduce((pred - target) ** 2, reduction)


def huber_loss(pred, target, reduction: str = "mean", delta: float = 1.0):
    err = pred - target
    abs_err = jnp.abs(err)
    quad = 0.5 * err**2
    lin = delta * (abs_err - 0.5 * delta)
    return _reduce(jnp.where(abs_err <= delta, quad, lin), reduction)


def _check_reduction(reduction: str) -> None:
    if reduction not in _reduction_modes:
        msg = f"Unsupported reduction mode: {reduction}. Supported: {_reduction_modes}"
        raise ValueError(msg)


@LOSS_REGISTRY.register()
@dataclass
class L1Loss:
    loss_weight: float = 1.0
    reduction: str = "mean"

    def __post_init__(self) -> None:
        _check_reduction(self.reduction)

    def __call__(self, pred, target, **kwargs):
        return self.loss_weight * l1_loss(pred, target, self.reduction)


@LOSS_REGISTRY.register()
@dataclass
class MSELoss:
    loss_weight: float = 1.0
    reduction: str = "mean"

    def __post_init__(self) -> None:
        _check_reduction(self.reduction)

    def __call__(self, pred, target, **kwargs):
        return self.loss_weight * mse_loss(pred, target, self.reduction)


@LOSS_REGISTRY.register()
@dataclass
class HuberLoss:
    loss_weight: float = 1.0
    reduction: str = "mean"
    delta: float = 1.0

    def __post_init__(self) -> None:
        _check_reduction(self.reduction)

    def __call__(self, pred, target, **kwargs):
        return self.loss_weight * huber_loss(pred, target, self.reduction, self.delta)


@LOSS_REGISTRY.register()
@dataclass
class chc_loss:
    """Clipped pseudo-Huber (Charbonnier) + cosine-similarity term."""

    loss_weight: float = 1.0
    reduction: str = "mean"
    criterion: str = "huber"
    loss_lambda: float = 0.0
    clip_min: float = 0.003921
    clip_max: float = 0.996078

    def __post_init__(self) -> None:
        _check_reduction(self.reduction)
        if self.criterion not in {"l1", "huber"}:
            msg = f"{self.criterion} not implemented."
            raise NotImplementedError(msg)

    def __call__(self, pred, target, **kwargs):
        # cosine similarity over channels (NHWC last axis)
        eps = 1e-20
        dot = jnp.sum(pred * target, axis=-1)
        norm = jnp.maximum(
            jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1), eps
        )
        cosine_term = jnp.mean(1.0 - dot / norm)

        if self.criterion == "l1":
            per_px = jnp.abs(pred - target)
        else:
            per_px = jnp.sqrt((pred - target) ** 2 + 1e-12)
        loss = jnp.mean(
            jnp.clip(per_px + self.loss_lambda * cosine_term, self.clip_min, self.clip_max)
        )
        return self.loss_weight * loss
