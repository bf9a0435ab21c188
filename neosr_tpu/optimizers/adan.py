"""Adan (Adaptive Nesterov momentum) optimizer as an optax transform.

Capability parity with /root/reference/neosr/optimizers/adan.py:10-351 (the
reference's pure-torch foreach implementation): three moment EMAs with betas
(0.98, 0.92, 0.99), bias correction, decoupled "proximal" weight decay
p <- (p - lr*u) / (1 + lr*wd).  Written against the Adan paper (Xie et al.,
2022), not translated; optax-style pytree transform so it composes with
clipping, accumulation and schedule-free wrapping.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from neosr_tpu.utils.registry import OPTIMIZER_REGISTRY


class ScaleByAdanState(NamedTuple):
    count: chex.Array
    m: optax.Updates       # EMA of gradients
    v: optax.Updates       # EMA of gradient differences
    n: optax.Updates       # EMA of squared (g + (1-b2) * diff)
    prev_grad: optax.Updates


def scale_by_adan(
    b1: float = 0.98,
    b2: float = 0.92,
    b3: float = 0.99,
    eps: float = 1e-8,
    use_m: bool = True,
) -> optax.GradientTransformation:
    """Core Adan preconditioner (no lr, no weight decay).

    `use_m=False` drops the first-moment EMA — used by the schedule-free
    variant, where iterate averaging replaces momentum.
    """

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdanState(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree.map(jnp.zeros_like, params) if use_m else None,
            v=jax.tree.map(jnp.zeros_like, params),
            n=zeros,
            prev_grad=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        is_first = count == 1
        # diff_k = g_k - g_{k-1}; zero on the first step
        diff = jax.tree.map(
            lambda g, pg: jnp.where(is_first, jnp.zeros_like(g), g - pg),
            updates, state.prev_grad,
        )
        if use_m:
            m = jax.tree.map(lambda mm, g: (1 - b1) * mm + b1 * g, state.m, updates)
        else:
            m = None
        v = jax.tree.map(lambda vv, d: (1 - b2) * vv + b2 * d, state.v, diff)
        n = jax.tree.map(
            lambda nn, g, d: (1 - b3) * nn + b3 * (g + (1 - b2) * d) ** 2,
            state.n, updates, diff,
        )

        cf = count.astype(jnp.float32)
        bc1 = 1.0 - (1.0 - b1) ** cf
        bc2 = 1.0 - (1.0 - b2) ** cf
        bc3 = 1.0 - (1.0 - b3) ** cf

        def precond(nn):
            return jnp.sqrt(nn / bc3) + eps

        if use_m:
            out = jax.tree.map(
                lambda mm, vv, nn: (mm / bc1 + (1 - b2) * vv / bc2) / precond(nn),
                m, v, n,
            )
        else:
            out = jax.tree.map(
                lambda g, vv, nn: (g + (1 - b2) * vv / bc2) / precond(nn),
                updates, v, n,
            )
        new_state = ScaleByAdanState(count=count, m=m, v=v, n=n, prev_grad=updates)
        return out, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def _proximal_weight_decay(weight_decay: float, learning_rate) -> optax.GradientTransformation:
    """Adan's decoupled decay p <- (p - lr*u)/(1 + lr*wd), expressed as an
    additive update: u' = u + p*(1 - 1/(1+lr*wd))/lr  (then scaled by -lr)."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("proximal weight decay requires params")
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        denom = 1.0 + lr * weight_decay
        # final param update is p_new = (p - lr*u)/denom
        #                            = p - lr*(u/denom + p*wd/denom)
        new_updates = jax.tree.map(
            lambda u, p: u / denom + p * (weight_decay / denom), updates, params
        )
        return new_updates, optax.ScaleByScheduleState(count=count)

    return optax.GradientTransformation(init_fn, update_fn)


@OPTIMIZER_REGISTRY.register()
def adan(
    lr: float | optax.Schedule = 1e-3,
    betas: tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
    **kwargs,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(scale_by_adan(b1, b2, b3, eps))
    if weight_decay:
        chain.append(_proximal_weight_decay(weight_decay, lr))
    chain.append(
        optax.scale_by_learning_rate(lr)  # handles schedules, applies -lr
    )
    return optax.chain(*chain)
