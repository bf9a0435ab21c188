"""Win/Win2-accelerated AdamW as an optax transform.

Capability parity with /root/reference/neosr/optimizers/adamw_win.py:10-300
(Win: "weight-decay-integrated Nesterov acceleration", Zhou et al.): the
conservative x-sequence, reckless y/z-sequences with stepsize multiples
(2.0, 8.0), and proximal weight decay.  Because Win rewrites the parameters
rather than emitting a gradient-shaped step, the transform computes the new
parameter directly and returns `p_new - p` as the update (the trainer applies
it with optax.apply_updates); no scale_by_learning_rate follows it.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from neosr_tpu.utils.registry import OPTIMIZER_REGISTRY


class AdamWWinState(NamedTuple):
    count: chex.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    x: optax.Updates
    y: optax.Updates | None


@OPTIMIZER_REGISTRY.register()
def adamw_win(
    lr: float = 1e-3,
    betas: tuple[float, float] = (0.9, 0.999),
    reckless_steps: tuple[float, float] = (2.0, 8.0),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.0,
    acceleration_mode: str = "win2",
    **kwargs,
) -> optax.GradientTransformation:
    b1, b2 = betas[0], betas[1]
    b3, b4 = reckless_steps[0], reckless_steps[1]
    use_win2 = acceleration_mode == "win2"
    use_win = "win" in acceleration_mode

    def lr_at(count):
        return lr(count) if callable(lr) else lr

    def init_fn(params):
        return AdamWWinState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree.map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            x=jax.tree.map(jnp.copy, params) if use_win else None,
            y=jax.tree.map(jnp.copy, params) if use_win2 else None,
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adamw_win requires params")
        count = state.count + 1
        cf = count.astype(jnp.float32)

        if max_grad_norm and max_grad_norm > 1e-8:
            gnorm = optax.global_norm(grads)
            clip = jnp.minimum(max_grad_norm / (gnorm + eps), 1.0)
            grads = jax.tree.map(lambda g: g * clip, grads)

        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state.exp_avg, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, state.exp_avg_sq, grads)
        bc1 = 1 - b1**cf
        bc2 = 1 - b2**cf

        def u_fn(mm, vv):
            denom = jnp.sqrt(vv) / jnp.sqrt(bc2) + eps
            return (mm / denom) / bc1

        update = jax.tree.map(u_fn, m, v)
        lr_x = lr_at(state.count)

        if not use_win:  # vanilla AdamW path
            new_p = jax.tree.map(
                lambda p, u: p * (1 - lr_x * weight_decay) - lr_x * u, params, update
            )
            steps = jax.tree.map(lambda np_, p: np_ - p, new_p, params)
            return steps, AdamWWinState(count, m, v, None, None)

        x = jax.tree.map(
            lambda xx, u: (xx - lr_x * u) / (1.0 + lr_x * weight_decay),
            state.x, update,
        )
        lr_y = b3 * lr_x
        gamma = 1.0 / (1.0 + lr_y / lr_x + lr_y * weight_decay)

        if not use_win2:
            new_p = jax.tree.map(
                lambda p, xx, u: gamma * p + (lr_y / lr_x) * gamma * xx - lr_y * gamma * u,
                params, x, update,
            )
            steps = jax.tree.map(lambda np_, p: np_ - p, new_p, params)
            return steps, AdamWWinState(count, m, v, x, None)

        y = jax.tree.map(
            lambda yy, xx, u: gamma * yy + (lr_y / lr_x) * gamma * xx - lr_y * gamma * u,
            state.y, x, update,
        )
        lr_z = b4 * lr_x
        gamma2 = 1.0 / (1.0 + lr_z / lr_x + lr_z / lr_y + lr_z * weight_decay)
        new_p = jax.tree.map(
            lambda p, u, xx, yy: (
                gamma2 * p - lr_z * gamma2 * u
                + (lr_z / lr_x) * gamma2 * xx + (lr_z / lr_y) * gamma2 * yy
            ),
            params, update, x, y,
        )
        steps = jax.tree.map(lambda np_, p: np_ - p, new_p, params)
        return steps, AdamWWinState(count, m, v, x, y)

    return optax.GradientTransformation(init_fn, update_fn)
