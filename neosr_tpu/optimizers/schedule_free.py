"""Schedule-free optimizer variants (Adan-SF, AdamW-SF).

`adan_sf` replicates the reference update math EXACTLY (trajectory-parity
tested against /root/reference/neosr/optimizers/adan_sf.py:139-330) — the
default optimizer in every reference train template.  Reference semantics:
the live params are the y-iterate; z is updated by PLAIN gradient descent
(z -= lr * g, adan_sf.py:321); m/diff/n Adan moments precondition the y
step; ckp1 = weight/weight_sum schedule-free averaging with
weight = step^r * lr_max^weight_lr_power; warmup scales lr linearly and lr
additionally carries sqrt(bias_correction3) (adan_sf.py:196).

The reference's stateful .train()/.eval() toggling (adan_sf.py:112-136)
becomes the explicit pure function `sf_eval_params(opt_state, params)`
returning x = lerp(y, z, 1 - 1/beta1).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax
import optax.contrib

from neosr_tpu.utils.registry import OPTIMIZER_REGISTRY


class AdanSFState(NamedTuple):
    """Reference adan_sf state (exp_avg/exp_avg_sq/exp_avg_diff/
    neg_pre_grad/z per leaf + scalar schedule bookkeeping)."""

    step: chex.Array
    m: optax.Updates
    n: optax.Updates
    diff: optax.Updates
    neg_pre: optax.Updates
    z: optax.Params
    lr_max: chex.Array
    weight_sum: chex.Array
    b1: chex.Array  # carried so eval_params can recover x without config


@OPTIMIZER_REGISTRY.register()
def adan_sf(
    lr: float = 1.6e-3,
    betas: tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-8,
    weight_decay: float = 0.02,
    max_grad_norm: float = 0.0,
    warmup_steps: int = 0,
    r: float = 0.0,
    weight_lr_power: float = 2.0,
    schedule_free: bool = True,  # accepted for config compatibility
    **kwargs,
) -> optax.GradientTransformation:
    """Schedule-Free Adan, exact reference math (adan_sf.py:263-330)."""
    del schedule_free
    b1, b2, b3 = betas

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdanSFState(
            step=jnp.zeros([], jnp.int32),
            m=zeros,
            n=jax.tree.map(jnp.zeros_like, params),
            diff=jax.tree.map(jnp.zeros_like, params),
            neg_pre=jax.tree.map(jnp.zeros_like, params),
            # real copy: z must not alias params (donation safety)
            z=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
            lr_max=jnp.zeros([], jnp.float32),
            weight_sum=jnp.zeros([], jnp.float32),
            b1=jnp.asarray(b1, jnp.float32),
        )

    def update_fn(grads, state, params):
        step = state.step + 1
        sf = step.astype(jnp.float32)
        bc1 = 1.0 - b1**sf
        bc2 = 1.0 - b2**sf
        bc3 = 1.0 - b3**sf

        if max_grad_norm > 0:
            gnorm = optax.global_norm(grads)
            clip = jnp.minimum(max_grad_norm / (gnorm + eps), 1.0)
            grads = jax.tree.map(lambda g: g * clip, grads)

        # the scheduled lr (warmup x sqrt(bc3), adan_sf.py:196) feeds ONLY
        # the ckp1 averaging weights; the actual parameter/z steps use the
        # RAW lr (the kwargs dict passes group["lr"], adan_sf.py:251)
        sched = jnp.where(sf < warmup_steps, sf / max(warmup_steps, 1), 1.0) \
            if warmup_steps else jnp.asarray(1.0)
        lr_sched = lr * sched * jnp.sqrt(bc3)
        lr_max = jnp.maximum(lr_sched, state.lr_max)
        weight = sf**r * lr_max**weight_lr_power
        weight_sum = state.weight_sum + weight
        ckp1 = jnp.where(weight_sum > 0, weight / weight_sum, 0.0)
        lr_t = lr

        # step 1 uses neg_pre = -g, i.e. a zero gradient difference
        # (adan_sf.py:226-228)
        neg_pre = jax.tree.map(
            lambda np_, g: jnp.where(step == 1, -g, np_), state.neg_pre, grads
        )
        diff_term = jax.tree.map(lambda np_, g: np_ + g, neg_pre, grads)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
        diff = jax.tree.map(lambda d, dt: b2 * d + (1 - b2) * dt,
                            state.diff, diff_term)
        u = jax.tree.map(lambda dt, g: b2 * dt + g, diff_term, grads)
        n = jax.tree.map(lambda n_, u_: b3 * n_ + (1 - b3) * u_ * u_, state.n, u)

        inv_bc3_sqrt = 1.0 / jnp.sqrt(bc3)
        step_size = lr_t * (bc1 * (1 - ckp1))
        step_size_diff = lr_t * (b2 / bc2 * (1 - ckp1))

        def new_param(p, z_, m_, d_, n_):
            denom = jnp.sqrt(n_) * inv_bc3_sqrt + eps
            pw = p * (1 - lr_t * weight_decay)
            pw = pw + ckp1 * (z_ - pw)
            return pw - step_size * (m_ / denom) - step_size_diff * (d_ / denom)

        new_p = jax.tree.map(new_param, params, state.z, m, diff, n)
        updates = jax.tree.map(lambda np_, p: (np_ - p).astype(p.dtype),
                               new_p, params)
        z = jax.tree.map(lambda z_, g: z_ - lr_t * g, state.z, grads)
        new_neg_pre = jax.tree.map(lambda g: -g, grads)
        return updates, AdanSFState(
            step=step, m=m, n=n, diff=diff, neg_pre=new_neg_pre, z=z,
            lr_max=lr_max, weight_sum=weight_sum, b1=state.b1,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adan_sf_eval_params(state: AdanSFState, params):
    """x-iterate from (y=params, z): x = y + (1 - 1/b1)(z - y)
    (adan_sf.py:112-123)."""
    w = 1.0 - 1.0 / state.b1
    return jax.tree.map(lambda p, z: p + w * (z - p), params, state.z)


@OPTIMIZER_REGISTRY.register()
def adamw_sf(
    lr: float = 8e-4,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    warmup_steps: Optional[int] = None,
    schedule_free: bool = True,
    **kwargs,
) -> optax.GradientTransformation:
    del schedule_free
    b1, b2 = betas[0], betas[1]
    return optax.contrib.schedule_free_adamw(
        learning_rate=lr,
        warmup_steps=warmup_steps,
        b1=b1,
        b2=b2,
        eps=eps,
        weight_decay=weight_decay,
    )


def _find_adan_sf(opt_state) -> AdanSFState | None:
    found = []

    def _check(s):
        if isinstance(s, AdanSFState):
            found.append(s)

    jax.tree.map(_check, opt_state,
                 is_leaf=lambda s: isinstance(s, AdanSFState))
    return found[0] if found else None


def _maybe_unflatten(fn, z, params):
    """Apply elementwise eval fn when the optimizer state is stored flat
    (optax.flatten / `fused` mode): ravel params, compute, unravel."""
    import jax.flatten_util

    flat, unravel = jax.flatten_util.ravel_pytree(params)
    return unravel(fn(flat, z.astype(flat.dtype)))


def sf_eval_params(opt_state, params):
    """Return the averaged (x) iterate for validation / checkpointing.

    If the optimizer isn't schedule-free, returns params unchanged.
    Handles both tree-shaped and flattened (`fused`) optimizer state.
    """
    sf = _find_adan_sf(opt_state)
    if sf is not None:
        z = sf.z
        if isinstance(z, jnp.ndarray) and z.ndim == 1 \
                and not isinstance(params, jnp.ndarray):
            w = 1.0 - 1.0 / sf.b1
            return _maybe_unflatten(lambda y, z_: y + w * (z_ - y), z, params)
        return adan_sf_eval_params(sf, params)
    try:
        return optax.contrib.schedule_free_eval_params(opt_state, params)
    except Exception:
        pass
    # optax ScheduleFreeState with flat z under optax.flatten
    found = []

    def _check(s):
        if isinstance(s, optax.contrib.ScheduleFreeState):
            found.append(s)

    jax.tree.map(_check, opt_state,
                 is_leaf=lambda s: isinstance(s, optax.contrib.ScheduleFreeState))
    if found:
        st = found[0]
        z = st.z
        if isinstance(z, jnp.ndarray) and z.ndim == 1 \
                and not isinstance(params, jnp.ndarray):
            return _maybe_unflatten(
                lambda y, z_: (y - (1.0 - st.b1) * z_) / st.b1, z, params)
    return params


def is_schedule_free(opt_state) -> bool:
    if _find_adan_sf(opt_state) is not None:
        return True
    found = False

    def _check(s):
        nonlocal found
        if isinstance(s, optax.contrib.ScheduleFreeState):
            found = True

    jax.tree.map(
        _check, opt_state,
        is_leaf=lambda s: isinstance(s, optax.contrib.ScheduleFreeState),
    )
    return found
