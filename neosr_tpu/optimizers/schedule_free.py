"""Schedule-free optimizer variants (Adan-SF, AdamW-SF).

Capability parity with /root/reference/neosr/optimizers/adan_sf.py:10-330 and
adamw_sf.py: Defazio et al.'s schedule-free method — the optimizer keeps a
fast z-iterate and an averaged x-iterate; gradients are evaluated at
y = (1-b1)*z + b1*x and evaluation/checkpointing uses x.  Here this is
optax.contrib.schedule_free wrapped around a momentum-free core, which makes
the train/eval mode switch an explicit pure function
(`eval_params(opt_state, params)`) instead of the reference's stateful
.train()/.eval() toggling (adan_sf.py:112-136).
"""

from __future__ import annotations

from typing import Optional

import optax
import optax.contrib

from neosr_tpu.optimizers.adan import _proximal_weight_decay, scale_by_adan
from neosr_tpu.utils.registry import OPTIMIZER_REGISTRY


def _sf_learning_rate(lr: float, warmup_steps: Optional[int]):
    if warmup_steps:
        return optax.linear_schedule(0.0, lr, warmup_steps)
    return lr


@OPTIMIZER_REGISTRY.register()
def adan_sf(
    lr: float = 1e-3,
    betas: tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    warmup_steps: Optional[int] = None,
    schedule_free: bool = True,  # accepted for config compatibility
    **kwargs,
) -> optax.GradientTransformation:
    """Schedule-Free Adan: adan core without first-moment EMA (iterate
    averaging takes its role), b1 of the schedule-free interpolation taken
    from betas[0]."""
    del schedule_free
    b1, b2, b3 = betas
    learning_rate = _sf_learning_rate(lr, warmup_steps)
    # the base optimizer handed to optax's schedule_free must produce the
    # FULL signed step (z = z + base_updates), so lr scaling lives here
    chain = [scale_by_adan(b1, b2, b3, eps, use_m=False)]
    if weight_decay:
        chain.append(_proximal_weight_decay(weight_decay, learning_rate))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    base = optax.chain(*chain)
    return optax.contrib.schedule_free(base, learning_rate=learning_rate, b1=b1)


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


def sf_eval_params(opt_state, params):
    """Return the averaged (x) iterate for validation / checkpointing.

    If the optimizer isn't schedule-free, returns params unchanged.
    """
    try:
        return optax.contrib.schedule_free_eval_params(opt_state, params)
    except Exception:
        return params


def is_schedule_free(opt_state) -> bool:
    import jax

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
