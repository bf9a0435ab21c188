"""Optimizer + scheduler factory.

Replaces the reference's optimizer suite (/root/reference/neosr/optimizers/
and models/base.py:151-198): registry-dispatched optax transforms.  Stock
torch Adam/AdamW/NAdam map to their optax equivalents; custom optimizers
(adan, adan_sf, adamw_sf, adamw_win) are implemented in this package.
Schedulers (MultiStepLR / CosineAnnealingLR + linear warmup,
models/base.py:174-254) become optax schedules folded into the lr.
"""

from __future__ import annotations

from typing import Any

import optax

import neosr_tpu.optimizers.adan  # noqa: F401
import neosr_tpu.optimizers.adamw_win  # noqa: F401
import neosr_tpu.optimizers.schedule_free  # noqa: F401
from neosr_tpu.optimizers.schedule_free import is_schedule_free, sf_eval_params
from neosr_tpu.utils.registry import OPTIMIZER_REGISTRY

__all__ = [
    "build_optimizer",
    "build_scheduler",
    "is_schedule_free",
    "sf_eval_params",
]


def build_scheduler(
    scheduler_opt: dict[str, Any] | None,
    base_lr: float,
    total_iter: int,
    warmup_iter: int = -1,
) -> float | optax.Schedule:
    """Build the lr schedule (or return the constant lr)."""
    if scheduler_opt:
        sched_type = scheduler_opt.get("type", "").lower()
        if sched_type in {"multisteplr", "multistep"}:
            milestones = scheduler_opt.get("milestones", [])
            gamma = scheduler_opt.get("gamma", 0.5)
            boundaries = {int(m): gamma for m in milestones}
            schedule = optax.piecewise_constant_schedule(base_lr, boundaries)
        elif sched_type in {"cosineannealing", "cosineannealinglr"}:
            t_max = scheduler_opt.get("T_max", total_iter)
            eta_min = scheduler_opt.get("eta_min", 0.0)
            schedule = optax.cosine_decay_schedule(
                base_lr, t_max, alpha=eta_min / max(base_lr, 1e-30)
            )
        else:
            msg = f"Scheduler {scheduler_opt.get('type')} is not implemented."
            raise NotImplementedError(msg)
    else:
        schedule = None

    if warmup_iter and warmup_iter > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_iter)
        if schedule is None:
            return optax.join_schedules([warm, lambda c: base_lr], [warmup_iter])
        return optax.join_schedules([warm, schedule], [warmup_iter])
    return schedule if schedule is not None else base_lr


def build_optimizer(
    optim_opt: dict[str, Any],
    scheduler_opt: dict[str, Any] | None = None,
    total_iter: int = 1_000_000,
    warmup_iter: int = -1,
    wrap_fused: bool = True,
) -> tuple[optax.GradientTransformation, Any]:
    """Returns (optax transform, lr-schedule-or-constant)."""
    opt = dict(optim_opt)
    optim_type = opt.pop("type")
    base_lr = opt.pop("lr", 1e-3)
    # `fused` flattens the param tree into ONE buffer for the optimizer —
    # the TPU-native equivalent of the reference's torch._foreach_* fused
    # paths (adan.py:145, SURVEY §2.7): an SR net has ~10^2-10^3 small
    # param tensors, and per-leaf elementwise update kernels cost more in
    # launch overhead than in bandwidth (measured 21 ms/step for adan_sf
    # on RRDBNet-23's ~700 leaves; flattened, each update is a handful of
    # full-size kernels).  Optimizer state is stored flat — checkpoints
    # are layout-compatible only with the same `fused` setting.
    #
    # With ``wrap_fused=False`` the caller takes over the ravel/unravel
    # (the flat-apply train-step path, models/image.py): the transform is
    # returned UNwrapped and must be fed the flat 1-D vector directly.
    # The optimizer state layout is identical either way (optax.flatten
    # also just calls ``inner.init(concat-of-raveled-leaves)``), so
    # checkpoints are interchangeable between the two call styles.
    fused = opt.pop("fused", True)

    def _wrap(transform):
        if not fused or not wrap_fused:
            return transform
        return optax.flatten(transform)

    lower = optim_type.lower()
    # schedule-free optimizers run without an external scheduler
    if lower.endswith("_sf") or opt.get("schedule_free"):
        optimizer = OPTIMIZER_REGISTRY.get(optim_type)(lr=base_lr, **opt)
        return _wrap(optimizer), base_lr

    lr = build_scheduler(scheduler_opt, base_lr, total_iter, warmup_iter)

    if lower == "adam":
        b1, b2 = opt.get("betas", (0.9, 0.999))
        return _wrap(optax.adam(lr, b1=b1, b2=b2, eps=opt.get("eps", 1e-8))), lr
    if lower == "adamw":
        b1, b2 = opt.get("betas", (0.9, 0.999))
        return (
            _wrap(optax.adamw(
                lr, b1=b1, b2=b2, eps=opt.get("eps", 1e-8),
                weight_decay=opt.get("weight_decay", 1e-2),
            )),
            lr,
        )
    if lower == "nadam":
        b1, b2 = opt.get("betas", (0.9, 0.999))
        return _wrap(optax.nadam(lr, b1=b1, b2=b2, eps=opt.get("eps", 1e-8))), lr

    optimizer = OPTIMIZER_REGISTRY.get(optim_type)(lr=lr, **opt)
    return _wrap(optimizer), lr


def current_lr(lr: float | optax.Schedule, step: int) -> float:
    return float(lr(step)) if callable(lr) else float(lr)


def adapt_opt_layout(raw_sd: Any, target_state: Any, params: Any) -> Any:
    """Convert a restored optimizer state_dict between the fused
    (`optax.flatten`, the default — one concatenated buffer per moment)
    and per-leaf layouts, keyed by what `target_state` expects.

    `optax.flatten` stores every param-shaped moment as a single
    ``jnp.concatenate([ravel(leaf) for leaf in tree_leaves(params)])``
    vector, so a checkpoint written with the other `fused` setting has the
    same namedtuple wrapper structure but array leaves where the target
    has param dicts (or vice versa).  Both orders use `jax.tree` flatten
    order, so the conversion is a deterministic ravel/split.

    Returns a state_dict loadable into `target_state`; raises ValueError
    on a genuinely incompatible structure.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    p_leaves = jax.tree.leaves(params)
    sizes = [int(np.prod(p.shape)) for p in p_leaves]
    total = int(sum(sizes))
    p_struct = jax.tree.structure(params)
    params_sd = serialization.to_state_dict(params)

    def _fuse(node: dict) -> np.ndarray:
        """per-leaf params-shaped state dict -> one flat vector."""
        restored = serialization.from_state_dict(
            jax.tree.unflatten(p_struct, p_leaves), node
        )
        return np.concatenate([np.ravel(x) for x in jax.tree.leaves(restored)])

    def _unfuse(vec: np.ndarray) -> dict:
        """flat vector -> per-leaf params-shaped state dict."""
        chunks = np.split(np.asarray(vec), np.cumsum(sizes)[:-1])
        tree = jax.tree.unflatten(
            p_struct,
            [c.reshape(p.shape) for c, p in zip(chunks, p_leaves, strict=True)],
        )
        return serialization.to_state_dict(tree)

    def _is_params_like(sd_node: Any) -> bool:
        try:
            jax.tree.flatten(
                serialization.from_state_dict(
                    jax.tree.unflatten(p_struct, p_leaves), sd_node
                )
            )
        except Exception:
            return False
        return True

    def walk(tgt: Any, raw: Any) -> Any:
        tgt_is_dict = isinstance(tgt, dict)
        raw_is_dict = isinstance(raw, dict)
        if tgt_is_dict and raw_is_dict:
            if set(tgt) == set(raw):
                return {k: walk(tgt[k], raw[k]) for k in tgt}
            if _is_params_like(tgt) and _is_params_like(raw):
                return raw  # param-keyed region with renamed leaves: let
                # from_state_dict surface the precise error
            msg = (
                f"optimizer state keys mismatch: checkpoint {sorted(raw)} "
                f"vs runtime {sorted(tgt)}"
            )
            raise ValueError(msg)
        if tgt_is_dict and not raw_is_dict:
            if getattr(raw, "size", None) == total and _is_params_like(tgt):
                return _unfuse(raw)
            msg = "optimizer checkpoint has a fused buffer of unexpected size"
            raise ValueError(msg)
        if not tgt_is_dict and raw_is_dict:
            if int(np.prod(np.shape(tgt))) == total:
                return _fuse(raw)
            msg = "optimizer checkpoint is per-leaf but runtime buffer is not fused-sized"
            raise ValueError(msg)
        return raw

    tgt_sd = serialization.to_state_dict(target_state)
    return walk(tgt_sd, raw_sd)
