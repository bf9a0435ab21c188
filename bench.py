"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: compact 4x training throughput in patches/sec/chip on the live
backend (the BASELINE.json north-star metric).  `vs_baseline` is measured
against 2x the A100 target once reference numbers exist; the reference
publishes none (SURVEY.md §6), so baseline is recorded as the driver target
ratio when available, else null.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_compact_train(
    batch_per_chip: int = 16, patch: int = 48, scale: int = 4,
    warmup: int = 3, iters: int = 20,
) -> dict:
    import jax

    from neosr_tpu.data.loader import collate
    from neosr_tpu.models import build_model
    from neosr_tpu.utils.options import opt_from_dict

    n_chips = jax.device_count()
    global_batch = batch_per_chip * n_chips

    opt = {
        "name": "bench",
        "model_type": "image",
        "scale": scale,
        "num_gpu": n_chips,
        "manual_seed": 0,
        "use_amp": True,
        "bfloat16": True,
        "datasets": {"train": {"type": "paired", "phase": "train",
                               "patch_size": patch, "batch_size": batch_per_chip}},
        "network_g": {"type": "compact"},
        "path": {},
        "train": {
            "ema": 0.999,
            "optim_g": {
                "type": "adan_sf", "lr": 1e-3,
                "betas": [0.98, 0.92, 0.99], "weight_decay": 0.02,
                "warmup_steps": 16,
            },
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
        },
        "logger": {"total_iter": 1000},
    }
    opt = opt_from_dict(opt, root_path=".", is_train=True)
    opt["num_gpu"] = n_chips
    model = build_model(opt)

    rng = np.random.default_rng(0)
    batch = collate([
        {
            "lq": rng.random((patch, patch, 3)).astype(np.float32),
            "gt": rng.random((patch * scale, patch * scale, 3)).astype(np.float32),
        }
        for _ in range(global_batch)
    ])
    model.feed_data(batch)

    for i in range(warmup):
        model.optimize_parameters(i + 1)
    jax.block_until_ready(model.state.params_g)

    t0 = time.perf_counter()
    for i in range(iters):
        model.optimize_parameters(warmup + i + 1)
    jax.block_until_ready(model.state.params_g)
    dt = time.perf_counter() - t0

    patches_per_sec = global_batch * iters / dt
    return {
        "metric": "compact_4x_train_patches_per_sec_per_chip",
        "value": round(patches_per_sec / n_chips, 2),
        "unit": "patches/s/chip",
        "vs_baseline": None,
        "detail": {
            "n_chips": n_chips,
            "global_batch": global_batch,
            "patch": patch,
            "iters": iters,
            "wall_s": round(dt, 3),
        },
    }


if __name__ == "__main__":
    result = bench_compact_train()
    print(json.dumps(result))
