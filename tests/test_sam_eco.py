"""F-SAM + ECO training-path smoke tests."""

import numpy as np


def _run_iters(opt, tiny_paired_dataset, n=4):
    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    train_set = build_dataset(opt["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    model = build_model(opt)
    it = iter(loader)
    losses = []
    for i in range(n):
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
        losses.append(model.get_current_log()["l_g_total"])
    loader.close()
    return model, losses


def test_fsam(tiny_paired_dataset, tmp_path):
    import jax

    from tests.test_smoke_train import make_opt

    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={"sam": "fsam", "sam_init": 2, "ema": -1},
    )
    model, losses = _run_iters(opt, tiny_paired_dataset, n=5)
    assert np.isfinite(losses).all()
    # sam_t increments once active (sam_init=2 -> 3 active steps of 5)
    assert int(jax.device_get(model.state.sam_t)) == 3


def test_eco(tiny_paired_dataset, tmp_path):
    from tests.test_smoke_train import make_opt

    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={"eco": True, "eco_init": 1, "eco_iters": 10, "ema": -1},
    )
    _, losses = _run_iters(opt, tiny_paired_dataset, n=4)
    assert np.isfinite(losses).all()


def test_sam_accum_incompatible(tiny_paired_dataset, tmp_path):
    import pytest

    from tests.test_smoke_train import make_opt

    from neosr_tpu.models import build_model

    opt = make_opt(
        tiny_paired_dataset, tmp_path, extra_train={"sam": "fsam"},
    )
    opt["datasets"]["train"]["accumulate"] = 2
    with pytest.raises(ValueError, match="accumulation"):
        build_model(opt)
