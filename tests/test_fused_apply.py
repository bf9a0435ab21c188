"""Flat-domain fused apply (models/image.py): exact equivalence.

The flat-apply path ravels params/grads once per step and runs the
optimizer update, the apply-updates add, the NaN-guard select and the EMA
blend on one (N,) vector instead of ~#leaves x 3 per-leaf tree_map kernels
(the TPU-native analog of torch._foreach_* fused applies, reference
adan.py:145).  Elementwise arithmetic is order-identical per element, so
trajectories must match the tree path bit-for-bit when no cross-leaf
reduction is involved; with grad_clip the global-norm sum order differs
(one vector sum vs per-leaf partial sums), so that case is allclose.
"""

import os

import jax
import numpy as np
import pytest


def _train(tiny_paired_dataset, tmp_path, fused_apply, n_steps=5,
           extra_train=None, gan=False):
    from tests.test_smoke_train import make_opt

    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    os.environ["NEOSR_FUSED_APPLY"] = "1" if fused_apply else "0"
    try:
        extra = dict(extra_train or {})
        if gan:
            extra.update({
                "gan_opt": {"type": "gan_loss", "gan_type": "bce",
                            "loss_weight": 0.1},
                "optim_d": {"type": "adamw", "lr": 1e-4},
            })
        opt = make_opt(tiny_paired_dataset,
                       tmp_path / f"fused{int(fused_apply)}{int(gan)}",
                       extra_train=extra)
        if gan:
            opt["network_d"] = {"type": "patchgan"}
        model = build_model(opt)
        assert model.flat_apply_g == fused_apply

        train_set = build_dataset(opt["datasets"]["train"])
        sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
        loader = build_dataloader(
            train_set, opt["datasets"]["train"], num_devices=1,
            sampler=sampler, seed=7,
        )
        losses = []
        it = iter(loader)
        for i in range(n_steps):
            model.feed_data(next(it))
            model.optimize_parameters(i + 1)
            losses.append(model.get_current_log()["l_g_total"])
        loader.close()
        params = jax.tree.map(np.asarray, model.state.params_g)
        ema = jax.tree.map(np.asarray, model.state.ema_g)
        return losses, params, ema
    finally:
        os.environ.pop("NEOSR_FUSED_APPLY", None)


def _assert_tree_equal(a, b, exact=True):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb, strict=True):
        if exact:
            np.testing.assert_array_equal(x, y)
        else:
            np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("otype", ["adamw", "adan_sf"])
def test_fused_apply_bitwise_equivalence(tiny_paired_dataset, tmp_path, otype):
    extra = {"optim_g": {"type": otype, "lr": 1e-3}}
    l0, p0, e0 = _train(tiny_paired_dataset, tmp_path, False, extra_train=extra)
    l1, p1, e1 = _train(tiny_paired_dataset, tmp_path, True, extra_train=extra)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    _assert_tree_equal(p0, p1, exact=True)
    _assert_tree_equal(e0, e1, exact=True)


def test_fused_apply_gan_equivalence(tiny_paired_dataset, tmp_path):
    l0, p0, e0 = _train(tiny_paired_dataset, tmp_path, False, gan=True)
    l1, p1, e1 = _train(tiny_paired_dataset, tmp_path, True, gan=True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    _assert_tree_equal(p0, p1, exact=True)
    _assert_tree_equal(e0, e1, exact=True)


def test_fused_apply_grad_clip_close(tiny_paired_dataset, tmp_path):
    # clip_by_global_norm reassociates the squared-norm sum in the flat
    # domain -> allclose, not bitwise
    extra = {"grad_clip": True}
    l0, p0, e0 = _train(tiny_paired_dataset, tmp_path, False, extra_train=extra)
    l1, p1, e1 = _train(tiny_paired_dataset, tmp_path, True, extra_train=extra)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-5)
    _assert_tree_equal(p0, p1, exact=False)
    _assert_tree_equal(e0, e1, exact=False)


def test_fused_apply_checkpoint_interop(tiny_paired_dataset, tmp_path):
    """A checkpoint written by the tree path resumes on the flat path (the
    optimizer state layout is identical by construction)."""
    from tests.test_smoke_train import make_opt

    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    os.environ["NEOSR_FUSED_APPLY"] = "0"
    try:
        opt = make_opt(tiny_paired_dataset, tmp_path / "ckpt_src")
        model = build_model(opt)
        train_set = build_dataset(opt["datasets"]["train"])
        sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
        loader = build_dataloader(
            train_set, opt["datasets"]["train"], num_devices=1,
            sampler=sampler, seed=7,
        )
        it = iter(loader)
        for i in range(3):
            model.feed_data(next(it))
            model.optimize_parameters(i + 1)
        model.save(0, 3)
        loader.close()
        state_path = model.opt["path"]["training_states"]
    finally:
        os.environ.pop("NEOSR_FUSED_APPLY", None)

    # resume with the flat path and take more steps
    opt2 = make_opt(tiny_paired_dataset, tmp_path / "ckpt_src")
    model2 = build_model(opt2)
    assert model2.flat_apply_g
    model2.resume_training({"path": os.path.join(state_path, "3.state")})
    assert int(model2.state.step) == 3
    train_set = build_dataset(opt2["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt2["datasets"]["train"], num_devices=1,
        sampler=sampler, seed=7,
    )
    it = iter(loader)
    for i in range(2):
        model2.feed_data(next(it))
        model2.optimize_parameters(4 + i)
    loader.close()
    assert np.isfinite(model2.get_current_log()["l_g_total"])
