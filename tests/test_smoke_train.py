"""End-to-end training smoke test: compact 4x, L1, AdamW, val, save/resume.

This is the regression anchor for BASELINE.json config #1 ("compact 4x paired
L1 training, CPU-runnable")."""

from pathlib import Path

import numpy as np
import pytest


def make_opt(data_dirs, tmp_path, extra_train=None, network_g=None):
    from neosr_tpu.utils.options import opt_from_dict

    opt = {
        "name": "smoke",
        "model_type": "image",
        "scale": 4,
        "num_gpu": 1,
        "manual_seed": 7,
        "datasets": {
            "train": {
                "type": "paired",
                "dataroot_gt": data_dirs["gt"],
                "dataroot_lq": data_dirs["lq"],
                "patch_size": 8,
                "batch_size": 2,
            },
            "val": {
                "name": "valset",
                "type": "paired",
                "dataroot_gt": data_dirs["gt"],
                "dataroot_lq": data_dirs["lq"],
            },
        },
        "val": {
            "val_freq": 100,
            "metrics": {
                "psnr": {"type": "calculate_psnr"},
                "ssim": {"type": "calculate_ssim"},
            },
        },
        "path": {"experiments_root": str(tmp_path / "experiments")},
        "network_g": network_g or {"type": "compact", "num_feat": 16, "num_conv": 2},
        "train": {
            "ema": 0.999,
            "optim_g": {"type": "adamw", "lr": 1e-3},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            **(extra_train or {}),
        },
        "logger": {"total_iter": 10, "save_checkpoint_freq": 5, "print_freq": 1},
    }
    return opt_from_dict(opt, root_path=str(tmp_path), is_train=True)


def test_train_step_decreases_loss(tiny_paired_dataset, tmp_path):
    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    opt = make_opt(tiny_paired_dataset, tmp_path)
    train_set = build_dataset(opt["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    model = build_model(opt)

    losses = []
    it = iter(loader)
    for i in range(80):
        batch = next(it)
        assert batch["lq"].shape == (2, 8, 8, 3)
        assert batch["gt"].shape == (2, 32, 32, 3)
        model.feed_data(batch)
        model.optimize_parameters(i + 1)
        losses.append(model.get_current_log()["l_g_total"])
    loader.close()
    assert np.isfinite(losses).all()
    # compare window means, not endpoints: the GT here is uniform noise, so
    # the learnable margin over the net's skip-connection init is small and
    # per-batch crop sequences can tie over short horizons (a 16-step window
    # flaked when the deterministic per-position loader RNG landed on an
    # unlucky crop order) — 80 steps separates signal from crop noise
    first, last = np.mean(losses[:8]), np.mean(losses[-8:])
    assert last < first - 3e-3, f"loss did not decrease: {losses}"


def test_validation_and_metrics(tiny_paired_dataset, tmp_path):
    from neosr_tpu.data import build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    opt = make_opt(tiny_paired_dataset, tmp_path)
    model = build_model(opt)
    val_set = build_dataset(opt["datasets"]["val"])
    val_loader = build_dataloader(val_set, opt["datasets"]["val"])
    Path(opt["path"]["visualization"]).mkdir(parents=True, exist_ok=True)
    model.validation(val_loader, current_iter=1, save_img=False)
    assert "psnr" in model.metric_results
    assert 0 < model.metric_results["psnr"] < 60
    assert 0 <= model.metric_results["ssim"] <= 1


def test_save_and_resume(tiny_paired_dataset, tmp_path):
    import jax

    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    opt = make_opt(tiny_paired_dataset, tmp_path)
    Path(opt["path"]["models"]).mkdir(parents=True, exist_ok=True)
    Path(opt["path"]["training_states"]).mkdir(parents=True, exist_ok=True)

    train_set = build_dataset(opt["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    model = build_model(opt)
    it = iter(loader)
    for i in range(3):
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
    model.save(epoch=0, current_iter=3)
    loader.close()

    state_file = Path(opt["path"]["training_states"]) / "3.state"
    assert state_file.exists()
    assert (Path(opt["path"]["models"]) / "net_g_3.ckpt").exists()

    model2 = build_model(opt)
    model2.resume_training({"path": str(state_file)})
    assert model2.resume_iter == 3
    p1 = jax.device_get(model.state.params_g)
    p2 = jax.device_get(model2.state.params_g)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_schedule_free_optimizer(tiny_paired_dataset, tmp_path):
    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        extra_train={
            "optim_g": {
                "type": "adan_sf", "lr": 1e-3,
                "betas": [0.98, 0.92, 0.99],
                "weight_decay": 0.02, "warmup_steps": 2,
            },
            "ema": -1,
        },
    )
    train_set = build_dataset(opt["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    model = build_model(opt)
    assert model.sf_g
    it = iter(loader)
    losses = []
    for i in range(6):
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
        losses.append(model.get_current_log()["l_g_total"])
    loader.close()
    assert np.isfinite(losses).all()
    # eval params come from the schedule-free average
    ev = model._eval_params()
    assert ev is not None


def test_uint8_paired_training(tiny_paired_dataset, tmp_path):
    """out_dtype='uint8' ships raw bytes; the jitted step normalizes in-graph
    and matches float32 training numerically on the first step."""
    from neosr_tpu.data import build_dataset
    from neosr_tpu.data.loader import collate
    from neosr_tpu.models import build_model

    losses = {}
    for dt in ("float32", "uint8"):
        opt = make_opt(tiny_paired_dataset, tmp_path)
        opt["name"] = f"smoke_{dt}"
        opt["datasets"]["train"]["out_dtype"] = dt
        opt["datasets"]["train"]["seed"] = 3
        train_set = build_dataset(opt["datasets"]["train"])
        batch = collate([train_set[0], train_set[1]])
        assert batch["lq"].dtype == (np.uint8 if dt == "uint8" else np.float32)
        model = build_model(opt)
        model.feed_data(batch)
        model.optimize_parameters(1)
        losses[dt] = model.get_current_log()["l_g_total"]
    # same crops (seeded), same init seed: uint8/255 == float32 exactly
    assert abs(losses["uint8"] - losses["float32"]) < 1e-5, losses


def test_paired_batch_augmentations_applied():
    """The paired (image) model honors `augmentation`/`aug_prob` in the
    train dataset opt (reference image.py:380-391): with augs enabled the
    same seed/data produces a different loss trajectory, and training
    stays finite."""
    import numpy as np

    from neosr_tpu.data.loader import collate
    from neosr_tpu.models import build_model
    from neosr_tpu.utils.options import opt_from_dict

    def make_opt(aug):
        ds = {"type": "paired", "phase": "train", "patch_size": 16,
              "batch_size": 4}
        if aug:
            ds["augmentation"] = ["none", "mixup", "cutmix", "resizemix",
                                  "cutblur"]
            ds["aug_prob"] = [0.1, 0.3, 0.2, 0.2, 0.2]
        opt = {
            "name": "aug_smoke", "model_type": "image", "scale": 4,
            "num_gpu": 1, "manual_seed": 0, "is_train": True,
            "datasets": {"train": ds},
            "network_g": {"type": "compact", "num_feat": 8, "num_conv": 1},
            "path": {},
            "train": {
                "optim_g": {"type": "adamw", "lr": 1e-3},
                "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            },
            "logger": {"total_iter": 10},
        }
        return opt_from_dict(opt, root_path=".", is_train=True)

    rng = np.random.default_rng(3)
    batch = collate([
        {"lq": rng.random((16, 16, 3)).astype(np.float32),
         "gt": rng.random((64, 64, 3)).astype(np.float32)}
        for _ in range(4)
    ])

    losses = {}
    for aug in (False, True):
        model = build_model(make_opt(aug))
        model.feed_data(batch)
        hist = []
        for i in range(3):
            model.optimize_parameters(i + 1)
            hist.append(model.get_current_log()["l_g_total"])
        losses[aug] = hist
        assert all(np.isfinite(v) for v in hist)
    # augmented batches differ from raw pairs -> different losses
    assert losses[True] != losses[False]


def test_bn_arch_train_updates_running_stats(tiny_paired_dataset, tmp_path):
    """A BN arch (eimn) training step must run with mutable batch_stats and
    move the running statistics away from init (0 mean / 1 var), and the
    stats must survive save/resume (VERDICT r2 missing #3)."""
    import jax
    import numpy as np

    from neosr_tpu.models import build_model

    opt = make_opt(
        tiny_paired_dataset, tmp_path,
        network_g={"type": "eimn", "embed_dims": 16, "num_stages": 2,
                   "depths": 1},
    )
    model = build_model(opt)
    assert jax.tree.leaves(model.state.bstats_g), "eimn must carry batch_stats"
    batch = _one_batch(opt)
    model.feed_data(batch)
    model.optimize_parameters(1)
    model.feed_data(batch)
    model.optimize_parameters(2)
    stats = jax.device_get(model.state.bstats_g)
    means = np.concatenate([np.ravel(x) for k, x in
                            _flat_items(stats) if k.endswith("mean")])
    assert np.abs(means).max() > 0, "running means never updated"

    # validation uses the running stats (eval path must not error)
    model.save(epoch=0, current_iter=2)
    model2 = build_model(opt)
    states = sorted((tmp_path / "experiments" / opt["name"] /
                     "training_states").glob("*.state"))
    model2.resume_training({"path": str(states[-1])})
    stats2 = jax.device_get(model2.state.bstats_g)
    for (k1, a), (k2, b) in zip(_flat_items(stats), _flat_items(stats2),
                                strict=True):
        np.testing.assert_allclose(a, b, err_msg=k1)


def _flat_items(tree, prefix=""):
    items = []
    if isinstance(tree, dict):
        for k in sorted(tree):
            items.extend(_flat_items(tree[k], f"{prefix}.{k}"))
    else:
        items.append((prefix, np.asarray(tree)))
    return items


def _one_batch(opt):
    import numpy as np

    from neosr_tpu.data.loader import collate

    rng = np.random.default_rng(0)
    ps = opt["datasets"]["train"]["patch_size"]
    s = opt["scale"]
    b = opt["datasets"]["train"]["batch_size"]
    return collate([
        {"lq": rng.random((ps, ps, 3)).astype(np.float32),
         "gt": rng.random((ps * s, ps * s, 3)).astype(np.float32)}
        for _ in range(b)
    ])


def test_tiled_forward_matches_whole_image(tiny_paired_dataset, tmp_path):
    """Batched tiled inference must agree with the whole-image forward in
    tile interiors (overlap crop handles seams; compact's receptive field
    is far smaller than the 8px overlap; tile 32 keeps step positive)."""
    import jax
    import numpy as np

    from neosr_tpu.models import build_model

    opt = make_opt(tiny_paired_dataset, tmp_path)
    model = build_model(opt)
    rng = np.random.default_rng(11)
    lq = rng.random((1, 40, 56, 3)).astype(np.float32)
    variables = model._eval_variables()
    whole = np.asarray(model._padded_forward(variables, lq, multiple=8))
    tiled = model._tiled_forward(variables, lq, tile=32, overlap=8)
    assert tiled.shape == whole.shape
    np.testing.assert_allclose(tiled, whole, atol=2e-3, rtol=1e-3)


def test_paired_meta_info_file_alias(tmp_path):
    """The reference gates on `meta_info` but reads the path from
    `meta_info_file` (paired_dataset.py:76-82); both spellings work here."""
    import cv2
    import numpy as np

    from neosr_tpu.data import build_dataset

    for sub in ("gt", "lq"):
        (tmp_path / sub).mkdir()
    for i in range(2):
        cv2.imwrite(str(tmp_path / "gt" / f"i{i}.png"),
                    np.zeros((32, 32, 3), np.uint8))
        cv2.imwrite(str(tmp_path / "lq" / f"i{i}.png"),
                    np.zeros((8, 8, 3), np.uint8))
    meta = tmp_path / "meta.txt"
    meta.write_text("i0.png\ni1.png\n")
    base = {
        "name": "m", "type": "paired", "phase": "train", "scale": 4,
        "dataroot_gt": str(tmp_path / "gt"), "dataroot_lq": str(tmp_path / "lq"),
        "patch_size": 8, "batch_size": 1,
    }
    for key in ("meta_info", "meta_info_file"):
        ds = build_dataset({**base, key: str(meta)})
        assert len(ds) == 2
        sample = ds[0]
        assert sample["gt"].shape[0] == 32


def test_grayscale_color_y_training(tmp_path):
    """`color = "y"` trains a 1-channel model on luma images (reference
    img2tensor color=False path, img_util.py:42-48) and validates with the
    y-channel metric guard."""
    import cv2
    import numpy as np

    from neosr_tpu.models import build_model
    from neosr_tpu.utils.options import opt_from_dict

    rng = np.random.default_rng(0)
    for sub in ("gt", "lq", "vgt", "vlq"):
        (tmp_path / sub).mkdir()
    for i in range(3):
        g = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "gt" / f"i{i}.png"), g)
        cv2.imwrite(str(tmp_path / "lq" / f"i{i}.png"),
                    cv2.resize(g, (8, 8), interpolation=cv2.INTER_CUBIC))
    g = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "vgt" / "v.png"), g)
    cv2.imwrite(str(tmp_path / "vlq" / "v.png"),
                cv2.resize(g, (8, 8), interpolation=cv2.INTER_CUBIC))

    opt = opt_from_dict({
        "name": "gray", "model_type": "image", "scale": 4, "num_gpu": 1,
        "manual_seed": 0, "color": "y",
        "datasets": {
            "train": {"type": "paired", "phase": "train",
                      "dataroot_gt": str(tmp_path / "gt"),
                      "dataroot_lq": str(tmp_path / "lq"),
                      "patch_size": 8, "batch_size": 2},
            "val": {"name": "v", "type": "paired", "phase": "val",
                    "dataroot_gt": str(tmp_path / "vgt"),
                    "dataroot_lq": str(tmp_path / "vlq")},
        },
        "network_g": {"type": "compact", "num_feat": 8, "num_conv": 2,
                      "num_in_ch": 1, "num_out_ch": 1},
        "path": {},
        "train": {"optim_g": {"type": "adamw", "lr": 1e-3},
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0}},
        "val": {"metrics": {"psnr": {"type": "calculate_psnr",
                                     "test_y_channel": True}}},
        "logger": {"total_iter": 4},
    }, root_path=str(tmp_path), is_train=True)
    model = build_model(opt)

    from neosr_tpu.data import build_dataloader, build_dataset

    tr = build_dataset(opt["datasets"]["train"])
    sample = tr[0]
    assert sample["gt"].shape[-1] == 1 and sample["lq"].shape[-1] == 1
    loader = build_dataloader(tr, opt["datasets"]["train"], seed=0)
    it = iter(loader)
    for step in range(1, 3):
        model.feed_data(next(it))
        model.optimize_parameters(step)
    assert np.isfinite(model.log_dict["l_g_pixel"])

    vl = build_dataset(opt["datasets"]["val"])
    vloader = build_dataloader(vl, opt["datasets"]["val"], seed=0)
    model.validation(vloader, current_iter=2, tb_logger=None, save_img=False)
    assert np.isfinite(model.best_metric_results["v"]["psnr"]["val"])
