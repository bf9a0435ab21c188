"""Native packio extension: build, pack, read, and train through it."""

import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def packs(tmp_path_factory, ):
    import cv2

    root = tmp_path_factory.mktemp("packdata")
    gt_dir = root / "gt"
    lq_dir = root / "lq"
    gt_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        gt = (rng.random((64, 72, 3)) * 255).astype(np.uint8)
        lq = cv2.resize(gt, (18, 16))
        cv2.imwrite(str(gt_dir / f"i{i}.png"), gt)
        cv2.imwrite(str(lq_dir / f"i{i}.png"), lq)
    subprocess.run(
        [sys.executable, "tools/pack_dataset.py", "-input", str(gt_dir),
         "-output", str(root / "gt.npack")], check=True, capture_output=True,
    )
    subprocess.run(
        [sys.executable, "tools/pack_dataset.py", "-input", str(lq_dir),
         "-output", str(root / "lq.npack")], check=True, capture_output=True,
    )
    return root, gt_dir


def test_pack_roundtrip(packs):
    import cv2

    from neosr_tpu._native import get_packio

    root, gt_dir = packs
    packio = get_packio()
    p = packio.Pack(str(root / "gt.npack"))
    assert len(p) == 6
    assert p.shape(0) == (64, 72, 3)

    img = cv2.cvtColor(cv2.imread(str(gt_dir / "i0.png")), cv2.COLOR_BGR2RGB)
    buf, h, w, c = p.read(0)
    full = np.frombuffer(buf, np.uint8).reshape(h, w, c)
    np.testing.assert_array_equal(full, img)

    buf, h, w, c = p.read_crop(0, 10, 20, 16, 24)
    crop = np.frombuffer(buf, np.uint8).reshape(h, w, c)
    np.testing.assert_array_equal(crop, img[10:26, 20:44])

    with pytest.raises(ValueError):
        p.read_crop(0, 60, 0, 16, 16)  # out of bounds
    with pytest.raises(IndexError):
        p.read(99)


def test_paired_packed_dataset_trains(packs, tmp_path):
    from tests.test_smoke_train import make_opt

    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model

    root, _ = packs
    opt = make_opt({"gt": "", "lq": ""}, tmp_path)
    opt["datasets"]["train"] = {
        "type": "paired_packed", "phase": "train", "scale": 4,
        "dataroot_gt": str(root / "gt.npack"),
        "dataroot_lq": str(root / "lq.npack"),
        "patch_size": 8, "batch_size": 2, "seed": 0,
    }
    train_set = build_dataset(opt["datasets"]["train"])
    sample = train_set[0]
    assert sample["lq"].shape == (8, 8, 3)
    assert sample["gt"].shape == (32, 32, 3)

    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler, seed=7
    )
    model = build_model(opt)
    it = iter(loader)
    for i in range(2):
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
    logs = model.get_current_log()
    loader.close()
    assert np.isfinite(logs["l_g_total"])
