"""End-to-end flagship recipe test (VERDICT r3 item 7).

Runs the ACTUAL `options/train_esrgan_otf.toml` template — OTF degradations
+ perceptual + DISTS + GAN through the fused single-program graph — with
synthetic pretrained-weight files supplied through the config-only ingestion
paths (`weights_path` / `vgg_weights_path` / `trunk_weights_path`), and
asserts every loss term ENGAGES (finite, the feature losses non-zero) and
the pixel term decreases.  The day real VGG19/VGG16/ResNet18 files appear,
zero code stands between them and a reference-parity run
(/root/reference/neosr/models/image.py:153-221 builds the same loss set).

Shapes are shrunk for the 1-CPU test host; every subsystem in the recipe
(fused OTF graph, ea2fpn discriminator with grafted trunk, VGG feature
losses from npz, adan_sf for G and D) is the production code path.
"""

import sys
import tomllib
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_weight_files(tmp_path_factory):
    """Random-init VGG19/VGG16 feature npz (converter layout) + a
    torchvision-layout resnet18 .pth for the ea2fpn trunk."""
    import torch

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_feature_losses import _torch_vgg_features, _vgg_npz

    tmp_path = tmp_path_factory.mktemp("flagship_weights")
    vgg19 = _vgg_npz(tmp_path, "vgg19", _torch_vgg_features("vgg19", 11))
    vgg16 = _vgg_npz(tmp_path, "vgg16", _torch_vgg_features("vgg16", 12))

    g = torch.Generator().manual_seed(5)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.1
        sd[f"{prefix}.running_mean"] = torch.randn(c, generator=g) * 0.3
        sd[f"{prefix}.running_var"] = torch.rand(c, generator=g) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(7)

    sd["conv1.weight"] = torch.randn(64, 3, 7, 7, generator=g) * 0.05
    bn("bn1", 64)
    chans = [64, 64, 128, 256, 512]
    for layer in range(1, 5):
        cin, cout = chans[layer - 1], chans[layer]
        for b in range(2):
            p = f"layer{layer}.{b}"
            c_in = cin if b == 0 else cout
            sd[f"{p}.conv1.weight"] = torch.randn(
                cout, c_in, 3, 3, generator=g) * 0.05
            bn(f"{p}.bn1", cout)
            sd[f"{p}.conv2.weight"] = torch.randn(
                cout, cout, 3, 3, generator=g) * 0.05
            bn(f"{p}.bn2", cout)
            if b == 0 and cin != cout:
                sd[f"{p}.downsample.0.weight"] = torch.randn(
                    cout, cin, 1, 1, generator=g) * 0.05
                bn(f"{p}.downsample.1", cout)
    resnet = tmp_path / "resnet18.pth"
    torch.save(sd, resnet)
    return {"vgg19": vgg19, "vgg16": vgg16, "resnet18": str(resnet)}


def test_flagship_recipe_losses_engage(
    tiny_paired_dataset, tmp_path, synthetic_weight_files
):
    from neosr_tpu.data import EnlargedSampler, build_dataloader, build_dataset
    from neosr_tpu.models import build_model
    from neosr_tpu.utils.options import opt_from_dict

    template = Path(__file__).resolve().parents[1] / "options" / "train_esrgan_otf.toml"
    with template.open("rb") as f:
        opt = tomllib.load(f)

    # --- shrink to test-host scale; recipe structure untouched ---
    opt["name"] = "flagship_e2e"
    opt["manual_seed"] = 7
    opt["use_amp"] = False
    opt["bfloat16"] = False
    ds = opt["datasets"]["train"]
    ds.update({
        # GT patch = patch_size*scale must divide by 32 (ea2fpn's FPN
        # stride pyramid), so patch 16 -> GT 64
        "dataroot_gt": tiny_paired_dataset["gt"],
        "gt_size": 64, "patch_size": 16, "batch_size": 2, "queue_size": 4,
        "num_worker_per_gpu": 2, "seed": 0,
    })
    opt["datasets"].pop("val", None)
    opt.pop("val", None)
    opt["network_g"].update({"num_feat": 16, "num_block": 2, "num_grow_ch": 8})
    # --- the config-only pretrained-weight ingestion under test ---
    opt["network_d"]["trunk_weights_path"] = synthetic_weight_files["resnet18"]
    opt["train"]["perceptual_opt"]["weights_path"] = synthetic_weight_files["vgg19"]
    # the template ships dists commented out; the flagship recipe enables it
    opt["train"]["dists_opt"] = {
        "type": "dists_loss", "loss_weight": 0.5,
        "vgg_weights_path": synthetic_weight_files["vgg16"],
    }
    opt["train"]["optim_g"]["warmup_steps"] = 2
    opt["logger"]["total_iter"] = 40
    opt["logger"]["use_tb_logger"] = False
    opt["path"] = {"experiments_root": str(tmp_path / "exp")}

    opt = opt_from_dict(opt, root_path=str(tmp_path), is_train=True)
    for phase, d in opt["datasets"].items():
        if phase == "train" and "degradations" in opt:
            d.update(opt["degradations"])
            d["scale"] = opt["scale"]

    train_set = build_dataset(opt["datasets"]["train"])
    sampler = EnlargedSampler(len(train_set), 1, 0, 1, 7)
    loader = build_dataloader(
        train_set, opt["datasets"]["train"], num_devices=1, sampler=sampler,
        seed=7,
    )
    model = build_model(opt)
    assert model.net_d is not None

    it = iter(loader)
    pixel, logs = [], {}
    for i in range(12):
        model.feed_data(next(it))
        model.optimize_parameters(i + 1)
        logs = model.get_current_log()
        # the template's pixel-type term is mssim (no separate pixel_opt,
        # matching the reference's train_esrgan_otf recipe)
        pixel.append(logs["l_g_mssim"])
    loader.close()

    # every term of the flagship loss set engaged through the fused graph
    for key in ("l_g_mssim", "l_g_consistency", "l_g_perceptual",
                "l_g_dists", "l_g_gan", "l_g_total", "l_d_real", "l_d_fake"):
        assert key in logs, f"missing {key}: {sorted(logs)}"
        assert np.isfinite(logs[key]), f"{key} not finite: {logs[key]}"
    # feature losses must be NON-zero (weights actually loaded + consumed)
    assert logs["l_g_perceptual"] > 0
    assert logs["l_g_dists"] > 0
    # the pixel term trends down over the short run
    assert np.mean(pixel[-4:]) < np.mean(pixel[:4])
