#!/usr/bin/env python3
"""Generate the full options/ template set (train / train_otf / test per arch).

Mirrors the reference's template coverage (reference options/: 52 train + 27
test TOMLs, one trio per arch family — see reference options/train_*.toml)
while using neosr_tpu idioms: TPU-friendly defaults (bfloat16 on, batch 16),
forward-slash example paths, on-device metrics enabled.

The per-arch table records the default registered type, commented alternative
presets, training patch size (transformers train at 32, conv nets at 48 —
reference options/train_swinir.toml vs train_compact.toml), and any extra
[network_g] keys a factory requires (omnisr needs explicit upsampling /
window_size — reference convert.py:25-27).

Run:  python tools/gen_templates.py   (writes into options/, idempotent)
"""

from __future__ import annotations

import sys
from pathlib import Path

OPTIONS_DIR = Path(__file__).resolve().parent.parent / "options"

# arch key -> (default type, [alternative presets], patch_size, extra network_g lines)
ARCHS: dict[str, tuple[str, list[str], int, list[str]]] = {
    "compact": ("compact", [], 48, []),
    "esrgan": ("esrgan", [], 48, []),
    "span": ("span", [], 48, []),
    "spanplus": ("spanplus", ["spanplus_sts", "spanplus_s", "spanplus_st"], 48, []),
    "plksr": ("plksr", ["plksr_tiny"], 48, []),
    "realplksr": ("realplksr", ["realplksr_s"], 48, ["#dysample = true"]),
    "cugan": ("cugan", [], 48, []),
    "ditn": ("ditn", [], 48, []),
    "dctlsa": ("dctlsa", [], 48, []),
    "man": ("man", ["man_tiny", "man_light"], 48, []),
    "mosr": ("mosr", ["mosr_t"], 48, ['#upsampler = "dys"  # or "gps"']),
    "msdan": ("msdan", [], 48, []),
    "safmn": ("safmn", ["safmn_l", "light_safmnpp"], 48, []),
    "omnisr": ("omnisr", [], 48, ["upsampling = 4", "window_size = 8"]),
    "craft": ("craft", [], 48, []),
    "swinir": ("swinir_small", ["swinir_medium", "swinir_large"], 32, []),
    "hat": ("hat_m", ["hat_s", "hat_l"], 32, []),
    "atd": ("atd", ["atd_light"], 32, []),
    "dat": ("dat_m", ["dat_s", "dat_2"], 32, []),
    "drct": ("drct", ["drct_l", "drct_xl", "drct_s"], 32, []),
    "srformer": ("srformer_light", ["srformer_medium"], 32, []),
    "hitsrf": ("hit_srf", ["hit_srf_medium", "hit_srf_large"], 32, []),
    "hma": ("hma", ["hma_medium", "hma_large"], 32, []),
    "rgt": ("rgt", ["rgt_s"], 32, []),
    "grformer": ("grformer", ["grformer_medium", "grformer_large"], 32, []),
    "eimn": ("eimn", ["eimn_a", "eimn_l"], 32, []),
}

# Real-ESRGAN two-stage degradation defaults (reference options/train_*_otf.toml
# [degradations] block; values are the reference template defaults).
DEGRADATIONS = """\
[degradations]
resize_prob = [ 0.3, 0.4, 0.3 ]
resize_range = [ 0.5, 1.5 ]
gaussian_noise_prob = 0.2
noise_range = [ 0, 2 ]
poisson_scale_range = [ 0.05, 0.25 ]
gray_noise_prob = 0.1
jpeg_range = [ 40, 95 ]
second_blur_prob = 0.4
resize_prob2 = [ 0.3, 0.4, 0.3 ]
resize_range2 = [ 0.3, 1.5 ]
gaussian_noise_prob2 = 0.2
noise_range2 = [ 0, 2 ]
poisson_scale_range2 = [ 0.05, 0.1 ]
gray_noise_prob2 = 0.1
jpeg_range2 = [ 35, 95 ]
blur_kernel_size = 7
kernel_list = [ "iso", "aniso", "generalized_iso", "generalized_aniso", "plateau_iso", "plateau_aniso" ]
kernel_prob = [ 0.45, 0.25, 0.12, 0.03, 0.12, 0.03 ]
sinc_prob = 0.1
blur_sigma = [ 0.2, 3 ]
betag_range = [ 0.5, 4 ]
betap_range = [ 1, 2 ]
blur_kernel_size2 = 9
kernel_list2 = [ "iso", "aniso", "generalized_iso", "generalized_aniso", "plateau_iso", "plateau_aniso" ]
kernel_prob2 = [ 0.45, 0.25, 0.12, 0.03, 0.12, 0.03 ]
sinc_prob2 = 0.1
blur_sigma2 = [ 0.2, 1.5 ]
betag_range2 = [ 0.5, 4 ]
betap_range2 = [ 1, 2 ]
final_sinc_prob = 0.8
"""


def network_g_block(arch: str) -> str:
    default, alts, _, extra = ARCHS[arch]
    lines = ["[network_g]", f'type = "{default}"']
    lines += [f'#type = "{a}"' for a in alts]
    lines += extra
    return "\n".join(lines)


def train_toml(arch: str, otf: bool) -> str:
    default, _, patch, _ = ARCHS[arch]
    name = f"train_{arch}" + ("_otf" if otf else "")
    ds_type = "otf" if otf else "paired"
    lq_line = "" if otf else "dataroot_lq = '/data/train/lq'\n"
    aug = (
        'augmentation = [ "none", "mixup", "cutmix", "resizemix", "cutblur" ]\n'
        "aug_prob = [ 0.5, 0.1, 0.1, 0.1, 0.5 ]"
        if otf
        else '#augmentation = [ "none", "mixup", "cutmix", "resizemix" ]\n'
        "#aug_prob = [ 0.5, 0.1, 0.1, 0.1 ]"
    )
    degr = ("\n" + DEGRADATIONS) if otf else ""
    return f"""\
# neosr_tpu — {default} {'Real-ESRGAN-style on-the-fly degradation ' if otf else ''}4x training template.
# Same TOML schema as the reference (options/{name}.toml); paths are examples.
name = "{name}"
model_type = "{'otf' if otf else 'image'}"
scale = 4
use_amp = true
bfloat16 = true
#manual_seed = 1024

[datasets.train]
type = "{ds_type}"
dataroot_gt = '/data/train/gt'
{lq_line}patch_size = {patch}
batch_size = 16
#accumulate = 1
{aug}
{degr}
[datasets.val]
name = "val"
type = "paired"
dataroot_gt = '/data/val/gt'
dataroot_lq = '/data/val/lq'

[val]
val_freq = 1000
#tile = 200
[val.metrics.psnr]
type = "calculate_psnr"
[val.metrics.ssim]
type = "calculate_ssim"
#[val.metrics.dists]
#type = "calculate_dists"
#better = "lower"

[path]
#pretrain_network_g = 'experiments/pretrain_g.ckpt'
#pretrain_network_d = 'experiments/pretrain_d.ckpt'

{network_g_block(arch)}

[network_d]
type = "ea2fpn"
# ImageNet ResNet18 trunk weights (reference uses torchvision-pretrained;
# supply a torchvision resnet18 .pth for equivalent behavior):
#trunk_weights_path = "experiments/pretrained/resnet18.pth"
#trunk_weights_sha256 = "<sha256 of the weights file>"

[train]
ema = 0.999
grad_clip = false
#sam = "fsam"
#sam_init = 1000
#eco = true
#eco_init = 15000
#wavelet_guided = true
#wavelet_init = 80000
#match_lq_colors = true

[train.optim_g]
type = "adan_sf"
lr = 1e-3
betas = [ 0.98, 0.92, 0.987 ]
weight_decay = 0.02
schedule_free = true
warmup_steps = 1600

[train.optim_d]
type = "adan_sf"
lr = 5e-4
betas = [ 0.98, 0.92, 0.99 ]
weight_decay = 0.02
schedule_free = true

[train.mssim_opt]
type = "mssim_loss"
loss_weight = 1.0

[train.consistency_opt]
type = "consistency_loss"
loss_weight = 1.0

[train.perceptual_opt]
type = "vgg_perceptual_loss"
loss_weight = 0.5
criterion = "chc"
# Pretrained VGG19 features (REQUIRED for meaningful perceptual loss):
# convert offline with `python tools/convert_vgg_weights.py vgg19 <pth> out.npz`
# or pre-seed ~/.cache/torch/hub/checkpoints/ for auto-detection.
#weights_path = "experiments/pretrained/vgg19_features.npz"
#weights_sha256 = "<sha256 of the weights file>"

[train.gan_opt]
type = "gan_loss"
gan_type = "bce"
loss_weight = 0.3

#[train.dists_opt]
#type = "dists_loss"
#loss_weight = 0.5
#vgg_weights_path = "experiments/pretrained/vgg16_features.npz"
#vgg_weights_sha256 = "<sha256 of the weights file>"

#[train.ldl_opt]
#type = "ldl_loss"
#loss_weight = 1.0
#criterion = "chc"

#[train.ff_opt]
#type = "ff_loss"
#loss_weight = 1.0

#[train.gw_opt]
#type = "gw_loss"
#loss_weight = 1.0

[logger]
total_iter = 1000000
save_checkpoint_freq = 1000
print_freq = 100
use_tb_logger = true
#save_tb_img = true
"""


def test_toml(arch: str) -> str:
    # test templates pick the smallest preset (fast inference default),
    # mirroring the reference's choice (e.g. test_hat.toml uses hat_s).
    small_first = {"hat": "hat_s", "dat": "dat_s"}
    default, alts, _, extra = ARCHS[arch]
    typ = small_first.get(arch, default)
    alt_set = [a for a in [default, *alts] if a != typ]
    lines = ["[network_g]", f'type = "{typ}"']
    lines += [f'#type = "{a}"' for a in alt_set]
    lines += extra
    ng = "\n".join(lines)
    return f"""\
# neosr_tpu — {typ} inference template. Results land in experiments/<name>/results/.
name = "test_{arch}"
model_type = "image"
scale = 4

[datasets.test_1]
name = "test_set"
type = "single"
dataroot_lq = '/data/test'

[val]
#tile = 200

{ng}

[path]
pretrain_network_g = '/models/net_g.ckpt'
"""


def main() -> int:
    OPTIONS_DIR.mkdir(exist_ok=True)
    n = 0
    for arch in ARCHS:
        (OPTIONS_DIR / f"train_{arch}.toml").write_text(train_toml(arch, otf=False))
        (OPTIONS_DIR / f"train_{arch}_otf.toml").write_text(train_toml(arch, otf=True))
        (OPTIONS_DIR / f"test_{arch}.toml").write_text(test_toml(arch))
        n += 3
    print(f"wrote {n} templates to {OPTIONS_DIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
