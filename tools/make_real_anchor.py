"""Build the REAL-photo quality-anchor dataset from images bundled with
installed packages (this environment has no internet and no SR datasets;
these are the only real photographs on the machine):

  train : sklearn's china.jpg + flower.jpg (427x640 each) -> overlapping
          256x256 GT tiles (stride 128, edge-anchored rows/cols included)
  val   : matplotlib's grace_hopper.jpg — a HELD-OUT IMAGE, not held-out
          crops — center-cropped to 256-multiples and tiled 256x256

LQ is bicubic x4 (cv2 INTER_CUBIC), the same protocol as the synthetic
anchor set (tools/make_anchor_dataset.py), so PSNR/SSIM deltas over the
bicubic baseline are directly comparable across the two anchor families.

Usage: python tools/make_real_anchor.py [--root /tmp/anchor_real]

The --v2 mode addresses the round-3 finding that 24 tiles from two
photographs overfit (best 25.086 dB vs bicubic 25.10 on the held-out
image): it widens the TRAIN side with every other real photograph on the
machine (pygame's camera-module doc shots, 320x240) plus the 200
synthetic procedural tiles from tools/make_anchor_dataset.py as a
regularizing mix.  The VAL side is unchanged — grace_hopper stays a
held-out real photograph, so the metric still measures generalization
to real-photo statistics.

The --v3 mode addresses the round-4 finding that 229 tiles are still
below the data scale window attention needs (four transformer runs —
swinir from-scratch x2, swinir warm-start, omnisr — all plateau
0.05-0.10 dB under the bicubic bar while convs clear it): it further
widens the TRAIN side with the photographic surface textures bundled in
dm_control / gymnasium_robotics (crumpled foil, leather, wood grain,
four marbles, mosaic tile, concrete, grass — real photographs of real
surfaces, visually screened; procedural/colorized game textures
excluded), ~2.5x the v2 tile count.  VAL is still untouched.

The --v4 mode addresses the round-4 verdict that every real-anchor
margin was adjudicated on ONE held-out photograph (the reference
protocol evaluates over a val *set*, reference image.py:792-922): it
moves THREE visually distinct texture photographs (darkwood wood grain,
tile1 mosaic, OutdoorGrassFloorD grass) from the v3 train side to a
val-only role — the machine has no other unused real photographs, so an
eval-only widening of v3 would score models on their own training
images; v4 retrains instead.  Val = grace_hopper's 6 tiles + the center
2x2 tiles of each held-out texture (balanced per image, 18 tiles / 4
images); train = the v3 set minus those textures (481 tiles).
"""

from __future__ import annotations

import argparse
import glob
import os

import cv2
import numpy as np


# Photographic surface textures bundled with installed simulation packages
# (site-packages-relative).  Each was visually screened: these are real
# photographs of real surfaces; procedural / flat-colorized game textures
# (labmaze styles, soccer kit atlases, pitch stripes) are excluded.
_TEXTURE_PATHS = [
    "gymnasium_robotics/envs/assets/adroit_hand/resources/textures/foil.png",
    "gymnasium_robotics/envs/assets/adroit_hand/resources/textures/silverRaw.png",
    "gymnasium_robotics/envs/assets/adroit_hand/resources/textures/skin.png",
    "gymnasium_robotics/envs/assets/adroit_hand/resources/textures/darkwood.png",
    "gymnasium_robotics/envs/assets/adroit_hand/resources/textures/marble.png",
    "gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/tile1.png",
    "gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile.png",
    "gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile2.png",
    "gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/marble1.png",
    "gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/metal1.png",
    "gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/wood1.png",
    "dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorGrassFloorD.png",
]


# --v4 val-only holdouts (basename): wood grain / mosaic tile / grass —
# three distinct surface statistics, never in the v4 train side
_V4_VAL_TEXTURES = ("darkwood.png", "tile1.png", "OutdoorGrassFloorD.png")


def _texture_images(exclude: tuple[str, ...] = ()) -> list[np.ndarray]:
    import sysconfig

    site = sysconfig.get_paths()["purelib"]
    out = []
    for rel in _TEXTURE_PATHS:
        if os.path.basename(rel) in exclude:
            continue
        p = os.path.join(site, rel)
        img = cv2.imread(p, cv2.IMREAD_COLOR) if os.path.exists(p) else None
        if img is not None:
            out.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    return out


def _sources(v2: bool = False, v3: bool = False,
             v4: bool = False) -> tuple[list[np.ndarray], list[np.ndarray]]:
    import matplotlib
    from sklearn.datasets import load_sample_images

    train = [img.astype(np.uint8) for img in load_sample_images().images]
    if v3:
        train += _texture_images(exclude=_V4_VAL_TEXTURES if v4 else ())
    if v2:
        import pygame

        cam_dir = os.path.join(
            os.path.dirname(pygame.__file__), "docs", "generated", "_images",
        )
        # natural-content camera shots (skip thresholded/mask/green overlays)
        for name in ("camera_rgb", "camera_background", "camera_average",
                     "camera_yuv", "camera_hsv"):
            p = os.path.join(cam_dir, f"{name}.jpg")
            if os.path.exists(p):
                img = cv2.imread(p, cv2.IMREAD_COLOR)
                if img is not None:
                    train.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    hopper_path = os.path.join(
        os.path.dirname(matplotlib.__file__),
        "mpl-data", "sample_data", "grace_hopper.jpg",
    )
    hopper = cv2.cvtColor(cv2.imread(hopper_path), cv2.COLOR_BGR2RGB)
    val = [hopper]
    if v4:
        import sysconfig

        site = sysconfig.get_paths()["purelib"]
        for rel in _TEXTURE_PATHS:
            if os.path.basename(rel) not in _V4_VAL_TEXTURES:
                continue
            img = cv2.imread(os.path.join(site, rel), cv2.IMREAD_COLOR)
            # balanced val contribution: the center 2x2 of 256-tiles, so a
            # 1024^2 texture doesn't dominate the 4-image average
            h, w = img.shape[:2]
            y0 = (h - 512) // 2
            x0 = (w - 512) // 2
            val.append(cv2.cvtColor(img[y0:y0 + 512, x0:x0 + 512],
                                    cv2.COLOR_BGR2RGB))
    return train, val


def _tiles(img: np.ndarray, size: int, stride: int) -> list[np.ndarray]:
    h, w = img.shape[:2]
    ys = sorted({*range(0, h - size + 1, stride), h - size})
    xs = sorted({*range(0, w - size + 1, stride), w - size})
    return [img[y:y + size, x:x + size] for y in ys for x in xs]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/anchor_real")
    ap.add_argument("--v2", action="store_true",
                    help="widen the train set: extra real photos + the "
                         "synthetic anchor tiles (--synthetic-gt)")
    ap.add_argument("--v3", action="store_true",
                    help="further widen with the bundled photographic "
                         "surface textures (implies --v2)")
    ap.add_argument("--v4", action="store_true",
                    help="multi-image val: hold darkwood/tile1/grass OUT of "
                         "the train side entirely and add their center 2x2 "
                         "tiles to val (implies --v3)")
    ap.add_argument("--synthetic-gt", default="/tmp/anchor/gt",
                    help="GT folder of tools/make_anchor_dataset.py output "
                         "to mix in under --v2")
    args = ap.parse_args()
    if args.v4:
        args.v3 = True
    if args.v3:
        args.v2 = True
    for sub in ("gt", "lq", "val_gt", "val_lq"):
        os.makedirs(os.path.join(args.root, sub), exist_ok=True)

    train_imgs, val_imgs = _sources(v2=args.v2, v3=args.v3, v4=args.v4)
    n = 0

    def _emit(t: np.ndarray) -> None:
        nonlocal n
        h, w = t.shape[:2]
        lq = cv2.resize(t, (w // 4, h // 4), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(args.root, "gt", f"img{n:03d}.png"),
                    cv2.cvtColor(t, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(args.root, "lq", f"img{n:03d}.png"),
                    cv2.cvtColor(lq, cv2.COLOR_RGB2BGR))
        n += 1

    for img in train_imgs:
        h, w = img.shape[:2]
        if min(h, w) >= 256:
            for t in _tiles(img, 256, 128):
                _emit(t)
        else:
            # small sources (320x240 camera shots): whole image, 4-multiple crop
            _emit(img[: h - h % 4, : w - w % 4])
    if args.v2:
        for p in sorted(glob.glob(os.path.join(args.synthetic_gt, "*.png"))):
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            _emit(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    m = 0
    # Source-image id in the val tile NAME so per-image metric grouping
    # (reference protocol: per-image accumulation over a val set,
    # reference image.py:792-922) is derivable by any scorer — see
    # tools/val_bars.py.  Single-image (v1-v3) splits keep img### names.
    val_ids = ["hopper", "darkwood", "tile1", "grass"] if args.v4 else None
    for i, img in enumerate(val_imgs):
        for t in _tiles(img, 256, 256):
            lq = cv2.resize(t, (64, 64), interpolation=cv2.INTER_CUBIC)
            stem = f"{val_ids[i]}_{m:03d}" if val_ids else f"img{m:03d}"
            cv2.imwrite(os.path.join(args.root, "val_gt", f"{stem}.png"),
                        cv2.cvtColor(t, cv2.COLOR_RGB2BGR))
            cv2.imwrite(os.path.join(args.root, "val_lq", f"{stem}.png"),
                        cv2.cvtColor(lq, cv2.COLOR_RGB2BGR))
            m += 1
    print(f"real anchor dataset under {args.root}: {n} train / {m} val tiles")


if __name__ == "__main__":
    main()
