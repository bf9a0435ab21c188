"""Build a deterministically degraded LQ side for an existing val split.

The flagship recipe (esrgan_otf: Real-ESRGAN-style synthesized degradations,
reference otf.py:92-283) targets degraded inputs, while the anchor val LQ is
clean bicubic — models trained under the full degradation profile pay a PSNR
penalty there by design.  This tool adds a second val view of the SAME GT
tiles behind a fixed classical degradation chain (the standard Real-ESRGAN
evaluation regime): gaussian blur -> bicubic x4 down -> gaussian noise ->
JPEG.  Deterministic (seeded per tile index), so every run and every arch is
judged on identical degraded inputs.

Prints the bicubic-upsample baseline (PSNR/SSIM, Y channel, crop_border 4 —
the same protocol as every anchor) for the degraded split, which is the bar
flagship runs are judged against on val_2.

Usage: python tools/make_degraded_val.py [--root /tmp/anchor_real3]
"""

from __future__ import annotations

import argparse
import glob
import os

import cv2
import numpy as np


def degrade(gt: np.ndarray, rng: np.random.Generator, scale: int = 4) -> np.ndarray:
    """gt uint8 HWC BGR -> degraded LQ uint8 (h/scale, w/scale)."""
    img = gt.astype(np.float32) / 255.0
    sigma = 1.2
    img = cv2.GaussianBlur(img, (7, 7), sigma)
    h, w = img.shape[:2]
    img = cv2.resize(img, (w // scale, h // scale), interpolation=cv2.INTER_CUBIC)
    img = img + rng.normal(0.0, 5.0 / 255.0, img.shape).astype(np.float32)
    img = np.clip(img, 0.0, 1.0)
    lq = (img * 255.0).round().astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", lq, [cv2.IMWRITE_JPEG_QUALITY, 60])
    assert ok
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/anchor_real3")
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    gt_dir = os.path.join(args.root, "val_gt")
    out_dir = os.path.join(args.root, "val_deg_lq")
    os.makedirs(out_dir, exist_ok=True)

    from neosr_tpu.metrics.calculate import calculate_psnr, calculate_ssim

    psnrs, ssims = [], []
    for i, p in enumerate(sorted(glob.glob(os.path.join(gt_dir, "*.png")))):
        gt = cv2.imread(p, cv2.IMREAD_COLOR)
        rng = np.random.default_rng(1000 + i)
        lq = degrade(gt, rng, args.scale)
        cv2.imwrite(os.path.join(out_dir, os.path.basename(p)), lq)
        up = cv2.resize(
            lq, (gt.shape[1], gt.shape[0]), interpolation=cv2.INTER_CUBIC
        )
        # metrics take RGB float/uint8 HWC; BGR channel swap is irrelevant
        # for Y-channel PSNR/SSIM only if done consistently — swap both
        gt_rgb, up_rgb = gt[..., ::-1], up[..., ::-1]
        psnrs.append(calculate_psnr(up_rgb, gt_rgb, crop_border=4, test_y_channel=True))
        ssims.append(calculate_ssim(up_rgb, gt_rgb, crop_border=4, test_y_channel=True))
    print(
        f"degraded val under {out_dir}: {len(psnrs)} tiles; bicubic-upsample "
        f"baseline PSNR {np.mean(psnrs):.4f} / SSIM {np.mean(ssims):.4f} "
        "(Y, crop_border 4)"
    )


if __name__ == "__main__":
    main()
