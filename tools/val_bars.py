"""Per-image + overall bicubic bars for a paired val split.

Reproduces the reference val protocol (per-image metric accumulation over
a val set, reference neosr/models/image.py:792-922; Y-channel, crop 4)
for the bicubic-upsample baseline, grouping val tiles by the source-image
prefix in their filename (``<source>_<idx>.png``; prefixless ``img###``
splits report a single group).  This is the ONLY sanctioned way to quote
a bicubic bar for an anchor split: the numbers in options/anchors/*.toml
comments and options/anchors/README.md must be reproducible by running

    python tools/val_bars.py --root /tmp/anchor_real4

against the split actually used for training.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neosr_tpu.metrics.calculate import calculate_psnr, calculate_ssim  # noqa: E402


def compute_bars(root: str, crop_border: int = 4,
                 y_channel: bool = True) -> dict[str, tuple[float, float, int]]:
    """Return {group: (psnr, ssim, n_tiles)} plus an 'OVERALL' entry
    (tile-weighted mean over all tiles, matching train.py's val loop)."""
    names = sorted(os.listdir(os.path.join(root, "val_gt")))
    groups: dict[str, list[tuple[float, float]]] = defaultdict(list)
    for name in names:
        # calculate_psnr/ssim take RGB (rgb2ycbcr Y transform, matching the
        # val pipeline where tensor2img(rgb2bgr=False) feeds them) — convert
        # from cv2's BGR or the R/B luma weights swap and near-saturated
        # reddish textures (darkwood) score ~4 dB off.
        gt = cv2.cvtColor(cv2.imread(os.path.join(root, "val_gt", name)),
                          cv2.COLOR_BGR2RGB)
        lq = cv2.cvtColor(cv2.imread(os.path.join(root, "val_lq", name)),
                          cv2.COLOR_BGR2RGB)
        h, w = gt.shape[:2]
        up = cv2.resize(lq, (w, h), interpolation=cv2.INTER_CUBIC)
        p = calculate_psnr(up, gt, crop_border=crop_border,
                           test_y_channel=y_channel)
        s = calculate_ssim(up, gt, crop_border=crop_border,
                           test_y_channel=y_channel)
        key = name.rsplit("_", 1)[0] if "_" in name else "img"
        groups[key].append((float(p), float(s)))
    out = {}
    allv = [v for vs in groups.values() for v in vs]
    for key, vs in sorted(groups.items()):
        out[key] = (float(np.mean([v[0] for v in vs])),
                    float(np.mean([v[1] for v in vs])), len(vs))
    out["OVERALL"] = (float(np.mean([v[0] for v in allv])),
                      float(np.mean([v[1] for v in allv])), len(allv))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/anchor_real4")
    args = ap.parse_args()
    for key, (p, s, n) in compute_bars(args.root).items():
        print(f"{key:10s} {p:.4f} / {s:.4f}  ({n} tiles)")


if __name__ == "__main__":
    main()
