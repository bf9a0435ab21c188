"""Regenerate the synthetic quality-anchor dataset (BENCH_NOTES anchors).

220 structured synthetic 256x256 GT images (multi-scale smoothed noise +
geometric shapes + sharp edges -> natural-ish spectra so SR has real
structure to learn), bicubic x4 LQ, 200 train / 20 val split, written as
PNG folders; optionally packed to uint8 .npack via tools/pack_dataset.py.

Deterministic (seed 42): reproduces the exact dataset behind the span /
realplksr_s / GAN anchors in BENCH_NOTES (and experiments/anchors/*.toml).

Usage: python tools/make_anchor_dataset.py [--root /tmp/anchor]
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np


def make_img(rng: np.random.Generator) -> np.ndarray:
    h = w = 256
    img = np.zeros((h, w, 3), np.float32)
    for blur, amp in ((65, 0.5), (17, 0.3), (5, 0.15), (0, 0.05)):
        n = rng.random((h, w, 3)).astype(np.float32)
        if blur:
            n = cv2.GaussianBlur(n, (blur | 1, blur | 1), blur / 3)
            n = (n - n.min()) / (np.ptp(n) + 1e-6)
        img += amp * n
    for _ in range(rng.integers(5, 15)):
        color = rng.random(3).tolist()
        kind = rng.integers(0, 3)
        p1 = tuple(int(v) for v in rng.integers(0, 256, 2))
        p2 = tuple(int(v) for v in rng.integers(0, 256, 2))
        if kind == 0:
            cv2.rectangle(img, p1, p2, color, thickness=int(rng.integers(1, 4)))
        elif kind == 1:
            cv2.circle(img, p1, int(rng.integers(5, 60)), color,
                       thickness=-1 if rng.random() < 0.5 else 2)
        else:
            cv2.line(img, p1, p2, color, thickness=int(rng.integers(1, 3)))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/anchor")
    args = ap.parse_args()
    rng = np.random.default_rng(42)
    for sub in ("gt", "lq", "val_gt", "val_lq"):
        os.makedirs(os.path.join(args.root, sub), exist_ok=True)
    for i in range(220):
        gt = make_img(rng)
        lq = cv2.resize(gt, (64, 64), interpolation=cv2.INTER_CUBIC)
        sub = "" if i < 200 else "val_"
        cv2.imwrite(os.path.join(args.root, f"{sub}gt", f"img{i:03d}.png"), gt)
        cv2.imwrite(os.path.join(args.root, f"{sub}lq", f"img{i:03d}.png"), lq)
    print(f"anchor dataset written under {args.root}")


if __name__ == "__main__":
    main()
