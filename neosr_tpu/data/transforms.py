"""Host-side crop/augment transforms (numpy, HWC RGB float32).

Behavioral counterpart of /root/reference/neosr/data/transforms.py:14-192
(mod_crop, paired_random_crop, hflip/rot augmentation), numpy-only — device
work happens in jitted fns elsewhere.
"""

from __future__ import annotations

import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H/W to multiples of `scale`."""
    h, w = img.shape[:2]
    h_r, w_r = h % scale, w % scale
    return img[: h - h_r if h_r else h, : w - w_r if w_r else w, ...]


def paired_random_crop(
    img_gts: np.ndarray | list[np.ndarray],
    img_lqs: np.ndarray | list[np.ndarray],
    patch_size: int,
    scale: int,
    rng: np.random.Generator | None = None,
) -> tuple:
    """Random aligned crop: LQ patch `patch_size`, GT patch `patch_size*scale`."""
    if rng is None:
        rng = np.random.default_rng()
    squeeze_gt = not isinstance(img_gts, list)
    squeeze_lq = not isinstance(img_lqs, list)
    gts = [img_gts] if squeeze_gt else img_gts
    lqs = [img_lqs] if squeeze_lq else img_lqs

    h_lq, w_lq = lqs[0].shape[:2]
    h_gt, w_gt = gts[0].shape[:2]
    gt_patch_size = patch_size * scale

    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        msg = (
            f"Scale mismatches. GT ({h_gt}, {w_gt}) is not {scale}x "
            f"multiplication of LQ ({h_lq}, {w_lq})."
        )
        raise ValueError(msg)
    if h_lq < patch_size or w_lq < patch_size:
        msg = (
            f"LQ ({h_lq}, {w_lq}) is smaller than patch size "
            f"({patch_size}, {patch_size})."
        )
        raise ValueError(msg)

    top = int(rng.integers(0, h_lq - patch_size + 1))
    left = int(rng.integers(0, w_lq - patch_size + 1))
    lqs = [v[top : top + patch_size, left : left + patch_size, ...] for v in lqs]
    top_gt, left_gt = top * scale, left * scale
    gts = [
        v[top_gt : top_gt + gt_patch_size, left_gt : left_gt + gt_patch_size, ...]
        for v in gts
    ]
    if squeeze_gt:
        gts = gts[0]
    if squeeze_lq:
        lqs = lqs[0]
    return gts, lqs


def basic_augment(
    imgs: np.ndarray | list[np.ndarray],
    hflip: bool = True,
    rotation: bool = True,
    rng: np.random.Generator | None = None,
    return_status: bool = False,
):
    """Random horizontal flip / vertical flip / 90-degree rotation."""
    if rng is None:
        rng = np.random.default_rng()
    do_hflip = hflip and rng.random() < 0.5
    do_vflip = rotation and rng.random() < 0.5
    do_rot90 = rotation and rng.random() < 0.5

    def _augment(img: np.ndarray) -> np.ndarray:
        if do_hflip:
            img = img[:, ::-1, ...]
        if do_vflip:
            img = img[::-1, :, ...]
        if do_rot90:
            img = np.transpose(img, (1, 0, 2)) if img.ndim == 3 else img.T
        return np.ascontiguousarray(img)

    squeeze = not isinstance(imgs, list)
    out = [_augment(v) for v in ([imgs] if squeeze else imgs)]
    if squeeze:
        out = out[0]
    if return_status:
        return out, (do_hflip, do_vflip, do_rot90)
    return out
