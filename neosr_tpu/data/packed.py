"""Packed paired dataset — native mmap reader, no decode in the hot path.

The TPU-native answer to the reference's LMDB backend: GT/LQ folders are
pre-packed once (tools/pack_dataset.py) into raw uint8 blobs; training reads
only the patch bytes via the C++ packio extension (mmap + row memcpy with
the GIL released), so the 1-core host never decodes PNG/JPEG during
training.  Config:

    [datasets.train]
    type = "paired_packed"
    dataroot_gt = '/data/gt.npack'
    dataroot_lq = '/data/lq.npack'
    patch_size = 48
"""

from __future__ import annotations

from typing import Any

import numpy as np

from neosr_tpu.data.transforms import basic_augment
from neosr_tpu.utils.registry import DATASET_REGISTRY


def _to_array(res) -> np.ndarray:
    buf, h, w, c = res
    return np.frombuffer(buf, np.uint8).reshape(int(h), int(w), int(c))


@DATASET_REGISTRY.register()
class paired_packed:
    def __init__(self, opt: dict[str, Any]) -> None:
        from neosr_tpu._native import get_packio

        self.opt = opt
        packio = get_packio()
        self.gt_pack = packio.Pack(opt["dataroot_gt"])
        self.lq_pack = packio.Pack(opt["dataroot_lq"])
        if len(self.gt_pack) != len(self.lq_pack):
            msg = (
                f"gt pack ({len(self.gt_pack)}) and lq pack ({len(self.lq_pack)}) "
                "have different lengths"
            )
            raise ValueError(msg)
        self.rng = np.random.default_rng(opt.get("seed", None))

    def __getitem__(self, index: int) -> dict[str, Any]:
        return self.fetch(index, self.rng)

    def fetch(self, index: int, rng: np.random.Generator) -> dict[str, Any]:
        """Loader entry point with injected per-position RNG (reproducible,
        device-count-invariant batches; see TrainLoader._fetch)."""
        scale = self.opt["scale"]
        i = index % len(self.gt_pack)

        if self.opt.get("phase") == "train":
            patch = self.opt["patch_size"]
            h, w, _ = self.lq_pack.shape(i)
            top = int(rng.integers(0, max(h - patch, 0) + 1))
            left = int(rng.integers(0, max(w - patch, 0) + 1))
            img_lq = _to_array(self.lq_pack.read_crop(i, top, left, patch, patch))
            img_gt = _to_array(
                self.gt_pack.read_crop(
                    i, top * scale, left * scale, patch * scale, patch * scale
                )
            )
            # stay uint8: the jitted train step normalizes integer batches
            # on device (models/image.py train_step), so the host->device
            # copy is 4x smaller — this matters over slow links and for
            # multi-host feeds.
            img_gt, img_lq = basic_augment(
                [img_gt, img_lq],
                self.opt.get("use_hflip", True),
                self.opt.get("use_rot", True),
                rng,
            )
        else:
            img_lq = _to_array(self.lq_pack.read(i)).astype(np.float32) / 255.0
            img_gt = _to_array(self.gt_pack.read(i)).astype(np.float32) / 255.0
            h, w = img_lq.shape[:2]
            img_gt = img_gt[: h * scale, : w * scale, :]

        if self.opt.get("color") == "y" and img_gt.shape[-1] == 3:
            # packs store RGB; BT.601 luma matches cv2 RGB2GRAY (the
            # reference img2tensor color=False path)
            coef = np.asarray([0.299, 0.587, 0.114], img_gt.dtype
                              if img_gt.dtype != np.uint8 else np.float32)
            img_gt = (img_gt.astype(np.float32) @ coef)[..., None]
            img_lq = (img_lq.astype(np.float32) @ coef)[..., None]
            if self.opt.get("phase") == "train":
                img_gt = np.clip(np.rint(img_gt), 0, 255).astype(np.uint8)
                img_lq = np.clip(np.rint(img_lq), 0, 255).astype(np.uint8)

        return {
            "lq": np.ascontiguousarray(img_lq),
            "gt": np.ascontiguousarray(img_gt),
            "lq_path": f"pack:{i}",
            "gt_path": f"pack:{i}",
        }

    def __len__(self) -> int:
        return len(self.gt_pack)
