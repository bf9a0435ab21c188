"""Paired LQ/GT dataset.

Behavioral counterpart of /root/reference/neosr/data/paired_dataset.py:25-171:
folder / meta-info / lmdb sources, train-time aligned random crop at
`patch_size` plus hflip/rot augmentation, val-time GT mod-crop to LQ*scale.
Emits HWC RGB float32 [0,1] numpy arrays (the loader stacks them to NHWC).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

from neosr_tpu.data.data_util import (
    paired_paths_from_folder,
    paired_paths_from_meta_info_file,
)
from neosr_tpu.data.file_client import FileClient
from neosr_tpu.data.transforms import basic_augment, paired_random_crop
from neosr_tpu.utils.img_util import imfrombytes
from neosr_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class paired:
    def __init__(self, opt: dict[str, Any]) -> None:
        self.opt = opt
        self.file_client: FileClient | None = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        # "uint8" ships raw bytes to the device (4x smaller copies; the
        # jitted train/eval graphs normalize in-graph).  Incompatible with
        # host-side mean/std normalization, so it falls back when set.
        self.out_dtype = opt.get("out_dtype", "float32")
        if self.mean is not None or self.std is not None:
            self.out_dtype = "float32"
        self.gt_folder = opt["dataroot_gt"]
        self.lq_folder = opt["dataroot_lq"]
        self.filename_tmpl = opt.get("filename_tmpl", "{}")

        backend = self.io_backend_opt.get("type", "disk")
        if backend == "lmdb":
            self.io_backend_opt["db_paths"] = [self.lq_folder, self.gt_folder]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]
            from neosr_tpu.data.data_util import paths_from_lmdb

            lq_names = paths_from_lmdb(self.lq_folder)
            self.paths = [
                {"lq_path": name, "gt_path": name} for name in lq_names
            ]
        elif opt.get("meta_info") or opt.get("meta_info_file"):
            # the reference gates on `meta_info` but reads the path from
            # `meta_info_file` (paired_dataset.py:76-82); accept either
            self.paths = paired_paths_from_meta_info_file(
                [self.lq_folder, self.gt_folder], ["lq", "gt"],
                opt.get("meta_info_file") or opt["meta_info"],
                self.filename_tmpl,
            )
        else:
            self.paths = paired_paths_from_folder(
                [self.lq_folder, self.gt_folder], ["lq", "gt"], self.filename_tmpl
            )
        self.rng = np.random.default_rng(opt.get("seed", None))

    def _read(self, path: str, client_key: str) -> np.ndarray:
        assert self.file_client is not None
        retry = 3
        while retry > 0:
            try:
                img_bytes = self.file_client.get(path, client_key)
                img = imfrombytes(img_bytes, float32=(self.out_dtype == "float32"))
                if self.opt.get("color") == "y":
                    # grayscale (luma) training, reference img2tensor
                    # color=False path (img_util.py:42-48)
                    import cv2

                    return cv2.cvtColor(
                        np.ascontiguousarray(img), cv2.COLOR_BGR2GRAY
                    )[..., None]
                return img[..., ::-1]  # BGR -> RGB
            except Exception:
                retry -= 1
                if retry <= 0:
                    raise
                time.sleep(1)
        raise RuntimeError("unreachable")

    def __getitem__(self, index: int) -> dict[str, Any]:
        return self.fetch(index, self.rng)

    def fetch(self, index: int, rng: np.random.Generator) -> dict[str, Any]:
        """Loader entry point: sample randomness comes from the injected
        per-stream-position `rng` (see TrainLoader._fetch), keeping batches
        reproducible and device-count invariant."""
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type", "disk"), **io_opt)

        scale = self.opt["scale"]
        paths = self.paths[index % len(self.paths)]
        img_gt = self._read(paths["gt_path"], "gt")
        img_lq = self._read(paths["lq_path"], "lq")

        if self.opt["phase"] == "train":
            patch_size = self.opt["patch_size"]
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, patch_size, scale, rng)
            img_gt, img_lq = basic_augment(
                [img_gt, img_lq],
                self.opt.get("use_hflip", True),
                self.opt.get("use_rot", True),
                rng,
            )
        else:
            # crop GT to match LQ*scale (mod-crop convention)
            h, w = img_lq.shape[:2]
            img_gt = img_gt[: h * scale, : w * scale, :]

        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean or 0.0, dtype=np.float32)
            std = np.asarray(self.std or 1.0, dtype=np.float32)
            img_gt = (img_gt - mean) / std
            img_lq = (img_lq - mean) / std

        dt = np.uint8 if self.out_dtype == "uint8" else np.float32
        return {
            "lq": np.ascontiguousarray(img_lq, dtype=dt),
            "gt": np.ascontiguousarray(img_gt, dtype=dt),
            "lq_path": paths["lq_path"],
            "gt_path": paths["gt_path"],
        }

    def __len__(self) -> int:
        return len(self.paths)
