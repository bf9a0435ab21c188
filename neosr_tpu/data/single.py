"""LQ-only dataset for inference.

Counterpart of /root/reference/neosr/data/single_dataset.py:13-85.
"""

from __future__ import annotations

from os import path as osp
from typing import Any

import numpy as np

from neosr_tpu.data.data_util import paths_from_folder
from neosr_tpu.data.file_client import FileClient
from neosr_tpu.utils.img_util import imfrombytes
from neosr_tpu.utils.registry import DATASET_REGISTRY


@DATASET_REGISTRY.register()
class single:
    def __init__(self, opt: dict[str, Any]) -> None:
        self.opt = opt
        self.file_client: FileClient | None = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.mean = opt.get("mean")
        self.std = opt.get("std")
        self.lq_folder = opt["dataroot_lq"]

        if self.io_backend_opt.get("type") == "lmdb":
            from neosr_tpu.data.data_util import paths_from_lmdb

            self.io_backend_opt["db_paths"] = [self.lq_folder]
            self.io_backend_opt["client_keys"] = ["lq"]
            self.paths = paths_from_lmdb(self.lq_folder)
        elif self.opt.get("meta_info") or self.opt.get("meta_info_file"):
            mi = self.opt.get("meta_info_file") or self.opt["meta_info"]
            with open(mi, encoding="utf-8") as fin:
                self.paths = [
                    osp.join(self.lq_folder, line.rstrip()) for line in fin if line.strip()
                ]
        else:
            self.paths = paths_from_folder(self.lq_folder)

    def __getitem__(self, index: int) -> dict[str, Any]:
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type", "disk"), **io_opt)

        lq_path = self.paths[index]
        img_bytes = self.file_client.get(lq_path, "lq")
        img_lq = imfrombytes(img_bytes, float32=True)
        if self.opt.get("color") == "y":
            import cv2

            img_lq = cv2.cvtColor(
                np.ascontiguousarray(img_lq), cv2.COLOR_BGR2GRAY)[..., None]
        else:
            img_lq = img_lq[..., ::-1]  # BGR -> RGB

        if self.mean is not None or self.std is not None:
            mean = np.asarray(self.mean or 0.0, dtype=np.float32)
            std = np.asarray(self.std or 1.0, dtype=np.float32)
            img_lq = (img_lq - mean) / std

        return {
            "lq": np.ascontiguousarray(img_lq, dtype=np.float32),
            "lq_path": lq_path,
        }

    def __len__(self) -> int:
        return len(self.paths)
