"""OTF (on-the-fly degradation) dataset — GT images + per-sample blur kernels.

Behavioral counterpart of /root/reference/neosr/data/otf_dataset.py:27-264:
loads GT only (rejects dataroot_lq), hflip/rot augments, center-crops/pads to
a fixed 512 canvas, and synthesizes three kernels per sample on the host:
first/second-stage mixed or sinc kernels (padded to 21) and a final sinc (or
pulse) kernel.  The expensive degradation math runs on device
(data/otf_device.py).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

from neosr_tpu.data.data_util import paths_from_folder
from neosr_tpu.data.degradations import (
    circular_lowpass_kernel,
    pulse_tensor,
    random_mixed_kernels,
)
from neosr_tpu.data.file_client import FileClient
from neosr_tpu.data.transforms import basic_augment
from neosr_tpu.utils.img_util import imfrombytes
from neosr_tpu.utils.registry import DATASET_REGISTRY

DEFAULT_GT_SIZE = 512  # reference hard-codes 512 (otf_dataset.py:165-187)


@DATASET_REGISTRY.register()
class otf:
    def __init__(self, opt: dict[str, Any]) -> None:
        self.opt = opt
        if opt.get("dataroot_lq") is not None:
            msg = "'dataroot_lq' is not supported by otf, only 'dataroot_gt'."
            raise ValueError(msg)
        self.file_client: FileClient | None = None
        self.io_backend_opt = dict(opt.get("io_backend", {"type": "disk"}))
        self.gt_folder = opt["dataroot_gt"]
        if self.io_backend_opt.get("type") == "lmdb":
            from neosr_tpu.data.data_util import paths_from_lmdb

            self.io_backend_opt["db_paths"] = [self.gt_folder]
            self.io_backend_opt["client_keys"] = ["gt"]
            self.paths = paths_from_lmdb(self.gt_folder)
        elif opt.get("meta_info") or opt.get("meta_info_file"):
            mi = opt.get("meta_info_file") or opt["meta_info"]
            with open(mi, encoding="utf-8") as fin:
                import os.path as osp

                self.paths = [osp.join(self.gt_folder, line.rstrip()) for line in fin]
        else:
            self.paths = paths_from_folder(self.gt_folder)

        # kernel settings (reference otf_dataset.py:66-112)
        self.blur_kernel_size = opt.get("blur_kernel_size", 21)
        self.kernel_list = opt.get("kernel_list", ["iso", "aniso"])
        self.kernel_prob = opt.get("kernel_prob", [0.5, 0.5])
        self.blur_sigma = opt.get("blur_sigma", [0.2, 3.0])
        self.betag_range = opt.get("betag_range", [0.5, 4.0])
        self.betap_range = opt.get("betap_range", [1.0, 2.0])
        self.sinc_prob = opt.get("sinc_prob", 0.0)

        self.blur_kernel_size2 = opt.get("blur_kernel_size2", 21)
        self.kernel_list2 = opt.get("kernel_list2", ["iso", "aniso"])
        self.kernel_prob2 = opt.get("kernel_prob2", [0.5, 0.5])
        self.blur_sigma2 = opt.get("blur_sigma2", [0.2, 1.5])
        self.betag_range2 = opt.get("betag_range2", [0.5, 4.0])
        self.betap_range2 = opt.get("betap_range2", [1.0, 2.0])
        self.sinc_prob2 = opt.get("sinc_prob2", 0.0)

        self.final_sinc_prob = opt.get("final_sinc_prob", 0.0)

        self.gt_size = opt.get("gt_size", DEFAULT_GT_SIZE)
        self.kernel_range = [2 * v + 1 for v in range(3, 11)]  # 7..21 odd
        self.rng = np.random.default_rng(opt.get("seed", None))

    def _stage_kernel(
        self, rng: np.random.Generator, size: int, sinc_prob: float,
        klist, kprob, sigma, betag, betap,
    ) -> np.ndarray:
        kernel_size = int(rng.choice(self.kernel_range))
        if rng.uniform() < sinc_prob:
            omega_c = (
                rng.uniform(np.pi / 3, np.pi)
                if kernel_size < 13
                else rng.uniform(np.pi / 5, np.pi)
            )
            kernel = circular_lowpass_kernel(omega_c, kernel_size, pad_to=0)
        else:
            kernel = random_mixed_kernels(
                klist, kprob, kernel_size,
                sigma, sigma, (-np.pi, np.pi), betag, betap,
                rng=rng,
            )
        pad = (21 - kernel_size) // 2
        return np.pad(kernel, ((pad, pad), (pad, pad))).astype(np.float32)

    def __getitem__(self, index: int) -> dict[str, Any]:
        return self.fetch(index, self.rng)

    def fetch(self, index: int, rng: np.random.Generator) -> dict[str, Any]:
        """Loader entry point with injected per-position RNG (reproducible,
        device-count-invariant batches; see TrainLoader._fetch)."""
        if self.file_client is None:
            io_opt = dict(self.io_backend_opt)
            self.file_client = FileClient(io_opt.pop("type", "disk"), **io_opt)

        gt_path = self.paths[index % len(self.paths)]
        retry = 3
        img_gt = None
        # keep uint8 end-to-end: the device-side degradation graph
        # normalizes in-graph, so the host->device copy is 4x smaller
        while retry > 0:
            try:
                img_bytes = self.file_client.get(gt_path, "gt")
                img_gt = imfrombytes(img_bytes, float32=False)[..., ::-1]  # RGB
                break
            except Exception:
                retry -= 1
                if retry <= 0:
                    # random substitute (reference otf_dataset.py:136-154)
                    gt_path = self.paths[int(rng.integers(0, len(self.paths)))]
                    img_bytes = self.file_client.get(gt_path, "gt")
                    img_gt = imfrombytes(img_bytes, float32=False)[..., ::-1]
                    break
                time.sleep(1)

        img_gt = basic_augment(
            img_gt, self.opt.get("use_hflip", True), self.opt.get("use_rot", True),
            rng,
        )

        # crop or pad to the fixed canvas (reference otf_dataset.py:165-187)
        gs = self.gt_size
        h, w = img_gt.shape[:2]
        if h < gs or w < gs:
            pad_h = max(0, gs - h)
            pad_w = max(0, gs - w)
            img_gt = np.pad(img_gt, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        h, w = img_gt.shape[:2]
        if h > gs or w > gs:
            top = int(rng.integers(0, h - gs + 1))
            left = int(rng.integers(0, w - gs + 1))
            img_gt = img_gt[top : top + gs, left : left + gs, ...]

        kernel1 = self._stage_kernel(
            rng, self.blur_kernel_size, self.sinc_prob, self.kernel_list,
            self.kernel_prob, self.blur_sigma, self.betag_range, self.betap_range,
        )
        kernel2 = self._stage_kernel(
            rng, self.blur_kernel_size2, self.sinc_prob2, self.kernel_list2,
            self.kernel_prob2, self.blur_sigma2, self.betag_range2, self.betap_range2,
        )

        if rng.uniform() < self.final_sinc_prob:
            kernel_size = int(rng.choice(self.kernel_range))
            omega_c = rng.uniform(np.pi / 3, np.pi)
            sinc_kernel = circular_lowpass_kernel(omega_c, kernel_size, pad_to=21)
        else:
            sinc_kernel = pulse_tensor(21)

        return {
            "gt": np.ascontiguousarray(img_gt, dtype=np.uint8),
            "kernel1": kernel1,
            "kernel2": kernel2,
            "sinc_kernel": sinc_kernel.astype(np.float32),
            "gt_path": gt_path,
        }

    def __len__(self) -> int:
        return len(self.paths)
