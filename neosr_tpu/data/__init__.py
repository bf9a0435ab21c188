"""Dataset/dataloader builders (registry dispatch).

Counterpart of /root/reference/neosr/data/__init__.py:21-136, minus torch:
`build_dataloader` returns the threaded TrainLoader / EvalLoader.
"""

from __future__ import annotations

import importlib
import os
from copy import deepcopy
from os import path as osp
from typing import Any

from neosr_tpu.data.loader import EnlargedSampler, EvalLoader, TrainLoader
from neosr_tpu.utils.logger import get_root_logger
from neosr_tpu.utils.misc import scandir
from neosr_tpu.utils.registry import DATASET_REGISTRY

__all__ = [
    "EnlargedSampler",
    "EvalLoader",
    "TrainLoader",
    "build_dataloader",
    "build_dataset",
]

_data_folder = osp.dirname(osp.abspath(__file__))
_skip = {"__init__", "loader", "transforms", "file_client", "data_util", "degradations", "otf_device", "augmentations"}
_dataset_modules = sorted(
    osp.splitext(osp.basename(f))[0]
    for f in scandir(_data_folder, suffix=".py")
    if osp.splitext(osp.basename(f))[0] not in _skip
)
for _m in _dataset_modules:
    importlib.import_module(f"neosr_tpu.data.{_m}")


def build_dataset(dataset_opt: dict[str, Any]):
    dataset_opt = deepcopy(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt["type"])(dataset_opt)
    logger = get_root_logger()
    logger.info(
        f"Dataset [{dataset.__class__.__name__}] - {dataset_opt.get('name', dataset_opt['type'])} is built."
    )
    return dataset


def build_dataloader(
    dataset: Any,
    dataset_opt: dict[str, Any],
    num_devices: int = 1,
    dist: bool = False,
    sampler: EnlargedSampler | None = None,
    seed: int | None = None,
):
    phase = dataset_opt["phase"]
    if phase == "train":
        # global batch = per-config batch * local devices (reference multiplies
        # batch by num_gpu in non-dist mode, data/__init__.py:70-79)
        batch_size = dataset_opt["batch_size"] * max(num_devices, 1)
        num_workers = dataset_opt.get("num_worker_per_gpu", "auto")
        if num_workers == "auto":
            num_workers = min(8, (os.cpu_count() or 1) * 2)
        if sampler is None:
            sampler = EnlargedSampler(
                len(dataset), 1, 0,
                dataset_opt.get("dataset_enlarge_ratio", 1), seed or 0,
            )
        return TrainLoader(
            dataset,
            batch_size=batch_size,
            sampler=sampler,
            num_workers=int(num_workers),
            prefetch_depth=dataset_opt.get("prefetch_depth", 2),
            drop_last=True,
            seed=seed or 0,
        )
    if phase in {"val", "test"}:
        return EvalLoader(dataset)
    msg = f"Wrong dataset phase: {phase}. Supported: 'train', 'val' and 'test'."
    raise ValueError(msg)
