"""Path-pairing utilities for paired/single datasets.

Counterpart of /root/reference/neosr/data/data_util.py:7-212 (folder scan,
meta-info file, lmdb meta) with the same pairing conventions: LQ filenames
may carry a suffix (filename_tmpl), pairs are matched by sorted basename.
"""

from __future__ import annotations

from os import path as osp
from pathlib import Path

from neosr_tpu.utils.misc import scandir


def paired_paths_from_folder(
    folders: list[str], keys: list[str], filename_tmpl: str = "{}"
) -> list[dict[str, str]]:
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    if len(input_paths) != len(gt_paths):
        msg = (
            f"{input_key} and {gt_key} datasets have different number of images: "
            f"{len(input_paths)}, {len(gt_paths)}."
        )
        raise ValueError(msg)
    paths = []
    for gt_path in sorted(gt_paths):
        basename, ext = osp.splitext(osp.basename(gt_path))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        input_path = osp.join(input_folder, input_name)
        if input_name not in input_paths:
            # fall back: allow differing extensions
            candidates = [p for p in input_paths if osp.splitext(p)[0] == filename_tmpl.format(basename)]
            if not candidates:
                msg = f"{input_name} is not in {input_key}_paths."
                raise FileNotFoundError(msg)
            input_path = osp.join(input_folder, candidates[0])
        paths.append({
            f"{input_key}_path": input_path,
            f"{gt_key}_path": osp.join(gt_folder, gt_path),
        })
    return paths


def paired_paths_from_meta_info_file(
    folders: list[str], keys: list[str], meta_info_file: str, filename_tmpl: str = "{}"
) -> list[dict[str, str]]:
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys

    with Path(meta_info_file).open(encoding="utf-8") as fin:
        gt_names = [line.strip().split(" ")[0] for line in fin if line.strip()]

    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append({
            f"{input_key}_path": osp.join(input_folder, input_name),
            f"{gt_key}_path": osp.join(gt_folder, gt_name),
        })
    return paths


def paths_from_folder(folder: str) -> list[str]:
    return [osp.join(folder, p) for p in sorted(scandir(folder))]


def paths_from_lmdb(folder: str) -> list[str]:
    if not str(folder).endswith(".lmdb"):
        msg = f"Folder {folder} should in lmdb format."
        raise ValueError(msg)
    with (Path(folder) / "meta_info.txt").open(encoding="utf-8") as fin:
        return [line.split(".")[0] for line in fin if line.strip()]
