"""Small runtime helpers (dirs, scanning, seeding, formatting).

Covers the same ground as /root/reference/neosr/utils/misc.py:15-185 with a
JAX-first seeding story: there is no global RNG — `seed_root_key` just builds
the root `jax.random` key that the trainer threads through every step.
"""

from __future__ import annotations

import os
import random
import shutil
import time
from os import path as osp
from pathlib import Path
from typing import Any, Generator

import numpy as np


class tc:
    """ANSI terminal colors."""

    end = "\033[0m"
    bold = "\033[1m"
    red = "\033[91m"
    green = "\033[92m"
    yellow = "\033[93m"
    light_blue = "\033[94m"
    console_log = "\033[90m"


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs (python / numpy). Device RNG is key-threaded."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ.setdefault("PYTHONHASHSEED", str(seed))


def get_time_str() -> str:
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str | Path) -> None:
    """mkdir; if exists, archive the old one with a timestamp suffix."""
    path = Path(path)
    if path.exists():
        new_name = str(path) + "_archived_" + get_time_str()
        print(f"Path already exists. Renaming it to {new_name}", flush=True)
        path.rename(new_name)
    path.mkdir(parents=True, exist_ok=True)


def make_exp_dirs(opt: dict[str, Any]) -> None:
    """Create experiment directory tree (models/, training_states/, ...)."""
    path_opt = dict(opt["path"])
    if opt["is_train"]:
        mkdir_and_rename(path_opt.pop("experiments_root"))
    else:
        mkdir_and_rename(path_opt.pop("results_root"))
    for key, p in path_opt.items():
        if ("strict_load" in key) or ("pretrain_network" in key) or ("resume" in key) or ("param_key" in key):
            continue
        if p is not None:
            Path(p).mkdir(parents=True, exist_ok=True)


def scandir(
    dir_path: str | Path,
    suffix: str | tuple[str, ...] | None = None,
    recursive: bool = False,
    full_path: bool = False,
) -> Generator[str, None, None]:
    """Scan a directory for files, optionally filtered by suffix."""
    root = str(dir_path)

    def _scandir(dir_path: str, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith(".") and entry.is_file():
                rel = entry.path if full_path else osp.relpath(entry.path, root)
                if suffix is None or rel.endswith(suffix):
                    yield rel
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix, recursive)

    return _scandir(str(dir_path), suffix, recursive)


def check_disk_space(path: str | Path = ".", min_free_mb: int = 500) -> bool:
    """True if the filesystem holding `path` has >= min_free_mb free."""
    try:
        usage = shutil.disk_usage(str(path))
    except OSError:
        return True
    return usage.free >= min_free_mb * 1024 * 1024


def sizeof_fmt(size: float, suffix: str = "B") -> str:
    for unit in ("", "K", "M", "G", "T", "P", "E", "Z"):
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"


def check_resume(opt: dict[str, Any], resume_iter: int) -> None:
    """Rewire pretrain paths to the resumed iteration's saved networks.

    Mirrors the contract of the reference's check_resume
    (/root/reference/neosr/utils/misc.py:131-165): when resuming, any
    configured pretrain paths are replaced by experiments/<name>/models/
    net_{g,d}_<iter> checkpoints.
    """
    if not opt["path"].get("resume_state"):
        return
    networks = [key for key in opt if key.startswith("network_")]
    flag_pretrain = any(opt["path"].get(f"pretrain_{n}") for n in networks)
    if flag_pretrain:
        print("pretrain_network paths will be ignored during resuming.", flush=True)
    for network in networks:
        name = f"pretrain_{network}"
        basename = network.replace("network_", "")
        if opt["path"].get("ignore_resume_networks") is None or (
            network not in opt["path"]["ignore_resume_networks"]
        ):
            opt["path"][name] = str(
                Path(opt["path"]["models"]) / f"net_{basename}_{resume_iter}.ckpt"
            )
        opt["path"][f"param_key_{basename}"] = "params"
