"""CLI to build LMDB datasets (counterpart of /root/reference/dataset/create_lmdb.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

from neosr_tpu.utils.lmdb_util import make_lmdb_from_imgs
from neosr_tpu.utils.misc import scandir


def create_lmdb(folder_path: str, lmdb_path: str, n_thread: int = 40) -> None:
    img_path_list = sorted(scandir(folder_path, suffix=(".png", ".jpg", ".webp")))
    keys = [str(Path(p).with_suffix("")) for p in img_path_list]
    make_lmdb_from_imgs(
        folder_path, lmdb_path, img_path_list, keys,
        multiprocessing_read=True, n_thread=n_thread,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-input", type=str, required=True, help="image folder")
    parser.add_argument("-output", type=str, required=True, help="output .lmdb path")
    parser.add_argument("-n_thread", type=int, default=40)
    args = parser.parse_args()
    create_lmdb(args.input, args.output, args.n_thread)
