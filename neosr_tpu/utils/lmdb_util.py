"""LMDB dataset creation tooling.

Counterpart of /root/reference/neosr/utils/lmdb_util.py:10-262: builds an
image lmdb with a meta_info.txt of "name.png (h,w,c) compression_level"
lines.  Gated: the `lmdb` package is not in this image; the functions raise
a clear ImportError when it's absent (the disk backend covers training).
"""

from __future__ import annotations

from multiprocessing import Pool
from pathlib import Path

import cv2


def make_lmdb_from_imgs(
    data_path: str,
    lmdb_path: str,
    img_path_list: list[str],
    keys: list[str],
    batch: int = 5000,
    compress_level: int = 1,
    multiprocessing_read: bool = False,
    n_thread: int = 40,
    map_size: int | None = None,
) -> None:
    try:
        import lmdb
    except ImportError as e:
        msg = "lmdb is not installed in this environment; install it to build lmdb datasets"
        raise ImportError(msg) from e

    assert len(img_path_list) == len(keys), "img_path_list and keys should have the same length"
    if not str(lmdb_path).endswith(".lmdb"):
        msg = "lmdb_path must end with '.lmdb'."
        raise ValueError(msg)
    if Path(lmdb_path).exists():
        msg = f"Folder {lmdb_path} already exists. Exit."
        raise FileExistsError(msg)

    def read_img_worker(path: str, key: str, cl: int):
        img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if img.ndim == 2:
            h, w = img.shape
            c = 1
        else:
            h, w, c = img.shape
        _, img_byte = cv2.imencode(".png", img, [cv2.IMWRITE_PNG_COMPRESSION, cl])
        return key, img_byte, (h, w, c)

    dataset: dict[str, bytes] = {}
    shapes: dict[str, tuple] = {}
    if multiprocessing_read:
        with Pool(n_thread) as pool:
            results = [
                pool.apply_async(read_img_worker, (Path(data_path) / p, k, compress_level))
                for p, k in zip(img_path_list, keys)
            ]
            for r in results:
                key, img_byte, shape = r.get()
                dataset[key] = img_byte
                shapes[key] = shape

    if map_size is None:
        img = cv2.imread(str(Path(data_path) / img_path_list[0]), cv2.IMREAD_UNCHANGED)
        _, img_byte = cv2.imencode(".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        map_size = img_byte.nbytes * len(img_path_list) * 10

    env = lmdb.open(str(lmdb_path), map_size=map_size)
    txn = env.begin(write=True)
    txt_file = (Path(lmdb_path) / "meta_info.txt").open("w", encoding="utf-8")
    for idx, (path, key) in enumerate(zip(img_path_list, keys)):
        if multiprocessing_read:
            img_byte = dataset[key]
            h, w, c = shapes[key]
        else:
            _, img_byte, (h, w, c) = read_img_worker(
                Path(data_path) / path, key, compress_level
            )
        txn.put(key.encode("ascii"), img_byte)
        txt_file.write(f"{key}.png ({h},{w},{c}) {compress_level}\n")
        if (idx + 1) % batch == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()
    txt_file.close()
