"""Pack an image folder into a .npack file for the native mmap reader.

Decodes every image ONCE (cv2) and stores raw uint8 HWC blobs with an
index; training then reads crops via neosr_tpu._native.packio with no
decode cost.  Counterpart role to the reference's create_lmdb.py.

Usage:
    python tools/pack_dataset.py -input /data/gt -output /data/gt.npack
"""

from __future__ import annotations

import argparse
import struct
from pathlib import Path

import cv2
import numpy as np


def pack_folder(folder: str, output: str) -> None:
    paths = sorted(
        p for p in Path(folder).rglob("*")
        if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    )
    if not paths:
        msg = f"no images found under {folder}"
        raise FileNotFoundError(msg)

    entries = []
    offset = 0
    shapes = []
    for p in paths:
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)
        if img is None:
            msg = f"failed to decode {p}"
            raise ValueError(msg)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w, c = img.shape
        shapes.append((img, h, w, c))
        entries.append((offset, h, w, c))
        offset += h * w * c

    header = b"NPK1" + struct.pack("<Q", len(paths))
    index = b"".join(struct.pack("<QQQQ", *e) for e in entries)
    blob_base = len(header) + len(index)
    with Path(output).open("wb") as f:
        f.write(header)
        # offsets are absolute file offsets
        index = b"".join(
            struct.pack("<QQQQ", blob_base + e[0], e[1], e[2], e[3]) for e in entries
        )
        f.write(index)
        for img, h, w, c in shapes:
            f.write(np.ascontiguousarray(img).tobytes())
    print(f"packed {len(paths)} images -> {output} ({(blob_base + offset) / 1e6:.1f} MB)")

    # sidecar name list (keeps pairing with meta files possible)
    with Path(str(output) + ".names").open("w", encoding="utf-8") as f:
        for p in paths:
            f.write(str(p.relative_to(folder)) + "\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("-input", required=True)
    ap.add_argument("-output", required=True)
    args = ap.parse_args()
    pack_folder(args.input, args.output)
