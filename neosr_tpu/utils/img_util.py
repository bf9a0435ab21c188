"""Image I/O and tensor<->image conversion (NHWC, RGB, float32 [0,1]).

Counterpart of /root/reference/neosr/utils/img_util.py:13-233, redesigned for
the framework's TPU-native layout: arrays flowing into/out of the device are
NHWC float32 RGB in [0,1] (the reference uses BCHW torch tensors).  cv2 reads
BGR uint8; conversion happens here at the I/O boundary only.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np


def imfrombytes(content: bytes, flag: str = "color", float32: bool = False) -> np.ndarray:
    """Decode an image from bytes. Returns HWC BGR uint8 (or float32 /255)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        "color": cv2.IMREAD_COLOR,
        "grayscale": cv2.IMREAD_GRAYSCALE,
        "unchanged": cv2.IMREAD_UNCHANGED,
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if img is None:
        raise ValueError("Failed to decode image bytes")
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def imread(path: str | Path, float32: bool = True) -> np.ndarray:
    """Read an image file -> HWC RGB float32 [0,1] (grayscale -> 3 channels)."""
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"Failed to read image: {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def img2batch(img: np.ndarray) -> np.ndarray:
    """HWC -> 1HWC float32."""
    if img.ndim == 2:
        img = img[..., None]
    return img[None].astype(np.float32)


def tensor2img(
    tensor: np.ndarray,
    rgb2bgr: bool = True,
    min_max: tuple[float, float] = (0.0, 1.0),
) -> np.ndarray:
    """Device output (HWC or 1HWC float in min_max) -> HWC uint8 image.

    Matches the quantization convention of the reference's tensor2img
    (img_util.py:60-129): clamp to min_max, rescale to [0,255], round.
    """
    arr = np.asarray(tensor, dtype=np.float32)
    if arr.ndim == 4:
        if arr.shape[0] != 1:
            raise ValueError(f"Expected batch of 1, got {arr.shape}")
        arr = arr[0]
    arr = np.clip(arr, min_max[0], min_max[1])
    arr = (arr - min_max[0]) / (min_max[1] - min_max[0])
    if rgb2bgr and arr.ndim == 3 and arr.shape[-1] == 3:
        arr = arr[..., ::-1]
    return (arr * 255.0).round().astype(np.uint8)


def imwrite(img: np.ndarray, file_path: str | Path, auto_mkdir: bool = True) -> None:
    """Write an HWC BGR uint8 image to disk (cv2 convention)."""
    if auto_mkdir:
        Path(file_path).parent.mkdir(parents=True, exist_ok=True)
    ok = cv2.imwrite(str(file_path), img)
    if not ok:
        raise OSError(f"Failed to write image: {file_path}")


def crop_border(img: np.ndarray, crop_border: int) -> np.ndarray:
    """Crop `crop_border` pixels from each spatial edge of HWC / NHWC arrays."""
    if crop_border == 0:
        return img
    if img.ndim == 4:
        return img[:, crop_border:-crop_border, crop_border:-crop_border, :]
    return img[crop_border:-crop_border, crop_border:-crop_border, ...]
