"""Image IO.

Replaces the reference's reader/writer factories (`models/dataset.py:42-92`):
opencv BGR<->RGB readers, 8-bit conversion (`to8b`, dataset.py:1135), and
gamma helpers (`models/helper.py:14-25`).  EXR support is gated on the cv2
build (the reference used pyexr + an EXR gamma of 1/2.2 on read).
"""
from __future__ import annotations

import os

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
import cv2


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def gamma_correction(image, gamma: float = 2.2):
    return np.power(image + 1e-6, 1.0 / gamma)


def inv_gamma_correction(image, gamma: float = 2.2):
    return np.power(image + 1e-6, gamma)


def read_image(path: str, apply_exr_gamma: bool = True) -> np.ndarray:
    """Read an image as float32 RGB in [0,1] (EXR: linear, optional 1/2.2
    gamma matching dataset.py:53-58)."""
    if path.endswith(".exr"):
        # built-in codec first: this image's cv2 ships no EXR support
        # (imread/imwrite both fail), so data/exr.py carries the format
        from iron_tpu.data.exr import read_exr
        try:
            img = read_exr(path)
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
        except Exception:
            img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
            if img is None:
                raise IOError(f"failed to read {path}")
            if img.ndim == 3:
                img = img[:, :, ::-1]
        img = img.astype(np.float32)
        if apply_exr_gamma:
            img = np.power(np.clip(img, 0, None) + 1e-6, 1.0 / 2.2)
        return img
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f"failed to read {path}")
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, axis=2)
    if img.shape[2] == 4:
        img = img[:, :, :3]
    img = img[:, :, ::-1].astype(np.float32)
    if img.max() > 1.5:  # 8/16-bit content
        img = img / (65535.0 if img.max() > 255.5 else 255.0)
    return img


def write_image(path: str, img: np.ndarray) -> None:
    """Write float [0,1] or uint8 RGB (.exr: linear float, built-in codec)."""
    if path.endswith(".exr"):
        from iron_tpu.data.exr import write_exr
        write_exr(path, np.asarray(img, np.float32))
        return
    if img.dtype != np.uint8:
        img = to8b(img)
    if img.ndim == 3:
        img = img[:, :, ::-1]
    cv2.imwrite(path, img)
