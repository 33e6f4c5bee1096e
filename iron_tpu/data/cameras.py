"""Camera-dictionary IO and normalization.

The on-disk format matches the reference: `cam_dict_norm.json` maps image
filename -> {"K": 16 floats, "W2C": 16 floats, "img_size": [W, H]}
(models/dataset.py:152-163).  Normalization translates + scales all camera
centers into a target-radius sphere (models/normalize_cam_dict.py:34-95) —
the "objects inside the unit sphere" convention the whole pipeline assumes.
"""
from __future__ import annotations

import copy
import json
import os
from typing import Dict, List, Tuple

import numpy as np


def load_cam_dict(path: str) -> Dict[str, Dict]:
    with open(path) as f:
        cam_dict = json.load(f)
    out = {}
    for name, entry in cam_dict.items():
        out[name] = {
            "K": np.asarray(entry["K"], np.float32).reshape(4, 4),
            "W2C": np.asarray(entry["W2C"], np.float32).reshape(4, 4),
            "img_size": tuple(entry.get("img_size", (0, 0))),
        }
    return out


def get_tf_cams(cam_dict: Dict, target_radius: float = 1.0) -> Tuple[np.ndarray, float]:
    """Translate/scale bringing all camera centers inside target_radius
    (normalize_cam_dict.py:34-56): radius = 1.1 * max distance to the mean
    center."""
    centers = []
    for entry in cam_dict.values():
        W2C = np.asarray(entry["W2C"], np.float64).reshape(4, 4)
        centers.append(np.linalg.inv(W2C)[:3, 3])
    centers = np.stack(centers, axis=0)
    mean = centers.mean(axis=0)
    radius = 1.1 * np.max(np.linalg.norm(centers - mean, axis=-1))
    return -mean, target_radius / radius


def transform_pose(W2C: np.ndarray, translate: np.ndarray, scale: float) -> np.ndarray:
    C2W = np.linalg.inv(np.asarray(W2C, np.float64))
    C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
    return np.linalg.inv(C2W).astype(np.float32)


def normalize_cam_dict(in_path: str, out_path: str, target_radius: float = 1.0) -> None:
    """Rewrite a cam dict with normalized poses (normalize_cam_dict.py:59-95)."""
    with open(in_path) as f:
        cam_dict = json.load(f)
    translate, scale = get_tf_cams(
        {k: {"W2C": np.asarray(v["W2C"]).reshape(4, 4)} for k, v in cam_dict.items()},
        target_radius)
    out = copy.deepcopy(cam_dict)
    for name in out:
        W2C = np.asarray(out[name]["W2C"], np.float64).reshape(4, 4)
        W2C = transform_pose(W2C, translate, scale)
        assert np.isclose(np.linalg.det(W2C[:3, :3]), 1.0, atol=1e-4)
        out[name]["W2C"] = [float(x) for x in W2C.flatten()]
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
