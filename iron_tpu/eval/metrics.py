"""Evaluation metrics: PSNR / SSIM / LPIPS on image folders, Chamfer on
meshes.

Behavioral specs:
  * eval_image_folder (evaluation/eval_image_folder.py:10-64): per-image
    PSNR = -10 log10 MSE, SSIM (win 11, sigma 1.5), LPIPS-alex; writes a
    metrics table + averages;
  * eval_mesh (evaluation/eval_mesh.py:6-26): symmetric Chamfer =
    0.5 * (mean dist(verts1 -> mesh2) + mean dist(verts2 -> mesh1)).

LPIPS needs pretrained AlexNet weights which this zero-egress image cannot
fetch; `lpips_np` returns None when unavailable (gated, not stubbed
silently).  Chamfer uses the native BVH (iron_tpu/native).
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from iron_tpu.losses.image import ssim_loss
from iron_tpu.data.io import read_image
from iron_tpu.native import point_mesh_sq_distances


def psnr_np(pred: np.ndarray, gt: np.ndarray) -> float:
    mse = float(np.mean((pred.astype(np.float64) - gt.astype(np.float64)) ** 2))
    return -10.0 * np.log10(mse + 1e-12)


def ssim_np(pred: np.ndarray, gt: np.ndarray) -> float:
    p = jnp.asarray(pred, jnp.float32).transpose(2, 0, 1)[None]
    g = jnp.asarray(gt, jnp.float32).transpose(2, 0, 1)[None]
    return 1.0 - float(ssim_loss(p, g))


_LPIPS = None
_LPIPS_TRIED = False


def lpips_np(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """LPIPS-alex if the weights are locally available, else None."""
    global _LPIPS, _LPIPS_TRIED
    if not _LPIPS_TRIED:
        _LPIPS_TRIED = True
        try:
            import lpips  # noqa
            import torch
            _LPIPS = (lpips.LPIPS(net="alex"), torch)
        except Exception:
            _LPIPS = None
    if _LPIPS is None:
        return None
    model, torch = _LPIPS
    t = lambda x: torch.from_numpy(
        (x.astype(np.float32).transpose(2, 0, 1)[None] * 2 - 1))
    with torch.no_grad():
        return float(model(t(pred), t(gt)))


def chamfer_distance(verts1: np.ndarray, tris1: np.ndarray,
                     verts2: np.ndarray, tris2: np.ndarray) -> float:
    """Symmetric Chamfer, mean of means (eval_mesh.py:6-26)."""
    d12 = np.sqrt(point_mesh_sq_distances(verts1, verts2, tris2))
    d21 = np.sqrt(point_mesh_sq_distances(verts2, verts1, tris1))
    return 0.5 * (float(d12.mean()) + float(d21.mean()))


def eval_image_folder(pred_dir: str, gt_dir: str,
                      out_path: Optional[str] = None) -> Dict[str, float]:
    """Folder-vs-folder image metrics (eval_image_folder.py:36-64)."""
    preds = sorted(sum([glob.glob(os.path.join(pred_dir, f"*.{e}"))
                        for e in ("png", "jpg", "exr")], []))
    rows = []
    for pp in preds:
        name = os.path.basename(pp)
        stem = os.path.splitext(name)[0]
        cands = sum([glob.glob(os.path.join(gt_dir, f"{stem}.{e}"))
                     for e in ("png", "jpg", "exr")], [])
        if not cands:
            continue
        pred = read_image(pp)
        gt = read_image(cands[0])
        if pred.shape != gt.shape:
            continue
        row = {"name": name, "psnr": psnr_np(pred, gt), "ssim": ssim_np(pred, gt)}
        lp = lpips_np(pred, gt)
        if lp is not None:
            row["lpips"] = lp
        rows.append(row)

    keys = [k for k in ("psnr", "ssim", "lpips") if rows and k in rows[0]]
    summary = {k: float(np.mean([r[k] for r in rows])) for k in keys}
    summary["n_images"] = len(rows)
    if out_path:
        with open(out_path, "w") as f:
            for r in rows:
                f.write("  ".join(f"{k}={v}" if isinstance(v, str) else f"{k}={v:.4f}"
                                  for k, v in r.items()) + "\n")
            f.write("AVG  " + "  ".join(f"{k}={v:.4f}" for k, v in summary.items()
                                        if k != "n_images") + "\n")
    return summary
