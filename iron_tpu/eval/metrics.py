"""Evaluation metrics: PSNR / SSIM / LPIPS on image folders, Chamfer on
meshes.

Behavioral specs:
  * eval_image_folder (evaluation/eval_image_folder.py:10-64): per-image
    PSNR = -10 log10 MSE, SSIM (win 11, sigma 1.5), LPIPS-alex; writes a
    metrics table + averages;
  * eval_mesh (evaluation/eval_mesh.py:6-26): symmetric Chamfer =
    0.5 * (mean dist(verts1 -> mesh2) + mean dist(verts2 -> mesh1)).

LPIPS needs pretrained AlexNet weights which this zero-egress image cannot
fetch; `lpips_np` returns None when unavailable and `eval_image_folder`
then reports `perceptual_distance_np` — a self-contained fixed-seed
random-feature metric (the LPIPS paper's random-network baseline),
documented as a substitute and never labeled "lpips".  Chamfer uses the
native BVH (iron_tpu/native).
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


_PERC_FILTERS = None


def _perceptual_filters():
    """Fixed-seed random conv banks for the perceptual metric."""
    global _PERC_FILTERS
    if _PERC_FILTERS is None:
        g = np.random.default_rng(1234)
        banks = []
        for _ in range(3):  # one bank per pyramid scale
            w = g.normal(size=(24, 3, 5, 5)).astype(np.float32)
            w -= w.mean(axis=(2, 3), keepdims=True)       # zero-mean taps
            w /= np.linalg.norm(w.reshape(24, -1), axis=1)[:, None, None, None]
            banks.append(w)
        _PERC_FILTERS = banks
    return _PERC_FILTERS


def perceptual_distance_np(pred: np.ndarray, gt: np.ndarray) -> float:
    """Self-contained LPIPS substitute: multi-scale random-feature distance.

    LPIPS-alex needs pretrained weights this zero-egress image cannot
    fetch.  Zhang et al. (CVPR 2018, the LPIPS paper, Tab. 5) showed that
    *randomly initialized* conv features already track human perceptual
    judgments far better than PSNR/SSIM; this implements that baseline
    deterministically: 3 pyramid scales, each filtered by a fixed-seed
    zero-mean 24x3x5x5 conv bank, unit-normalized along channels, L2
    feature difference averaged over space/scales.  Documented substitute,
    not LPIPS — reported as "perceptual" (never "lpips").
    """
    import jax

    def feats(x, w):
        xj = jnp.asarray(x.transpose(2, 0, 1)[None], jnp.float32) * 2 - 1
        y = jax.lax.conv_general_dilated(xj, jnp.asarray(w), (1, 1), "VALID",
                                         dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = jnp.maximum(y, 0.0)
        return y / (jnp.linalg.norm(y, axis=1, keepdims=True) + 1e-10)

    def down2(x):
        H, W = x.shape[:2]
        return x[:2 * (H // 2), :2 * (W // 2)].reshape(
            H // 2, 2, W // 2, 2, -1).mean(axis=(1, 3))

    total = 0.0
    p, g = pred.astype(np.float32), gt.astype(np.float32)
    for w in _perceptual_filters():
        d = feats(p, w) - feats(g, w)
        total += float(jnp.mean(jnp.sum(d * d, axis=1)))
        p, g = down2(p), down2(g)
    return total / 3.0


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
        else:
            row["perceptual"] = perceptual_distance_np(pred, gt)
        rows.append(row)

    keys = [k for k in ("psnr", "ssim", "lpips", "perceptual")
            if rows and k in rows[0]]
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
