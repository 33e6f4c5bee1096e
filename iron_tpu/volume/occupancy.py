"""Occupancy-grid accelerated ray sampling for the volume renderer.

NerfAcc-style empty-space skipping (PAPERS.md: "NerfAcc: Efficient Sampling
Accelerates NeRFs") adapted to NeuS and to TPU fixed shapes: a periodically
refreshed R^3 grid marks cells whose center is within a margin of the SDF
zero set; ray samples are then drawn by inverse-CDF over per-ray occupancy
weights, concentrating the sample budget in occupied intervals instead of
uniformly over [near, far].  No compaction — every ray keeps `n_samples`
samples, only their placement changes, so the downstream integrator is
untouched.

The reference has no counterpart (it samples uniformly + NeuS importance
rounds); this is a TPU-native speed/quality feature, default OFF.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from iron_tpu.volume.sampling import sample_pdf


@dataclass(frozen=True)
class OccupancyGridConfig:
    resolution: int = 64
    bound: float = 1.0          # grid spans [-bound, bound]^3
    margin_cells: float = 1.5   # occupied if |sdf| < margin_cells * cell_diag
    coarse_samples: int = 64    # per-ray occupancy probes for the CDF
    floor_weight: float = 0.01  # minimum weight so no interval is starved


def update_occupancy_grid(sdf_fn: Callable, cfg: OccupancyGridConfig,
                          chunk: int = 262144) -> jnp.ndarray:
    """Evaluate the SDF at all cell centers -> bool grid [R, R, R]."""
    R = cfg.resolution
    cell = 2.0 * cfg.bound / R
    centers_1d = (np.arange(R, dtype=np.float32) + 0.5) * cell - cfg.bound
    X, Y, Z = np.meshgrid(centers_1d, centers_1d, centers_1d, indexing="ij")
    pts = jnp.asarray(np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1))
    thresh = cfg.margin_cells * cell * np.sqrt(3.0)
    eval_jit = jax.jit(lambda p: jnp.abs(sdf_fn(p)) < thresh)
    vals = []
    for i in range(0, pts.shape[0], chunk):
        vals.append(eval_jit(pts[i:i + chunk]))
    return jnp.concatenate(vals).reshape(R, R, R)


def occupancy_lookup(grid: jnp.ndarray, pts: jnp.ndarray,
                     cfg: OccupancyGridConfig) -> jnp.ndarray:
    """Nearest-cell occupancy at points [..., 3] -> float [...]."""
    R = cfg.resolution
    idx = jnp.floor((pts / cfg.bound + 1.0) * 0.5 * R).astype(jnp.int32)
    idx = jnp.clip(idx, 0, R - 1)
    inside = jnp.all(jnp.abs(pts) <= cfg.bound, axis=-1)
    occ = grid[idx[..., 0], idx[..., 1], idx[..., 2]]
    return jnp.where(inside, occ.astype(jnp.float32), 0.0)


def occupancy_guided_z(grid: jnp.ndarray, cfg: OccupancyGridConfig,
                       rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       near: jnp.ndarray, far: jnp.ndarray, n_samples: int,
                       key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Per-ray z values [B, n_samples] concentrated in occupied cells.

    Coarse occupancy probes along the ray build a CDF (+floor so empty rays
    degrade to uniform); inverse-transform sampling warps the budget into
    occupied segments, then z are sorted for the integrator.
    """
    B = rays_o.shape[0]
    near = jnp.reshape(near, (B, 1))
    far = jnp.reshape(far, (B, 1))
    t = jnp.linspace(0.0, 1.0, cfg.coarse_samples)
    z_coarse = near + (far - near) * t[None, :]                    # [B, M]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_coarse[..., None]
    occ = occupancy_lookup(grid, pts, cfg)                          # [B, M]
    # weights per segment = max of endpoint occupancies + floor
    w = jnp.maximum(occ[:, :-1], occ[:, 1:]) + cfg.floor_weight     # [B, M-1]
    z = sample_pdf(z_coarse, w, n_samples, det=key is None, key=key)
    return jnp.sort(z, axis=-1)
