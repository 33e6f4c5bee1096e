"""Mitsuba roughplastic transmission tables (shipped as data).

The tables come from Mitsuba 0.6's rtrans precomputation and are shipped
with the reference as `models/ggx/*.txt`; we ship the same data files in
`iron_tpu/assets/ggx/`.  Lookup semantics (renderer_ggx.py:120-144):
  * warpedCosTheta = dot^0.25, warpedAlpha = (alpha/4)^0.25;
  * T12 index = floor(wAlpha*50)*100 + floor(wCos*100), clamped, value
    clamped to [0,1]; T21 = T12 in the co-located setting;
  * Fdr = clamp(1 - diff_table[floor(wAlpha*50)], 0, 1).

TPU-first: tables are small (5000 + 50 f32), so we keep them as module
constants; the gather is a one-hot matmul-free `jnp.take` that XLA lowers
to a dynamic-gather in VMEM.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets", "ggx")

NUM_THETA_SAMPLES = 100
NUM_ALPHA_SAMPLES = 50


@functools.lru_cache(maxsize=None)
def _load(name: str) -> np.ndarray:
    return np.loadtxt(os.path.join(_ASSET_DIR, name)).astype(np.float32)


def mts_trans_table() -> jnp.ndarray:
    """5000-entry external-IOR transmission table."""
    return jnp.asarray(_load("ext_mts_rtrans_data.txt"))


def mts_diff_trans_table() -> jnp.ndarray:
    """50-entry internal diffuse transmission table."""
    return jnp.asarray(_load("int_mts_diff_rtrans_data.txt"))


def lookup_T12(dot: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """T12 transmission factor, shapes [..., 1] (renderer_ggx.py:124-136)."""
    table = mts_trans_table()
    warped_cos = dot ** 0.25
    warped_alpha = (alpha / 4.0) ** 0.25
    tx = jnp.floor(warped_cos * NUM_THETA_SAMPLES).astype(jnp.int32)
    ty = jnp.floor(warped_alpha * NUM_ALPHA_SAMPLES).astype(jnp.int32)
    t_idx = jnp.clip(ty * NUM_THETA_SAMPLES + tx, 0, table.shape[0] - 1)
    return jnp.clip(jnp.take(table, t_idx), 0.0, 1.0)


def lookup_Fdr(alpha: jnp.ndarray) -> jnp.ndarray:
    """Internal diffuse reflectance Fdr (renderer_ggx.py:138-142)."""
    table = mts_diff_trans_table()
    warped_alpha = (alpha / 4.0) ** 0.25
    t_idx = jnp.clip(jnp.floor(warped_alpha * NUM_ALPHA_SAMPLES).astype(jnp.int32),
                     0, table.shape[0] - 1)
    return jnp.clip(1.0 - jnp.take(table, t_idx), 0.0, 1.0)
