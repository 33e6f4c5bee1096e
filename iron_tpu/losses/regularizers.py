"""Geometry / material regularizers.

Specs from reference trainers:
  * eikonal: sum((||grad||-1)^2) over (uniform cube points + surface
    normals + edge side normals) / count (render_surface.py:580-607);
  * roughness hinge at 0.5 (render_surface.py:609-613);
  * metal eta/k hinge priors (render_nir.py:543, render_surface.py:615-624);
  * dielectric eta prior |eta - 1.5| (render_surface.py:626-629);
  * mask BCE on accumulated weight (render_volume.py:397).

All masked fixed-shape means instead of boolean compaction.
"""
from __future__ import annotations

import jax.numpy as jnp


def eikonal_loss(grads: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Returns (sum((||g||-1)^2 * mask), count) so callers can pool several
    gradient sources before dividing (render_surface.py:580-607)."""
    err = (jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2
    if mask is None:
        return jnp.sum(err), err.size
    m = mask.astype(err.dtype)
    return jnp.sum(err * m), jnp.sum(m)


def roughness_range_loss(roughness: jnp.ndarray, mask: jnp.ndarray,
                         threshold: float = 0.5) -> jnp.ndarray:
    """Hinge mean over mask of (roughness - threshold)+ (render_surface.py:609-613)."""
    m = mask.astype(roughness.dtype)
    over = jnp.clip(roughness - threshold, 0.0) * m
    valid = (over > 0).astype(roughness.dtype)
    return jnp.sum(over) / jnp.clip(jnp.sum(valid), 1.0)


def metal_eta_k_loss(metal_eta: jnp.ndarray, metal_k: jnp.ndarray, mask: jnp.ndarray,
                     eta_value: float = 1.0, k_value: float = 10.0):
    """|eta - eta_value| over eta > eta_value (and same for k)
    (render_surface.py:615-624)."""
    m = mask.astype(metal_eta.dtype)
    e_over = jnp.abs(metal_eta - eta_value) * (metal_eta > eta_value) * m
    e_cnt = jnp.clip(jnp.sum((metal_eta > eta_value) * m), 1.0)
    k_over = jnp.abs(metal_k - k_value) * (metal_k > k_value) * m
    k_cnt = jnp.clip(jnp.sum((metal_k > k_value) * m), 1.0)
    return jnp.sum(e_over) / e_cnt, jnp.sum(k_over) / k_cnt


def dielectric_eta_loss(dielectric_eta: jnp.ndarray, mask: jnp.ndarray,
                        target: float = 1.5) -> jnp.ndarray:
    m = mask.astype(dielectric_eta.dtype)
    return jnp.sum(jnp.abs(dielectric_eta - target) * m) / jnp.clip(jnp.sum(m), 1.0)


def mask_bce_loss(weight_sum: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """BCE(clip(weight_sum), mask) (render_volume.py:397)."""
    w = jnp.clip(weight_sum, 1e-3, 1.0 - 1e-3)
    m = mask.astype(w.dtype)
    return -jnp.mean(m * jnp.log(w) + (1.0 - m) * jnp.log(1.0 - w))
