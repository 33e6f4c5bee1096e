"""Hierarchical sampling along rays: inverse-CDF resampling and NeuS
importance upsampling.

Behavioral specs:
  * `sample_pdf` — NeRF inverse-transform sampling (renderer.py:45-75):
    weights + 1e-5, cumulative cdf prefixed with 0, midpoint-uniform or
    random u, searchsorted(right), lerp between bracketing bins.
  * `up_sample` — NeuS section-alpha importance sampling with a fixed
    inv_s (renderer.py:189-232): section cos from SDF differences, clamped
    via min(prev_cos, cos) and [-1e3, 0], masked to rays whose section
    touches the unit sphere, alpha = (cdf_prev - cdf_next + eps)/(cdf_prev
    + eps), transmittance weights, then sample_pdf (deterministic).
  * `cat_z_vals` — merge + sort new samples, gathering SDF values along
    (renderer.py:234-248) — implemented with a single sort +
    take_along_axis instead of the reference's flat fancy-index gather.

All shapes static; everything jit/vmap-friendly.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               det: bool = False, key: Optional[jax.Array] = None) -> jnp.ndarray:
    """bins [B, N+1]-ish, weights [B, N] -> samples [B, n_samples]."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, N+1]

    B = cdf.shape[0]
    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        assert key is not None, "need a PRNG key for stochastic sampling"
        u = jax.random.uniform(key, (B, n_samples))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def up_sample(rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray,
              sdf: jnp.ndarray, n_importance: int, inv_s: float) -> jnp.ndarray:
    """One NeuS importance round (renderer.py:189-232). Returns new z [B, n_importance]."""
    batch_size, n_samples = z_vals.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
    radius = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = (radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch_size, 1)), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1)[:, :-1]
    weights = alpha * trans

    return jax.lax.stop_gradient(sample_pdf(z_vals, weights, n_importance, det=True))


def cat_z_vals(z_vals: jnp.ndarray, new_z_vals: jnp.ndarray,
               sdf: Optional[jnp.ndarray], new_sdf: Optional[jnp.ndarray]
               ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Merge-and-sort samples, carrying per-sample SDF values along
    (renderer.py:234-248).  Pass new_sdf=None on the last round."""
    z_all = jnp.concatenate([z_vals, new_z_vals], axis=-1)
    order = jnp.argsort(z_all, axis=-1)
    z_sorted = jnp.take_along_axis(z_all, order, axis=-1)
    if sdf is None or new_sdf is None:
        return z_sorted, None
    sdf_all = jnp.concatenate([sdf, new_sdf], axis=-1)
    return z_sorted, jnp.take_along_axis(sdf_all, order, axis=-1)
