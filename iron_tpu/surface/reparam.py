"""Implicit-function reparameterization of sphere-traced hit points.

Spec from reference `models/raytracer.py:17-24`:
    p_diff = p - d_hat / <grad, d_hat> * (f(p) - stop_grad(f(p)))
which has zero value change but carries df/dtheta into dp/dtheta without
differentiating the tracer loop (IDR/IRON trick).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def reparam_points(nondiff_points: jnp.ndarray,
                   nondiff_grads: jnp.ndarray,
                   nondiff_trgt_dirs: jnp.ndarray,
                   diff_sdf_vals: jnp.ndarray) -> jnp.ndarray:
    """points/grads/dirs [..., 3]; diff_sdf_vals [..., 1] (raytracer.py:17-24)."""
    dot = jnp.sum(nondiff_grads * nondiff_trgt_dirs, axis=-1, keepdims=True)
    dot = jnp.clip(dot, 1e-4)
    return (nondiff_points
            - nondiff_trgt_dirs / dot * (diff_sdf_vals - jax.lax.stop_gradient(diff_sdf_vals)))
