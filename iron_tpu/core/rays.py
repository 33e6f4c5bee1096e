"""Ray / sphere geometry helpers.

Spec from reference `models/raytracer.py:223-237` (intersect_sphere).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def intersect_sphere(ray_o: jnp.ndarray, ray_d: jnp.ndarray, r: float = 1.0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Intersect rays with the sphere of radius ``r`` about the origin.

    Returns (mask_intersect, near, far) where near = clamp(d1-d2, 0) and
    far = d1+d2, matching raytracer.py:223-237.  All shapes [...].
    """
    d1 = -jnp.sum(ray_d * ray_o, axis=-1) / jnp.sum(ray_d * ray_d, axis=-1)
    p = ray_o + d1[..., None] * ray_d
    tmp = r * r - jnp.sum(p * p, axis=-1)
    mask_intersect = tmp > 0.0
    d2 = jnp.sqrt(jnp.clip(tmp, 0.0)) / jnp.linalg.norm(ray_d, axis=-1)
    return mask_intersect, jnp.clip(d1 - d2, 0.0), d1 + d2
