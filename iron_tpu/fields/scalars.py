"""Scalar learnable networks: NeuS inverse-deviation and point-light intensity.

Specs: `models/fields.py:415-421` (SingleVarianceNetwork: inv_s =
exp(10 * variance)) and `models/network_conf.py:16-28` (PointLightNetwork:
single scalar intensity, init 5.0, settable).
"""
from __future__ import annotations

import jax.numpy as jnp


def init_variance(init_val: float = 0.3) -> dict:
    return {"variance": jnp.asarray(init_val, jnp.float32)}


def variance_apply(params: dict) -> jnp.ndarray:
    """Scalar inv_s (callers broadcast as needed)."""
    return jnp.exp(params["variance"] * 10.0)


def init_point_light(init_val: float = 5.0) -> dict:
    return {"light": jnp.asarray(init_val, jnp.float32)}


def point_light_apply(params: dict) -> jnp.ndarray:
    return params["light"]
