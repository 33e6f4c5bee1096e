"""Linear layers with explicit weight-norm reparameterization.

Weight norm follows the semantics of `torch.nn.utils.weight_norm` with
dim=0 as used by the reference fields (`models/fields.py:75-76,192-193`):
the effective weight for output unit j is  g_j * v_j / ||v_j||  where the
norm runs over the input dimension.  We store v as [d_in, d_out] (so the
apply is a plain  x @ W  feeding the MXU) and normalize per column.

Initialization helpers reproduce torch defaults (kaiming-uniform with
bound 1/sqrt(fan_in)) and the SDF geometric init (fields.py:47-73).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def linear_params(w: jnp.ndarray, b: jnp.ndarray, weight_norm: bool) -> dict:
    """Wrap an initial weight [d_in, d_out] into (possibly weight-normed) params."""
    if weight_norm:
        g = jnp.linalg.norm(w, axis=0)  # per-output-column norm
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


def effective_weight(p: dict) -> jnp.ndarray:
    if "v" in p:
        vnorm = jnp.linalg.norm(p["v"], axis=0, keepdims=True)
        return p["v"] * (p["g"][None, :] / (vnorm + 1e-12))
    return p["w"]


def apply_linear(p: dict, x: jnp.ndarray, precision=None,
                 dtype=None) -> jnp.ndarray:
    """dtype=bfloat16 casts the (f32 weight-normed) effective weight and
    bias so the matmul runs MXU-native bf16; pass x already cast."""
    w = effective_weight(p)
    b = p["b"]
    if dtype is not None:
        w = w.astype(dtype)
        b = b.astype(dtype)
    return jnp.dot(x, w, precision=precision) + b


def torch_default_linear(key, d_in: int, d_out: int, weight_norm: bool = True) -> dict:
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    w = jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return linear_params(w, b, weight_norm)


def normal_weight(key, d_in: int, d_out: int, mean: float, std: float) -> jnp.ndarray:
    return mean + std * jax.random.normal(key, (d_in, d_out), jnp.float32)
