"""NeRF-style sin/cos positional encoding.

Behavioral spec from reference `models/embedder.py:6-54`: include the raw
input, then for each log-spaced frequency 2^0 .. 2^(multires-1) append
sin(x*f) and cos(x*f) (sin before cos, frequencies outermost), concatenated
on the last axis.  Output dim = d * (1 + 2 * multires).

TPU-first shape: one fused `sin` over a single broadcasted tensor instead of
a Python list of per-frequency lambdas — XLA fuses this into the consuming
matmul's prologue.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pe_dim(multires: int, d: int = 3) -> int:
    """Output dimension of the encoding (reference embedder.py:14-33)."""
    if multires <= 0:
        return d
    return d * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Encode [..., d] -> [..., d*(1+2*multires)].

    Matches the reference output ordering exactly:
      [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]
    with each sin/cos block spanning all d input dims.
    """
    if multires <= 0:
        return x
    freqs = jnp.asarray(2.0 ** np.arange(multires), dtype=x.dtype)  # [m]
    # [..., m, d] angles; sin & cos interleaved per frequency.
    ang = x[..., None, :] * freqs[:, None]
    # stack -> [..., m, 2, d] so per-frequency sin-then-cos ordering is kept
    enc = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)
