"""Pure-JAX image morphology used on the surface-render path.

Replaces the reference's kornia calls:
  * 3x3 grayscale closing on depth for hole filling (raytracer.py:554-564);
  * normalized sobel gradient magnitude for edge seeding
    (raytracer.py:566-571; kornia.filters.sobel with normalized=True
    divides each kernel by the sum of absolute values, i.e. 8).
Implemented with reduce_window / conv so XLA fuses them.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def closing3x3(img: jnp.ndarray) -> jnp.ndarray:
    """Grayscale morphological closing with a 3x3 ones kernel; img [H, W]."""
    x = img[None, None]
    pad = [(0, 0), (0, 0), (1, 1), (1, 1)]
    dil = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1), pad)
    ero = jax.lax.reduce_window(dil, jnp.inf, jax.lax.min, (1, 1, 3, 3), (1, 1, 1, 1), pad)
    return ero[0, 0]


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T.copy()


def sobel_magnitude(img: jnp.ndarray) -> jnp.ndarray:
    """Normalized sobel gradient magnitude; img [H, W] (kornia semantics)."""
    x = img[None, None]
    k = jnp.stack([jnp.asarray(_SOBEL_X), jnp.asarray(_SOBEL_Y)])[:, None]  # [2,1,3,3]
    g = jax.lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.sqrt(jnp.sum(g[0] ** 2, axis=0) + 1e-12)
