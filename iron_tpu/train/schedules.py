"""Learning-rate and annealing schedules.

Spec from reference `render_volume.py:548-563`:
  * lr factor = step/warmup while warming up, then
    alpha + (1-alpha) * 0.5 * (1 + cos(pi * progress));
  * cos_anneal_ratio = min(1, step / anneal_end) (render_volume.py:548-552).
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(base_lr: float, warm_up_end: int, end_iter: int,
                           alpha: float = 0.05):
    """Returns an optax-compatible schedule fn step -> lr."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warm_up_end, 1)
        progress = (step - warm_up_end) / jnp.maximum(end_iter - warm_up_end, 1)
        cos_f = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        factor = jnp.where(step < warm_up_end, warm, cos_f)
        return base_lr * factor

    return schedule


def cos_anneal_ratio(step, anneal_end: int):
    if anneal_end == 0:
        return 1.0
    return jnp.minimum(1.0, jnp.asarray(step, jnp.float32) / anneal_end)
