"""Device-mesh utilities.

The reference has no distributed runtime at all (SURVEY.md §2.5: the only
"multi-node story" is independent SLURM jobs).  Here scaling is native:
  * a `jax.sharding.Mesh` over ICI with axes (dp, tp) — rays/patches are
    sharded over `dp`, MLP hidden dims optionally over `tp`;
  * parameters replicated (dp) / sharded (tp) via NamedSharding — XLA's
    SPMD partitioner inserts psum/all-gather collectives and the
    latency-hiding scheduler overlaps them with compute;
  * multi-host entry via `jax.distributed.initialize` (initialize_distributed).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host process bootstrap (no-op if single process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh of shape (dp, tp) over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp*tp={dp * tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Shard the leading axis of every leaf over `axis`."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)
