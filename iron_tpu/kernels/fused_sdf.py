"""Pallas TPU kernel: fused positional-encoding + SDF-MLP forward.

The sphere tracer, dense fallback sampler, bisection and edge walk evaluate
the SDF under stop_gradient (reference traces under torch.no_grad,
raytracer.py:45); together they are ~80-90% of all SDF evaluations in a
stage-2 step.  This kernel runs the whole chain — PE(multires) -> 9
weight-normed linear layers with the skip concat -> [sdf, features] — in
one pallas_call: the weights live in VMEM across the row-tile grid and the
eight 256-wide matmuls never round-trip activations through HBM.

Only used on no-grad paths (no custom VJP needed); training forwards go
through the lax path in iron_tpu.fields.sdf.  An allclose test pins the two
paths together (tests/test_kernels.py).

Weight layout: effective weights W = g * v/||v|| are materialized once per
training step by `sdf_effective_weights` (a handful of 256^2 ops) and
passed as plain arrays.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from iron_tpu.fields.sdf import SDFConfig
from iron_tpu.fields.mlp import effective_weight

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def sdf_effective_weights(params: dict) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Materialize (W, b) per layer from weight-norm params."""
    Ws = [effective_weight(p) for p in params["layers"]]
    bs = [p["b"] for p in params["layers"]]
    return Ws, bs


def _pe(x, multires: int):
    # static python loop over frequencies: no captured constant arrays
    # (pallas kernels cannot close over device arrays)
    parts = [x]
    for i in range(multires):
        ang = x * (2.0 ** i)
        parts.append(jnp.sin(ang))
        parts.append(jnp.cos(ang))
    return jnp.concatenate(parts, axis=-1)


def _mlp_body(inputs, Ws, bs, cfg: SDFConfig):
    """The fused layer chain; runs identically inside the kernel and in the
    interpret-mode test path."""
    hp = jax.lax.Precision.HIGHEST
    h = inputs
    n = len(Ws)
    for l in range(n):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) / np.sqrt(2)
        h = jnp.dot(h, Ws[l], precision=hp) + bs[l]
        if l < n - 1:
            h = jax.nn.softplus(100.0 * h) / 100.0
    return h


def _kernel(cfg: SDFConfig, n_layers: int, x_ref, *refs):
    W_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    out_ref = refs[2 * n_layers]
    x = x_ref[:] * cfg.scale
    inputs = _pe(x, cfg.multires)
    Ws = [w[:] for w in W_refs]
    bs = [b[:] for b in b_refs]
    h = _mlp_body(inputs, Ws, bs, cfg)
    out_ref[:] = jnp.concatenate([h[:, :1] / cfg.scale, h[:, 1:]], axis=-1)


def make_pallas_sdf_fn(params: dict, cfg: SDFConfig = SDFConfig(),
                       tile: int = 512, interpret: bool = False):
    """Returns sdf_all(x [..., 3]) -> [..., d_out] running the fused kernel.

    The input is flattened and padded to a tile multiple; the grid walks row
    tiles while weights stay resident in VMEM.
    """
    Ws, bs = sdf_effective_weights(params)
    Ws = [jax.lax.stop_gradient(w) for w in Ws]
    bs = [jax.lax.stop_gradient(b) for b in bs]
    n_layers = len(Ws)
    d_out = cfg.d_out

    kern = functools.partial(_kernel, cfg, n_layers)

    def fwd(x):
        shape = x.shape[:-1]
        xf = x.reshape(-1, 3)
        n = xf.shape[0]
        pad = (-n) % tile
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        grid = (xf.shape[0] // tile,)

        in_specs = [pl.BlockSpec((tile, 3), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for w in Ws:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in bs:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                         memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, d_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((xf.shape[0], d_out), x.dtype),
            interpret=interpret,
        )(xf, *Ws, *bs)
        return out[:n].reshape(*shape, d_out)

    return fwd
