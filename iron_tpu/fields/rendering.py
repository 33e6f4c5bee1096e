"""IDR-style rendering / material MLP.

Behavioral spec from reference `models/fields.py:141-239` (RenderingNetwork):
  * input = concat of (points, view_dirs, normals, feature) selected by
    `mode` in {idr, no_view_dir, no_normal, points_only};
  * optional PE on points (multires) and view dirs (multires_view) replaces
    the raw 3-vector with its encoding (dims[0] += pe_dim - 3);
  * optional skip connections (dims[l] += dims[0], concat/sqrt(2));
  * ReLU hidden activations; output = output_scale * (x + output_bias),
    then sigmoid * squeeze_out_scale if squeeze_out;
  * weight norm on every layer.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iron_tpu.core.embedder import positional_encoding, pe_dim
from iron_tpu.fields.mlp import torch_default_linear, apply_linear


@dataclass(frozen=True)
class RenderingConfig:
    d_feature: int = 256
    mode: str = "idr"  # idr | no_view_dir | no_normal | points_only
    d_in: int = 9
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    weight_norm: bool = True
    multires: int = 0
    multires_view: int = 0
    squeeze_out: bool = True
    squeeze_out_scale: float = 1.0
    output_bias: float = 0.0
    output_scale: float = 1.0
    skip_in: Tuple[int, ...] = ()
    # 'bfloat16' runs the MLP matmuls/activations in bf16 (weights cast
    # per-layer after the f32 weight-norm; output cast back to f32) —
    # MXU-native mixed precision for the stage-2 material sweep
    # (Stage2Config.mat_bf16 / BENCH_NOTES roadmap 6).  None = f32.
    compute_dtype: Optional[str] = None

    @property
    def d_input(self) -> int:
        d = self.d_in + self.d_feature
        if self.multires > 0:
            d += pe_dim(self.multires, 3) - 3
        if self.multires_view > 0:
            d += pe_dim(self.multires_view, 3) - 3
        return d

    @property
    def dims(self) -> Tuple[int, ...]:
        dims = [self.d_input] + [self.d_hidden] * self.n_layers + [self.d_out]
        for l in self.skip_in:
            if not 0 < l < len(dims):
                raise ValueError(
                    f"skip_in index {l} out of range for n_layers="
                    f"{self.n_layers}; pass skip_in=() (or a layer index "
                    f"< {len(dims)}) when shrinking the network")
            dims[l] += dims[0]
        return tuple(dims)


def init_rendering(key, cfg: RenderingConfig) -> dict:
    dims = cfg.dims
    n = len(dims)
    keys = jax.random.split(key, n - 1)
    layers = []
    for l in range(n - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        layers.append(torch_default_linear(keys[l], dims[l], out_dim, cfg.weight_norm))
    return {"layers": layers}


def rendering_apply(params: dict, cfg: RenderingConfig,
                    points: jnp.ndarray,
                    normals: Optional[jnp.ndarray],
                    view_dirs: Optional[jnp.ndarray],
                    features: jnp.ndarray) -> jnp.ndarray:
    """Query the material head (fields.py:203-239).  Shapes [..., d]."""
    if cfg.multires > 0:
        points = positional_encoding(points, cfg.multires)
    if cfg.multires_view > 0 and cfg.mode not in ("no_view_dir", "points_only"):
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)

    if cfg.mode == "idr":
        inp = jnp.concatenate([points, view_dirs, normals, features], axis=-1)
    elif cfg.mode == "no_view_dir":
        inp = jnp.concatenate([points, normals, features], axis=-1)
    elif cfg.mode == "no_normal":
        inp = jnp.concatenate([points, view_dirs, features], axis=-1)
    elif cfg.mode == "points_only":
        inp = jnp.concatenate([points, features], axis=-1)
    else:
        raise ValueError(f"unknown mode {cfg.mode}")

    h = inp
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    if dt is not None:
        h = h.astype(dt)
        inp = inp.astype(dt)
    n_layers = len(cfg.dims)
    for l in range(n_layers - 1):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inp], axis=-1) / np.sqrt(2).astype(h.dtype)
        h = apply_linear(params["layers"][l], h, dtype=dt)
        if l < n_layers - 2:
            h = jax.nn.relu(h)

    if dt is not None:
        h = h.astype(jnp.float32)
    h = cfg.output_scale * (h + cfg.output_bias)
    if cfg.squeeze_out:
        h = cfg.squeeze_out_scale * jax.nn.sigmoid(h)
    return h
