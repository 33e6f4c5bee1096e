"""Background NeRF MLP (single- and dual-spectrum heads).

Behavioral spec from reference `models/fields.py:243-412` (NeRF, NeRFdual):
  * D=8 W=256 trunk on PE(points); skip concat [input_pts, h] after the
    relu of layer i in `skips` (nerf-pytorch layout);
  * view-dependent head: alpha = Linear(W,1)(h); feature = Linear(W,W)(h);
    h = relu(Linear(W + pe_view, W//2)(cat(feature, views)));
    rgb = Linear(W//2, 3)(h)  [+ nir = Linear(W//2, 1)(h) for dual];
  * forward returns (density, rgb[, nir]) — consumed by the NeuS outside
    renderer with softplus(density) (renderer.py:173-174).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from iron_tpu.core.embedder import positional_encoding, pe_dim
from iron_tpu.fields.mlp import torch_default_linear, apply_linear


@dataclass(frozen=True)
class NeRFConfig:
    D: int = 8
    W: int = 256
    d_in: int = 4              # inverted-sphere background: (x/r, 1/r)
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    dual: bool = False         # extra 1-channel NIR head (fields.py:329-412)

    @property
    def input_ch(self) -> int:
        return pe_dim(self.multires, self.d_in)

    @property
    def input_ch_view(self) -> int:
        return pe_dim(self.multires_view, self.d_in_view)


def init_nerf(key, cfg: NeRFConfig = NeRFConfig()) -> dict:
    keys = jax.random.split(key, cfg.D + 5)
    pts_linears = []
    for i in range(cfg.D):
        if i == 0:
            d_in = cfg.input_ch
        elif (i - 1) in cfg.skips:
            d_in = cfg.W + cfg.input_ch
        else:
            d_in = cfg.W
        pts_linears.append(torch_default_linear(keys[i], d_in, cfg.W, weight_norm=False))
    params = {
        "pts_linears": pts_linears,
        "feature_linear": torch_default_linear(keys[cfg.D], cfg.W, cfg.W, False),
        "alpha_linear": torch_default_linear(keys[cfg.D + 1], cfg.W, 1, False),
        "views_linear": torch_default_linear(keys[cfg.D + 2], cfg.input_ch_view + cfg.W, cfg.W // 2, False),
        "rgb_linear": torch_default_linear(keys[cfg.D + 3], cfg.W // 2, 3, False),
    }
    if cfg.dual:
        params["nir_linear"] = torch_default_linear(keys[cfg.D + 4], cfg.W // 2, 1, False)
    return params


def nerf_apply(params: dict, cfg: NeRFConfig, pts: jnp.ndarray, views: jnp.ndarray):
    """[..., d_in], [..., 3] -> (density [..., 1], rgb [..., 3][, nir [..., 1]])."""
    input_pts = positional_encoding(pts, cfg.multires)
    input_views = positional_encoding(views, cfg.multires_view)

    h = input_pts
    for i in range(cfg.D):
        h = jax.nn.relu(apply_linear(params["pts_linears"][i], h))
        if i in cfg.skips:
            h = jnp.concatenate([input_pts, h], axis=-1)

    alpha = apply_linear(params["alpha_linear"], h)
    feature = apply_linear(params["feature_linear"], h)
    h = jnp.concatenate([feature, input_views], axis=-1)
    h = jax.nn.relu(apply_linear(params["views_linear"], h))
    rgb = apply_linear(params["rgb_linear"], h)
    if cfg.dual:
        nir = apply_linear(params["nir_linear"], h)
        return alpha, rgb, nir
    return alpha, rgb
