"""Multiresolution hash-grid encoding + hash-grid fields (instant-NGP).

TPU-native replacement for the reference's tinycudann fields
(`models/tcnn_fields.py:10-249`: TCNNSDF / TCNNNeRF / TCNNRendering, which
wrap CUDA-only tcnn HashGrid encodings configured by JSON dicts).  The
encoding here is pure JAX: per level, the 8 cell corners are spatially
hashed into a learned feature table and trilinearly blended — gathers and
blend weights are differentiable, so eikonal terms work through it.

Config mirrors the tcnn JSON (n_levels, n_features_per_level,
log2_hashmap_size, base_resolution, per_level_scale).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# instant-NGP spatial hash primes
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.3819  # ~2048 finest at 16 levels
    bound: float = 1.0               # inputs in [-bound, bound]

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_resolutions(self) -> np.ndarray:
        return np.floor(self.base_resolution
                        * self.per_level_scale ** np.arange(self.n_levels)).astype(np.int64)


def init_hashgrid(key, cfg: HashGridConfig) -> Dict:
    T = 1 << cfg.log2_hashmap_size
    table = jax.random.uniform(key, (cfg.n_levels, T, cfg.n_features_per_level),
                               jnp.float32, -1e-4, 1e-4)
    return {"table": table}


def hashgrid_encode(params: Dict, x: jnp.ndarray, cfg: HashGridConfig) -> jnp.ndarray:
    """[..., 3] in [-bound, bound] -> [..., n_levels * F]."""
    T = 1 << cfg.log2_hashmap_size
    u = (x / cfg.bound + 1.0) * 0.5  # [0, 1]
    u = jnp.clip(u, 0.0, 1.0)
    res = cfg.level_resolutions()
    feats = []
    for lvl in range(cfg.n_levels):
        r = int(res[lvl])
        pos = u * (r - 1)
        p0 = jnp.floor(pos)
        w = pos - p0
        p0 = p0.astype(jnp.int32)
        level_table = params["table"][lvl]

        f = 0.0
        for corner in range(8):
            off = jnp.asarray([(corner >> 0) & 1, (corner >> 1) & 1,
                               (corner >> 2) & 1], jnp.int32)
            pc = jnp.clip(p0 + off, 0, r - 1)
            if (r + 1) ** 3 <= T:  # dense indexing for coarse levels (NGP trick)
                idx = (pc[..., 0] * r + pc[..., 1]) * r + pc[..., 2]
            else:
                pu = pc.astype(jnp.uint32)
                idx = ((pu[..., 0] * jnp.uint32(_PRIMES[0]))
                       ^ (pu[..., 1] * jnp.uint32(_PRIMES[1]))
                       ^ (pu[..., 2] * jnp.uint32(_PRIMES[2])))
                idx = (idx % jnp.uint32(T)).astype(jnp.int32)
            cw = jnp.prod(jnp.where(off == 1, w, 1.0 - w), axis=-1, keepdims=True)
            f = f + cw * level_table[idx]
        feats.append(f)
    return jnp.concatenate(feats, axis=-1)


# ---- hash-grid SDF field (TCNNSDF equivalent) ----

@dataclass(frozen=True)
class HashSDFConfig:
    grid: HashGridConfig = field(default_factory=HashGridConfig)
    d_hidden: int = 64
    n_layers: int = 2
    d_feature: int = 15   # geometric feature dim (d_out = 1 + d_feature)
    sphere_init_radius: float = 0.5


def init_hash_sdf(key, cfg: HashSDFConfig) -> Dict:
    k_grid, *keys = jax.random.split(key, cfg.n_layers + 2)
    params = {"grid": init_hashgrid(k_grid, cfg.grid), "layers": []}
    d_in = cfg.grid.out_dim + 3  # concat raw position
    dims = [d_in] + [cfg.d_hidden] * cfg.n_layers + [1 + cfg.d_feature]
    for l in range(len(dims) - 1):
        bound = 1.0 / np.sqrt(dims[l])
        kw, kb = jax.random.split(keys[l])
        w = jax.random.uniform(kw, (dims[l], dims[l + 1]), jnp.float32, -bound, bound)
        b = jnp.zeros((dims[l + 1],), jnp.float32)
        params["layers"].append({"w": w, "b": b})
    return params


def hash_sdf_apply(params: Dict, x: jnp.ndarray, cfg: HashSDFConfig) -> jnp.ndarray:
    """[..., 3] -> [..., 1 + d_feature]; sdf biased towards a sphere at init."""
    enc = hashgrid_encode(params["grid"], x, cfg.grid)
    h = jnp.concatenate([x, enc], axis=-1)
    n = len(params["layers"])
    for l, lay in enumerate(params["layers"]):
        h = jnp.dot(h, lay["w"], precision="highest") + lay["b"]
        if l < n - 1:
            h = jax.nn.relu(h)
    # residual sphere bias keeps early geometry well-posed (tcnn nets rely on
    # tcnn's own init; here the bias plays the geometric-init role)
    sphere = jnp.linalg.norm(x, axis=-1, keepdims=True) - cfg.sphere_init_radius
    return jnp.concatenate([h[..., :1] + sphere, h[..., 1:]], axis=-1)


def hash_sdf_only(params, x, cfg: HashSDFConfig):
    return hash_sdf_apply(params, x, cfg)[..., 0]


def hash_sdf_value_feat_grad(params, x, cfg: HashSDFConfig):
    out, vjp_fn = jax.vjp(lambda p: hash_sdf_apply(params, p, cfg), x)
    ct = jnp.zeros_like(out).at[..., 0].set(1.0)
    (grad,) = vjp_fn(ct)
    return out[..., 0], out[..., 1:], grad


# ---- hash-grid rendering head (TCNNRendering equivalent) ----

@dataclass(frozen=True)
class HashRenderingConfig:
    grid: HashGridConfig = field(default_factory=HashGridConfig)
    d_feature: int = 15
    d_hidden: int = 64
    n_layers: int = 2
    d_out: int = 3
    multires_view: int = 4
    squeeze_out: bool = True


def init_hash_rendering(key, cfg: HashRenderingConfig) -> Dict:
    from iron_tpu.core.embedder import pe_dim
    k_grid, k_mlp = jax.random.split(key)
    params = {"grid": init_hashgrid(k_grid, cfg.grid), "layers": []}
    d_in = cfg.grid.out_dim + 3 + 3 + pe_dim(cfg.multires_view, 3) + cfg.d_feature
    dims = [d_in] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]
    keys = jax.random.split(k_mlp, len(dims) - 1)
    for l in range(len(dims) - 1):
        bound = 1.0 / np.sqrt(dims[l])
        params["layers"].append({
            "w": jax.random.uniform(keys[l], (dims[l], dims[l + 1]), jnp.float32,
                                    -bound, bound),
            "b": jnp.zeros((dims[l + 1],), jnp.float32)})
    return params


def hash_rendering_apply(params: Dict, cfg: HashRenderingConfig, points,
                         normals, view_dirs, features) -> jnp.ndarray:
    """Hash-encoded material/color head (tcnn_fields.py TCNNRendering
    equivalent): inputs hash(points) + normals + PE(viewdirs) + features."""
    from iron_tpu.core.embedder import positional_encoding
    enc = hashgrid_encode(params["grid"], points, cfg.grid)
    v = positional_encoding(view_dirs, cfg.multires_view)
    h = jnp.concatenate([points, enc, normals, v, features], axis=-1)
    n = len(params["layers"])
    for l, lay in enumerate(params["layers"]):
        h = jnp.dot(h, lay["w"]) + lay["b"]
        if l < n - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h) if cfg.squeeze_out else h


# ---- hash-grid NeRF (TCNNNeRF equivalent) ----

@dataclass(frozen=True)
class HashNeRFConfig:
    grid: HashGridConfig = field(default_factory=HashGridConfig)
    d_hidden: int = 64
    n_layers: int = 2
    d_geo: int = 15
    multires_view: int = 4
    d_color_hidden: int = 64
    n_color_layers: int = 2


def init_hash_nerf(key, cfg: HashNeRFConfig) -> Dict:
    from iron_tpu.core.embedder import pe_dim
    k_grid, k1, k2 = jax.random.split(key, 3)
    params = {"grid": init_hashgrid(k_grid, cfg.grid)}

    def mlp(key, dims):
        layers = []
        keys = jax.random.split(key, len(dims) - 1)
        for l in range(len(dims) - 1):
            bound = 1.0 / np.sqrt(dims[l])
            kw, kb = jax.random.split(keys[l])
            layers.append({
                "w": jax.random.uniform(kw, (dims[l], dims[l + 1]), jnp.float32,
                                        -bound, bound),
                "b": jnp.zeros((dims[l + 1],), jnp.float32)})
        return layers

    params["sigma_mlp"] = mlp(k1, [cfg.grid.out_dim] + [cfg.d_hidden] * cfg.n_layers
                              + [1 + cfg.d_geo])
    d_view = pe_dim(cfg.multires_view, 3)
    params["color_mlp"] = mlp(k2, [cfg.d_geo + d_view]
                              + [cfg.d_color_hidden] * cfg.n_color_layers + [3])
    return params


def hash_nerf_apply(params: Dict, cfg: HashNeRFConfig, pts: jnp.ndarray,
                    views: jnp.ndarray):
    """(density [..., 1], rgb [..., 3]) like NeRF (tcnn_fields.py TCNNNeRF)."""
    from iron_tpu.core.embedder import positional_encoding

    def run(layers, h, final_act=None):
        for l, lay in enumerate(layers):
            h = jnp.dot(h, lay["w"]) + lay["b"]
            if l < len(layers) - 1:
                h = jax.nn.relu(h)
        return h

    enc = hashgrid_encode(params["grid"], pts[..., :3], cfg.grid)
    geo = run(params["sigma_mlp"], enc)
    sigma, feat = geo[..., :1], geo[..., 1:]
    v = positional_encoding(views, cfg.multires_view)
    rgb = jax.nn.sigmoid(run(params["color_mlp"],
                             jnp.concatenate([feat, v], axis=-1)))
    return sigma, rgb
