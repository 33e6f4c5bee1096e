"""Pinhole camera as an immutable pytree + pure ray/projection functions.

Behavioral spec from reference `models/raytracer.py:240-364` (Camera class):
  * K, W2C are 4x4; rays through pixel centers (uv + 0.5);
  * ray_d = normalize(K^-1 uv_h  rotated to world);  `ray_d_norm` (the
    pre-normalization length) is kept to convert camera-z depth <-> ray
    distance;
  * project(points) = perspective projection via K @ W2C;
  * crop_region shifts the principal point (patch training);
  * resize scales the intrinsics.

TPU-first: Camera is a NamedTuple of arrays, so it can be passed through
`jit` and vmapped over batches of cameras.  Crop offsets are traced values,
so random-crop training does not recompile per crop.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class Camera:
    """Pytree camera: matrices are traced children, (H, W) are static aux
    data — so a jitted render keeps static image shapes while K/W2C may be
    traced (dynamic crops without recompilation)."""

    def __init__(self, K, W2C, K_inv, C2W, H: int, W: int):
        self.K = K
        self.W2C = W2C
        self.K_inv = K_inv
        self.C2W = C2W
        self.H = int(H)
        self.W = int(W)

    def tree_flatten(self):
        return (self.K, self.W2C, self.K_inv, self.C2W), (self.H, self.W)

    @classmethod
    def tree_unflatten(cls, aux, children):
        K, W2C, K_inv, C2W = children
        H, W = aux
        return cls(K, W2C, K_inv, C2W, H, W)

    def _replace(self, **kw):
        fields = dict(K=self.K, W2C=self.W2C, K_inv=self.K_inv, C2W=self.C2W,
                      H=self.H, W=self.W)
        fields.update(kw)
        return Camera(**fields)


def make_camera(K, W2C, H: int, W: int) -> Camera:
    K = jnp.asarray(K, dtype=jnp.float32)
    W2C = jnp.asarray(W2C, dtype=jnp.float32)
    return Camera(K=K, W2C=W2C, K_inv=jnp.linalg.inv(K), C2W=jnp.linalg.inv(W2C),
                  H=int(H), W=int(W))


def camera_origin(cam: Camera) -> jnp.ndarray:
    """World-space camera center (raytracer.py:288-298)."""
    return cam.C2W[:3, 3]


def pixel_grid(H: int, W: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, 2] pixel-center uv coordinates (raytracer.py:300-303)."""
    u = jnp.arange(W, dtype=dtype)
    v = jnp.arange(H, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1) + 0.5


def get_rays(cam: Camera, uv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """uv [..., 2] -> (ray_o, ray_d, ray_d_norm) per raytracer.py:254-286.

    ray_d is unit length; ray_d_norm is the length of the un-normalized
    direction (camera-z depth = distance / ray_d_norm).
    """
    # HIGHEST precision: sub-pixel ray geometry is load-bearing for edge
    # sampling; the TPU default matmul pass is too coarse for it.
    hp = jax.lax.Precision.HIGHEST
    uv_h = jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)  # [...,3]
    d_cam = jnp.dot(uv_h, cam.K_inv[:3, :3].T, precision=hp)
    d_world = jnp.dot(d_cam, cam.C2W[:3, :3].T, precision=hp)
    ray_d_norm = jnp.linalg.norm(d_world, axis=-1)
    ray_d = d_world / ray_d_norm[..., None]
    ray_o = jnp.broadcast_to(cam.C2W[:3, 3], ray_d.shape)
    return ray_o, ray_d, ray_d_norm


def project(cam: Camera, points: jnp.ndarray) -> jnp.ndarray:
    """World points [..., 3] -> pixel uv [..., 2] (raytracer.py:305-325)."""
    hp = jax.lax.Precision.HIGHEST
    p_h = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    uvw = jnp.dot(jnp.dot(p_h, cam.W2C.T, precision=hp), cam.K.T, precision=hp)
    return uvw[..., :2] / uvw[..., 2:3]


def crop_camera(cam: Camera, ul_col, ul_row, trgt_W: int, trgt_H: int) -> Camera:
    """Shift the principal point for a (ul_col, ul_row, trgt_W, trgt_H) crop
    (raytracer.py:327-351).  Offsets may be traced (dynamic crops under jit).
    """
    K = cam.K.at[0, 2].add(-jnp.asarray(ul_col, dtype=cam.K.dtype))
    K = K.at[1, 2].add(-jnp.asarray(ul_row, dtype=cam.K.dtype))
    return Camera(K=K, W2C=cam.W2C, K_inv=jnp.linalg.inv(K), C2W=cam.C2W,
                  H=int(trgt_H), W=int(trgt_W))


def resize_camera(cam: Camera, factor: float) -> Camera:
    """Scale intrinsics for a resized render (raytracer.py:353-364)."""
    trgt_H, trgt_W = int(cam.H * factor), int(cam.W * factor)
    K = cam.K.at[0, :3].mul(trgt_W / cam.W)
    K = K.at[1, :3].mul(trgt_H / cam.H)
    return Camera(K=K, W2C=cam.W2C, K_inv=jnp.linalg.inv(K), C2W=cam.C2W,
                  H=trgt_H, W=trgt_W)


def random_crop_offsets(rng: np.random.Generator, cam: Camera, trgt_W: int, trgt_H: int):
    """Host-side random upper-left corner like raytracer.py:337-338."""
    ul_col = int(rng.integers(0, cam.W - trgt_W))
    ul_row = int(rng.integers(0, cam.H - trgt_H))
    return ul_col, ul_row
