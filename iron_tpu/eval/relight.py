"""Relighting validation of exported assets.

Replaces the reference's Mitsuba-docker relighting scripts
(`test_mitsuba/render_rgb_envmap_mat.py` / `render_rgb_flash_mat.py`:
re-render the exported mesh + baked textures under novel lighting to
validate the export).  Here the exported .obj + texture atlas is ray-traced
with the native BVH (iron_tpu/native) and shaded with the same analytic
co-located GGX BRDF, under a point light at an arbitrary position.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from iron_tpu.core.camera import Camera, pixel_grid, get_rays
from iron_tpu.export.mesh import read_obj
from iron_tpu.native import ray_mesh_intersect
from iron_tpu.shading.brdf import ggx_colocated
from iron_tpu.shading.fresnel import smith_g1, ggx_ndf, fresnel_dielectric
from iron_tpu.data.io import read_image
import os


def _sample_atlas(atlas: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Nearest-texel lookup with the baking convention (v flipped,
    export_materials.py:96-98)."""
    H, W = atlas.shape[:2]
    col = np.clip((uv[:, 0] * W).astype(np.int64), 0, W - 1)
    row = np.clip((H - uv[:, 1] * H).astype(np.int64), 0, H - 1)
    return atlas[row, col]


def render_mesh_flash(mesh_path: str, material_dir: str, cam: Camera,
                      light: float,
                      light_pos: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
    """Render the exported mesh under a point light (co-located with the
    camera when light_pos is None; novel position = true relighting)."""
    verts, tris, uvs, tri_uvs = read_obj(mesh_path)
    diffuse_map = read_image(os.path.join(material_dir, "diffuse_albedo.png"))
    specular_map = read_image(os.path.join(material_dir, "specular_albedo.png"))
    rough_map = read_image(os.path.join(material_dir, "roughness.png"))

    uv_grid = pixel_grid(cam.H, cam.W)
    ray_o, ray_d, _ = get_rays(cam, uv_grid)
    ro = np.asarray(ray_o).reshape(-1, 3)
    rd = np.asarray(ray_d).reshape(-1, 3)

    t, tri_idx, bary = ray_mesh_intersect(ro, rd, verts, tris)
    hit = t > 0
    t_safe = np.where(hit, t, 1.0)
    pts = ro + rd * t_safe[:, None]

    tri_safe = np.clip(tri_idx, 0, len(tris) - 1)
    # geometric normals
    a = verts[tris[tri_safe, 0]]
    b = verts[tris[tri_safe, 1]]
    c = verts[tris[tri_safe, 2]]
    n = np.cross(b - a, c - a)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
    # orient towards the viewer
    n = np.where(np.sum(n * rd, axis=-1, keepdims=True) > 0, -n, n)

    # interpolated UVs
    if len(uvs) > 0:
        ua = uvs[tri_uvs[tri_safe, 0]]
        ub = uvs[tri_uvs[tri_safe, 1]]
        uc = uvs[tri_uvs[tri_safe, 2]]
        w0 = (1 - bary[:, 0] - bary[:, 1])[:, None]
        uv_hit = w0 * ua + bary[:, 0:1] * ub + bary[:, 1:2] * uc
        diffuse = _sample_atlas(diffuse_map, uv_hit)
        specular = _sample_atlas(specular_map, uv_hit)
        rough = _sample_atlas(rough_map, uv_hit)[:, :1]
    else:
        diffuse = np.full_like(pts, 0.5)
        specular = np.full_like(pts, 0.2)
        rough = np.full((len(pts), 1), 0.3, np.float32)

    lp = np.asarray(np.asarray(cam.C2W)[:3, 3] if light_pos is None else light_pos,
                    np.float32)
    wi = lp[None] - pts
    dist = np.linalg.norm(wi, axis=-1, keepdims=True)
    wi = wi / (dist + 1e-12)
    wo = -rd

    # general (non-colocated) GGX roughplastic-style shading
    cos_i = np.clip(np.sum(n * wi, axis=-1, keepdims=True), 1e-5, 1 - 1e-5)
    cos_o = np.clip(np.sum(n * wo, axis=-1, keepdims=True), 1e-5, 1 - 1e-5)
    h = wi + wo
    h /= np.linalg.norm(h, axis=-1, keepdims=True) + 1e-12
    cos_h = np.clip(np.sum(n * h, axis=-1, keepdims=True), 1e-5, 1 - 1e-5)

    alpha = np.clip(rough, 1e-4, None)
    D = np.asarray(ggx_ndf(jnp.asarray(cos_h), jnp.asarray(alpha)))
    G = np.asarray(smith_g1(jnp.asarray(cos_i), jnp.asarray(alpha))
                   * smith_g1(jnp.asarray(cos_o), jnp.asarray(alpha)))
    F = np.asarray(fresnel_dielectric(jnp.asarray(
        np.clip(np.sum(h * wi, axis=-1, keepdims=True), 1e-5, 1 - 1e-5)), 1.48958738))
    li = light / (dist * dist + 1e-10)
    spec = li * specular * F * D * G / (4.0 * cos_o + 1e-10)
    diff = li * diffuse / np.pi * cos_i
    color = np.where(hit[:, None], diff + spec, 0.0)

    H, W = cam.H, cam.W
    return {
        "color": color.reshape(H, W, 3).astype(np.float32),
        "depth": np.where(hit, t, 0.0).reshape(H, W),
        "mask": hit.reshape(H, W),
        "normal": np.where(hit[:, None], n, 0.0).reshape(H, W, 3),
    }
