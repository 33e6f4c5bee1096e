"""Relighting validation tests: exported assets re-rendered under flash and
novel lighting must match the SDF-path render (the reference validates via
Mitsuba; here the mesh ray tracer is the independent renderer)."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from iron_tpu.core.camera import make_camera
from iron_tpu.export.mesh import export_mesh
from iron_tpu.export.uv import unwrap_obj
from iron_tpu.export.materials import export_materials
from iron_tpu.eval.relight import render_mesh_flash
from iron_tpu.native import ray_mesh_intersect


def _cam(H=64, W=64, f=80.0, z=3.0):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = f
    K[0, 2], K[1, 2] = W / 2, H / 2
    W2C = np.eye(4, dtype=np.float32)
    W2C[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    W2C[2, 3] = z
    return make_camera(K, W2C, H, W)


@pytest.fixture(scope="module")
def exported_assets(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("assets")
    sdf = lambda p: jnp.linalg.norm(p, axis=-1) - 0.5
    mesh_path = str(tmp / "mesh.obj")
    export_mesh(sdf, mesh_path, resolution=64, low_res=40)
    unwrap_obj(mesh_path, mesh_path)

    def predictor(p):
        return (jnp.full(p.shape[:-1] + (3,), 0.6),
                jnp.full(p.shape[:-1] + (3,), 0.25),
                jnp.full(p.shape[:-1] + (1,), 0.3))

    export_materials(mesh_path, predictor, str(tmp), n_rounds=2,
                     samples_per_round=300_000, texture_H=512, texture_W=512)
    return str(tmp), mesh_path


def test_flash_render_geometry(exported_assets):
    out_dir, mesh_path = exported_assets
    cam = _cam()
    res = render_mesh_flash(mesh_path, out_dir, cam, light=30.0)
    # silhouette matches the r=0.5 sphere (screen radius ~13.5 px at f=80,z=3)
    frac = res["mask"].mean()
    assert abs(frac - np.pi * 13.5 ** 2 / 64 ** 2) < 0.05
    # center depth = 2.5
    np.testing.assert_allclose(res["depth"][32, 32], 2.5, atol=0.02)
    assert res["color"][32, 32].min() > 0.0


def test_novel_light_moves_shading(exported_assets):
    out_dir, mesh_path = exported_assets
    cam = _cam()
    co = render_mesh_flash(mesh_path, out_dir, cam, light=30.0)
    side = render_mesh_flash(mesh_path, out_dir, cam, light=30.0,
                             light_pos=np.asarray([3.0, 0.0, 0.0]))
    m = co["mask"]
    # relit image differs substantially on the object
    diff = np.abs(co["color"] - side["color"])[m].mean()
    assert diff > 0.02
    # lit-from-the-right: right half brighter than left half under side light
    right = side["color"][:, 33:][m[:, 33:]].mean()
    left = side["color"][:, :32][m[:, :32]].mean()
    assert right > left
