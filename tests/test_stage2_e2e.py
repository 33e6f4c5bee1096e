"""Stage-2 end-to-end: material recovery on a synthetic flash dataset."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.surface.render import SurfaceRenderConfig
from iron_tpu.train.stage2 import (Stage2Config, Stage2Trainer, init_stage2_params,
                                   init_light_from_cameras)
from iron_tpu.train.checkpoints import stage1_to_stage2
from iron_tpu.train.stage1 import Stage1Config, init_stage1_params

# slow tier (VERDICT r4 item 10): integration/training/8-device tests;
# run with `pytest -m slow` or `-m ""`
pytestmark = pytest.mark.slow


def _small_cfg(renderer="ggx", ps=32, edges=True):
    from iron_tpu.surface.tracer import TracerConfig
    # CPU-friendly tracer: analytic-ish test scenes converge in few steps
    tracer = TracerConfig(sphere_tracing_iters=16, dense_iters=8,
                          fallback_budget=256)
    return Stage2Config(
        renderer_name=renderer, patch_size=ps,
        surface=SurfaceRenderConfig(edge_budget=128, handle_edges=edges,
                                    tracer=tracer, edge_side_fallback_budget=64),
        num_iters=100, save_freq=10_000)


def test_stage2_step_finite_and_improving():
    data = render_synthetic_dataset("sphere", n_views=6, H=64, W=64, light=30.0)
    cfg = _small_cfg("ggx", ps=32)
    tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"])
    m0 = tr.run(num_iters=2)
    assert np.isfinite(m0["loss"])
    m1 = tr.run(num_iters=40)
    assert np.isfinite(m1["loss"])
    assert m1["img_loss"] < m0["img_loss"]
    leaves = jax.tree_util.tree_leaves(tr.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_stage2_comp_renderer_runs():
    data = render_synthetic_dataset("sphere", n_views=4, H=48, W=48, light=30.0)
    cfg = _small_cfg("comp", ps=24)
    tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"])
    m = tr.run(num_iters=3)
    assert np.isfinite(m["loss"])
    assert "metallicness_loss" in m


def test_stage2_light_init():
    W2Cs = []
    for z in (2.0, 3.0, 4.0):
        W2C = np.eye(4, dtype=np.float32)
        W2C[2, 3] = -z
        W2Cs.append(W2C)
    light = init_light_from_cameras(np.stack(W2Cs), scale=8.0)
    np.testing.assert_allclose(light, 8.0 * 9.0, rtol=1e-5)


def test_stage1_to_stage2_conversion():
    k = jax.random.PRNGKey(0)
    s1 = init_stage1_params(k, Stage1Config())
    s2, _ = init_stage2_params(jax.random.PRNGKey(1), Stage2Config(renderer_name="comp"))
    out = stage1_to_stage2(s1, s2)
    # sdf transferred verbatim
    a = jax.tree_util.tree_leaves(out["sdf"])
    b = jax.tree_util.tree_leaves(s1["sdf"])
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
    # diffuse albedo warm-started from stage-1 color net (identical archs)
    a = jax.tree_util.tree_leaves(out["materials"]["diffuse_albedo_network"])
    b = jax.tree_util.tree_leaves(s1["color"])
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_stage2_component_freezing():
    data = render_synthetic_dataset("sphere", n_views=3, H=48, W=48, light=30.0)
    cfg = _small_cfg("ggx", ps=24, edges=False)
    trainable = {"sdf": False, "specular_roughness_network": False}
    tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"],
                       trainable=trainable)
    sdf_before = jax.tree_util.tree_leaves(tr.params["sdf"])
    rough_before = jax.tree_util.tree_leaves(tr.params["materials"]["specular_roughness_network"])
    diff_before = jax.tree_util.tree_leaves(tr.params["materials"]["diffuse_albedo_network"])
    sdf_before = [np.asarray(x).copy() for x in sdf_before]
    rough_before = [np.asarray(x).copy() for x in rough_before]
    diff_before = [np.asarray(x).copy() for x in diff_before]
    tr.run(num_iters=3)
    sdf_after = jax.tree_util.tree_leaves(tr.params["sdf"])
    rough_after = jax.tree_util.tree_leaves(tr.params["materials"]["specular_roughness_network"])
    diff_after = jax.tree_util.tree_leaves(tr.params["materials"]["diffuse_albedo_network"])
    assert all(np.array_equal(a, np.asarray(b)) for a, b in zip(sdf_before, sdf_after))
    assert all(np.array_equal(a, np.asarray(b)) for a, b in zip(rough_before, rough_after))
    assert any(not np.array_equal(a, np.asarray(b)) for a, b in zip(diff_before, diff_after))


def test_mat_bf16_shading_close_to_f32():
    """Stage2Config.mat_bf16 (bf16 material-net sweep, BENCH_NOTES roadmap
    6) must stay within a small image tolerance of the f32 path and train
    finitely."""
    import dataclasses as dc
    from iron_tpu.train.stage2 import build_stage2_fns
    from iron_tpu.surface.render import render_camera
    from iron_tpu.core.camera import make_camera

    data = render_synthetic_dataset("sphere", n_views=2, H=48, W=48, light=30.0)
    cfg = _small_cfg("comp", ps=32, edges=False)
    params, mat_cfgs = init_stage2_params(jax.random.PRNGKey(0), cfg)
    params["materials"]["point_light_network"]["light"] = jnp.asarray(30.0)
    cam = make_camera(np.asarray(data["Ks"][0]), np.asarray(data["W2Cs"][0]),
                      48, 48)

    imgs = {}
    for bf16 in (False, True):
        f = build_stage2_fns(params, mat_cfgs, dc.replace(cfg, mat_bf16=bf16))
        res = render_camera(f["sdf_fn"], f["sdf_all_fn"], f["shade_fn"], cam,
                            cfg.surface)
        imgs[bf16] = np.asarray(res["color"])
    d = np.abs(imgs[True] - imgs[False]).max()
    assert d > 0            # bf16 actually engaged
    assert d < 2e-2, d      # and stays within the documented bound

    # one training step with mat_bf16 stays finite
    tr = Stage2Trainer(dc.replace(cfg, mat_bf16=True), data["images"],
                       data["Ks"], data["W2Cs"])
    m = tr.run(num_iters=2)
    assert np.isfinite(m["loss"])
