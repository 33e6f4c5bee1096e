"""Multi-device tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from iron_tpu.dist.mesh import make_mesh, replicate, shard_batch
from iron_tpu.dist.train import (make_dp_stage1_step, stage1_param_shardings,
                                 make_dp_stage2_step)
from iron_tpu.train.stage1 import Stage1Config, init_stage1_params, stage1_loss
from iron_tpu.train.stage2 import (Stage2Config, init_stage2_params, make_optimizer,
                                   init_light_from_cameras)
from iron_tpu.train.schedules import warmup_cosine_schedule
from iron_tpu.volume.integrator import NeuSRenderConfig
from iron_tpu.surface.render import SurfaceRenderConfig
from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.data.dataset import RayDataset

# slow tier (VERDICT r4 item 10): integration/training/8-device tests;
# run with `pytest -m slow` or `-m ""`
pytestmark = pytest.mark.slow


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def _tiny_stage1_cfg():
    return Stage1Config(end_iter=10, warm_up_end=2, anneal_end=5, batch_size=64,
                        render=NeuSRenderConfig(n_samples=8, n_importance=8,
                                                n_outside=4, up_sample_steps=2,
                                                perturb=1.0))


def _ray_batch(n):
    g = np.random.default_rng(0)
    d = g.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = 3.0 * d
    rgb = g.uniform(size=(n, 3))
    m = np.ones((n, 1))
    return jnp.asarray(np.concatenate([o, -d, rgb, m], -1), jnp.float32)


def test_dp_stage1_step_matches_single_device():
    _need_devices(8)
    mesh = make_mesh(dp=8, tp=1)
    cfg = _tiny_stage1_cfg()
    params = init_stage1_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(warmup_cosine_schedule(5e-4, 2, 10))
    opt_state = tx.init(params)
    batch = _ray_batch(128)
    key = jax.random.PRNGKey(1)

    # single-device reference step
    def ref_step(params, opt_state):
        (l, m), g = jax.value_and_grad(stage1_loss, has_aux=True)(
            params, cfg, batch, key, 0.5)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), m

    ref_params, ref_m = ref_step(params, opt_state)

    step = make_dp_stage1_step(cfg, tx, mesh, tp_shard=False)
    p_r = replicate(params, mesh)
    o_r = replicate(opt_state, mesh)
    b_s = shard_batch(batch, mesh)
    new_p, new_o, m = step(p_r, o_r, b_s, jnp.asarray(2), key)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_p),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_tp_mesh_stage1_compiles_and_runs():
    _need_devices(8)
    mesh = make_mesh(dp=4, tp=2)
    cfg = _tiny_stage1_cfg()
    params = init_stage1_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    shardings = stage1_param_shardings(params, mesh, tp_shard=True)
    params = jax.device_put(params, shardings)
    opt_state = tx.init(params)

    step = make_dp_stage1_step(cfg, tx, mesh, tp_shard=True)
    batch = shard_batch(_ray_batch(64), mesh)
    p, o, m = step(params, opt_state, batch, jnp.asarray(1), jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


def test_dp_stage2_step_runs():
    _need_devices(8)
    mesh = make_mesh(dp=8, tp=1)
    data = render_synthetic_dataset("sphere", n_views=3, H=48, W=48, light=30.0)
    from iron_tpu.surface.tracer import TracerConfig
    cfg = Stage2Config(renderer_name="ggx", patch_size=16,
                       surface=SurfaceRenderConfig(
                           edge_budget=64, edge_side_fallback_budget=16,
                           tracer=TracerConfig(sphere_tracing_iters=16,
                                               dense_iters=8,
                                               fallback_budget=64)))
    params, mat_cfgs = init_stage2_params(jax.random.PRNGKey(0), cfg)
    params["materials"]["point_light_network"]["light"] = jnp.asarray(
        init_light_from_cameras(data["W2Cs"]), jnp.float32)
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    step = make_dp_stage2_step(cfg, mat_cfgs, tx, mesh,
                               data["images"], data["Ks"], data["W2Cs"])
    D = 8
    keys = jax.random.split(jax.random.PRNGKey(1), D)
    img_idx = jnp.zeros((D,), jnp.int32)
    ul = jnp.asarray(np.random.default_rng(0).integers(0, 32, size=(2, D)), jnp.int32)
    p, o, m = step(replicate(params, mesh), replicate(opt_state, mesh),
                   shard_batch(keys, mesh), shard_batch(img_idx, mesh),
                   shard_batch(ul[0], mesh), shard_batch(ul[1], mesh))
    assert np.isfinite(float(m["loss"]))


def test_dp_stage2_step_matches_single_device():
    """shard_map dp step == single-device step when every shard gets the
    same crop (pmean of identical grads is the identity): the multi-chip
    path must not change the program semantics (VERDICT r2 item 2)."""
    _need_devices(8)
    mesh = make_mesh(dp=8, tp=1)
    data = render_synthetic_dataset("sphere", n_views=2, H=48, W=48, light=30.0)
    from iron_tpu.surface.tracer import TracerConfig
    from iron_tpu.train.stage2 import stage2_loss
    from iron_tpu.core.camera import Camera, crop_camera
    cfg = Stage2Config(renderer_name="ggx", patch_size=16,
                       surface=SurfaceRenderConfig(
                           edge_budget=64, edge_side_fallback_budget=16,
                           interior_budget=128,
                           tracer=TracerConfig(sphere_tracing_iters=16,
                                               dense_iters=8,
                                               fallback_budget=64)))
    params, mat_cfgs = init_stage2_params(jax.random.PRNGKey(0), cfg)
    params["materials"]["point_light_network"]["light"] = jnp.asarray(
        init_light_from_cameras(data["W2Cs"]), jnp.float32)
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    # single-device reference step on one fixed crop
    key = jax.random.PRNGKey(7)
    img_idx, ul_col, ul_row = 1, 5, 9
    images = jnp.asarray(data["images"], jnp.float32)
    K = jnp.asarray(data["Ks"][img_idx], jnp.float32)
    W2C = jnp.asarray(data["W2Cs"][img_idx], jnp.float32)
    base = Camera(K=K, W2C=W2C, K_inv=jnp.linalg.inv(K),
                  C2W=jnp.linalg.inv(W2C), H=48, W=48)
    cam = crop_camera(base, ul_col, ul_row, 16, 16)
    gt = jax.lax.dynamic_slice(images[img_idx], (ul_row, ul_col, 0), (16, 16, 3))
    (_, _), grads = jax.value_and_grad(stage2_loss, has_aux=True)(
        params, mat_cfgs, cfg, cam, gt, key)
    updates, _ = tx.update(grads, opt_state, params)
    ref_params = optax.apply_updates(params, updates)

    # dp step: all 8 shards get the SAME crop
    step = make_dp_stage2_step(cfg, mat_cfgs, tx, mesh,
                               data["images"], data["Ks"], data["W2Cs"])
    D = 8
    keys = jnp.tile(key[None], (D, 1))
    p, o, m = step(replicate(params, mesh), replicate(opt_state, mesh),
                   shard_batch(keys, mesh),
                   shard_batch(jnp.full((D,), img_idx, jnp.int32), mesh),
                   shard_batch(jnp.full((D,), ul_col, jnp.int32), mesh),
                   shard_batch(jnp.full((D,), ul_row, jnp.int32), mesh))
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dp_stage2_per_shard_data_matches_replicated():
    """The per-shard-data stage-2 step (images an argument sharded over dp
    on the view axis, LOCAL indices — SURVEY §2.5 stage-2 per-host shards)
    computes exactly what the replicated-closure step computes when global
    view g lives on shard g (local index 0 everywhere)."""
    _need_devices(8)
    mesh = make_mesh(dp=8, tp=1)
    D = 8
    data = render_synthetic_dataset("sphere", n_views=D, H=48, W=48, light=30.0)
    from iron_tpu.surface.tracer import TracerConfig
    from iron_tpu.dist.train import host_sharded_views
    cfg = Stage2Config(renderer_name="ggx", patch_size=16,
                       surface=SurfaceRenderConfig(
                           edge_budget=64, edge_side_fallback_budget=16,
                           tracer=TracerConfig(sphere_tracing_iters=16,
                                               dense_iters=8,
                                               fallback_budget=64)))
    params, mat_cfgs = init_stage2_params(jax.random.PRNGKey(0), cfg)
    params["materials"]["point_light_network"]["light"] = jnp.asarray(
        init_light_from_cameras(data["W2Cs"]), jnp.float32)
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    keys = jax.random.split(jax.random.PRNGKey(1), D)
    g = np.random.default_rng(0)
    cols = jnp.asarray(g.integers(0, 32, size=(D,)), jnp.int32)
    rows = jnp.asarray(g.integers(0, 32, size=(D,)), jnp.int32)

    # fresh copies BEFORE the first (donating) step consumes the buffers
    # that replicate() aliases
    params2 = jax.tree_util.tree_map(jnp.array, params)
    opt_state2 = jax.tree_util.tree_map(jnp.array, opt_state)

    # replicated-closure step, global index = shard index
    step_r = make_dp_stage2_step(cfg, mat_cfgs, tx, mesh,
                                 data["images"], data["Ks"], data["W2Cs"])
    p_r, o_r, m_r = step_r(replicate(params, mesh), replicate(opt_state, mesh),
                           shard_batch(keys, mesh),
                           shard_batch(jnp.arange(D, dtype=jnp.int32), mesh),
                           shard_batch(cols, mesh), shard_batch(rows, mesh))
    step_s = make_dp_stage2_step(cfg, mat_cfgs, tx, mesh, per_shard_data=True)
    imgs_g, Ks_g, W2Cs_g = host_sharded_views(
        data["images"], data["Ks"], data["W2Cs"], mesh)
    p_s, o_s, m_s = step_s(replicate(params2, mesh), replicate(opt_state2, mesh),
                           imgs_g, Ks_g, W2Cs_g,
                           shard_batch(keys, mesh),
                           shard_batch(jnp.zeros((D,), jnp.int32), mesh),
                           shard_batch(cols, mesh), shard_batch(rows, mesh))

    assert np.isfinite(float(m_s["loss"]))
    np.testing.assert_allclose(float(m_r["loss"]), float(m_s["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_r),
                    jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dp_stage1_render_matches_single_device():
    """Sharded full-image render == the chunked single-device render."""
    _need_devices(8)
    mesh = make_mesh(dp=8, tp=1)
    cfg = _tiny_stage1_cfg()
    params = init_stage1_params(jax.random.PRNGKey(0), cfg)

    from iron_tpu.dist.train import make_dp_stage1_render
    from iron_tpu.train.stage1 import stage1_render
    from iron_tpu.data.dataset import near_far_from_sphere

    n = 256
    g = np.random.default_rng(1)
    d = g.normal(size=(n, 3)); d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(3.0 * d, jnp.float32)
    rd = jnp.asarray(-d, jnp.float32)

    render = make_dp_stage1_render(cfg, mesh)
    color, normal = render(params, ro, rd)

    near, far = near_far_from_sphere(ro, rd)
    ref = stage1_render(params, cfg, ro, rd, near, far, None, 1.0, None,
                        perturb_overwrite=0.0)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref["color_fine"]),
                               atol=1e-5)
    assert color.shape == (n, 3) and normal.shape == (n, 3)


def test_dp_stage2_render_matches_single_device():
    """Band-sharded full-image surface render == one-camera render_camera."""
    _need_devices(8)
    mesh = make_mesh(dp=8, tp=1)
    data = render_synthetic_dataset("sphere", n_views=2, H=48, W=48, light=30.0)
    from iron_tpu.surface.tracer import TracerConfig
    # fallback_budget=None: static budgets are per-render-call, so a band
    # render would otherwise have 8x the effective budget of the full image
    # and converge rays the full render starves (documented deviation #4) —
    # full-tile fallback makes band and full renders geometrically identical
    cfg = Stage2Config(renderer_name="ggx", patch_size=16,
                       surface=SurfaceRenderConfig(
                           edge_budget=64, edge_side_fallback_budget=16,
                           handle_edges=False,
                           tracer=TracerConfig(sphere_tracing_iters=24,
                                               dense_iters=24,
                                               fallback_budget=None)))
    params, mat_cfgs = init_stage2_params(jax.random.PRNGKey(0), cfg)
    params["materials"]["point_light_network"]["light"] = jnp.asarray(
        init_light_from_cameras(data["W2Cs"]), jnp.float32)

    from iron_tpu.dist.train import make_dp_stage2_render
    from iron_tpu.train.stage2 import stage2_render_buffers
    from iron_tpu.core.camera import make_camera

    H = W = 48
    render = make_dp_stage2_render(cfg, mat_cfgs, mesh, H, W)
    out = render(params, jnp.asarray(data["Ks"][0]), jnp.asarray(data["W2Cs"][0]))
    assert out["color"].shape == (H, W, 3)

    cam = make_camera(np.asarray(data["Ks"][0]), np.asarray(data["W2Cs"][0]), H, W)
    ref = stage2_render_buffers(params, mat_cfgs, cfg, cam)
    # band-sharded hole filling / depth ops only differ at band seams for
    # edge-dependent buffers; with edges off the pipeline is purely per-ray
    # except the 3x3 closing, so compare away from band boundaries
    rows = np.setdiff1d(np.arange(H), np.concatenate(
        [np.arange(H, step=H // 8), np.arange(H, step=H // 8) - 1]))
    # crop rays differ from full-grid rays at float ulp level, which can
    # flip grazing silhouette rays to a marginally different root — allow
    # sub-1e-2 color differences and a handful of disagreeing mask pixels
    np.testing.assert_allclose(np.asarray(out["color"])[rows],
                               np.asarray(ref["color"])[rows], atol=1e-2)
    mask_diff = (np.asarray(out["convergent_mask"])[rows]
                 != np.asarray(ref["convergent_mask"])[rows])
    assert mask_diff.mean() < 0.005
