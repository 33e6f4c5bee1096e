"""Aux subsystem tests: NeRF density renderer, hash-grid runner, debug
buffers, job generation, visualization, profiling."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iron_tpu.volume.integrator import nerf_density_render
from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.data.dataset import RayDataset


def test_nerf_density_render_analytic():
    """A dense absorbing ball renders its color with near-total opacity."""
    def nerf_fn(pts, dirs):
        inside = (jnp.linalg.norm(pts, axis=-1, keepdims=True) < 0.5)
        density = jnp.where(inside, 50.0, -10.0)
        rgb = jnp.broadcast_to(jnp.asarray([0.2, 0.5, 0.9]), pts.shape[:-1] + (3,))
        return density, rgb

    ray_o = jnp.asarray([[0.0, 0.0, 3.0]])
    ray_d = jnp.asarray([[0.0, 0.0, -1.0]])
    out = nerf_density_render(ray_o, ray_d, jnp.asarray([[2.0]]), jnp.asarray([[4.0]]),
                              nerf_fn, n_samples=128)
    w = float(jnp.sum(out["weights"]))
    assert w > 0.98
    np.testing.assert_allclose(np.asarray(out["color"][0]), [0.2, 0.5, 0.9], atol=0.02)


def test_hash_nerf_trainer_learns():
    from iron_tpu.train.nerf_runner import NeRFRunnerConfig, HashNeRFTrainer
    from iron_tpu.fields.hashgrid import HashNeRFConfig, HashGridConfig

    data = render_synthetic_dataset("sphere", n_views=4, H=32, W=32, light=30.0)
    ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                                data["masks"])
    cfg = NeRFRunnerConfig(
        nerf=HashNeRFConfig(grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                                base_resolution=4, per_level_scale=2.0)),
        n_samples=32, batch_size=256, end_iter=100, warm_up_end=10)
    tr = HashNeRFTrainer(cfg, ds)
    m0 = tr.run(5)
    m1 = tr.run(60)
    assert m1["loss"] < m0["loss"]
    assert m1["psnr"] > m0["psnr"]


def test_render_camera_debug_buffers():
    from iron_tpu.core.camera import make_camera
    from iron_tpu.surface.render import SurfaceRenderConfig, render_camera

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 80.0
    K[0, 2] = K[1, 2] = 32.0
    W2C = np.eye(4, dtype=np.float32)
    W2C[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    W2C[2, 3] = 3.0
    cam = make_camera(K, W2C, 64, 64)
    sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - 0.5

    def sdf_all_fn(p):
        n = jnp.linalg.norm(p, axis=-1)
        return n - 0.5, jnp.zeros(p.shape[:-1] + (4,)), p / (n[..., None] + 1e-9)

    shade = lambda ro, rd, pts, nrm, ft: {
        "color": jnp.ones(pts.shape[:-1] + (3,)) * 0.5,
        "normal": nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-10)}
    res = render_camera(sdf_fn, sdf_all_fn, shade, cam,
                        SurfaceRenderConfig(edge_budget=256), debug=True)
    for k in ["depth_grad_norm", "depth_edge_mask", "edge_pos_side_weight",
              "edge_pos_side_depth", "edge_neg_side_depth", "edge_pos_side_color",
              "edge_neg_side_color", "edge_angles", "edge_sdf"]:
        assert k in res, k
    em = np.asarray(res["edge_mask"])
    # edge angles near 90 deg where found
    ang = np.asarray(res["edge_angles"])[em]
    assert np.all(np.abs(ang - 90.0) < 5.0)


def test_gen_jobs(tmp_path):
    from iron_tpu.cli.gen_jobs import generate
    paths = generate(["dragon", "pony"], "conf.json", "/data", "/exp",
                     str(tmp_path), slurm=True)
    assert len(paths) == 2
    text = open(paths[0]).read()
    assert "iron_tpu.cli.train_volume" in text and "#SBATCH" in text
    assert os.path.exists(tmp_path / "submit_all.sh")


def test_camera_plot_and_fresnel_plot(tmp_path):
    from iron_tpu.utils.visualize import plot_cameras, plot_fresnel_terms
    g = np.random.default_rng(0)
    cams = {}
    for i in range(3):
        W2C = np.eye(4)
        W2C[:3, 3] = g.normal(size=3)
        cams[f"{i}.png"] = {"K": np.diag([100, 100, 1, 1]).astype(float),
                            "W2C": W2C, "img_size": (64, 64)}
    p1 = str(tmp_path / "cams.png")
    plot_cameras({"train": cams}, p1)
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "fresnel.png")
    plot_fresnel_terms(p2)
    assert os.path.getsize(p2) > 0


def test_timer_and_checkify():
    from iron_tpu.utils.profiling import Timer, checkify_fn
    t = Timer()
    with t.section("a"):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert "a" in t.summary()

    err, out = checkify_fn(lambda x: jnp.log(x))(jnp.asarray(2.0))
    err.throw()  # no error
    np.testing.assert_allclose(float(out), np.log(2.0), rtol=1e-6)


def test_async_checkpointer_roundtrip(tmp_path):
    from iron_tpu.train.checkpoints import AsyncCheckpointer
    ck = AsyncCheckpointer(str(tmp_path))
    tree = {"w": np.arange(6).reshape(2, 3).astype(np.float32),
            "b": {"x": np.ones(4, np.float32)}}
    ck.save(10, tree)
    ck.save(20, tree)
    ck.wait()
    assert ck.latest_step() == 20
    out = ck.restore()
    np.testing.assert_array_equal(out["params"]["w"], tree["w"])
    assert out["extra"]["step"] == 20
    ck.close()


def test_stage2_trainer_async_ckpt_resume(tmp_path):
    """Async orbax checkpointing wired into the trainer: save without
    blocking, then a fresh trainer resumes params + step from the orbax
    dir (SURVEY §5 checkpoint/resume; VERDICT r2 item 9)."""
    import jax
    from iron_tpu.data.synthetic import render_synthetic_dataset
    from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
    from iron_tpu.surface.render import SurfaceRenderConfig
    from iron_tpu.surface.tracer import TracerConfig

    data = render_synthetic_dataset("sphere", n_views=2, H=40, W=40)
    cfg = Stage2Config(renderer_name="ggx", patch_size=24, async_ckpt=True,
                       surface=SurfaceRenderConfig(
                           edge_budget=64,
                           tracer=TracerConfig(fallback_budget=64)))
    tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"],
                       out_dir=str(tmp_path))
    tr.run(num_iters=2)
    tr.save()
    tr.wait_for_saves()

    tr2 = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"],
                        out_dir=str(tmp_path))
    assert tr2.resume() == 2
    a = jax.tree_util.tree_leaves(tr.params)
    b = jax.tree_util.tree_leaves(tr2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_any_checkpoint(tmp_path):
    """load_any_checkpoint resolves pickle files, orbax dirs, and mixed
    experiment dirs (newest step wins)."""
    from iron_tpu.train.checkpoints import (AsyncCheckpointer,
                                            load_any_checkpoint,
                                            save_checkpoint)
    tree = {"w": np.ones(3, np.float32)}
    pkl = save_checkpoint(str(tmp_path), 5, tree)
    assert load_any_checkpoint(pkl)["step"] == 5
    assert load_any_checkpoint(str(tmp_path))["step"] == 5
    ck = AsyncCheckpointer(str(tmp_path))
    ck.save(9, {"w": 2 * np.ones(3, np.float32)})
    ck.close()
    out = load_any_checkpoint(str(tmp_path))
    assert out["step"] == 9
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  2 * np.ones(3, np.float32))


def test_hash_nerf_scene_switches():
    """render_volume_tcnn.py:63-111 scene-component switches: foreground
    hash-SDF + background + learnable envmap compose and train."""
    import jax
    import jax.numpy as jnp
    from iron_tpu.data.dataset import RayDataset
    from iron_tpu.train.nerf_runner import (NeRFRunnerConfig, HashNeRFTrainer,
                                            envmap_color)
    from iron_tpu.fields.hashgrid import (HashNeRFConfig, HashSDFConfig,
                                          HashGridConfig, HashRenderingConfig)

    # envmap lookup: bilinear, wraps in azimuth, differentiable
    env = jnp.arange(16 * 32 * 3, dtype=jnp.float32).reshape(16, 32, 3) / 1536
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    c = envmap_color(env, dirs)
    assert c.shape == (3, 3) and bool(jnp.all(jnp.isfinite(c)))
    g = jax.grad(lambda e: jnp.sum(envmap_color(e, dirs)))(env)
    assert float(jnp.sum(jnp.abs(g))) > 0

    g_np = np.random.default_rng(0)
    imgs = g_np.uniform(size=(2, 24, 24, 3)).astype(np.float32)
    K = np.eye(4, dtype=np.float32); K[0, 0] = K[1, 1] = 30.0
    K[0, 2] = K[1, 2] = 12.0
    W2C = np.eye(4, dtype=np.float32)
    W2C[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    W2C[2, 3] = 3.0
    ds = RayDataset.from_arrays(imgs, np.stack([K, K]), np.stack([W2C, W2C]))

    tiny = HashGridConfig(n_levels=4, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0)
    cfg = NeRFRunnerConfig(
        nerf=HashNeRFConfig(grid=tiny, d_hidden=16, n_layers=2),
        sdf=HashSDFConfig(grid=tiny, d_hidden=16, n_layers=2),
        rendering=HashRenderingConfig(grid=tiny, d_hidden=16, n_layers=2),
        n_samples=12, batch_size=32,
        use_background=True, use_foreground=True, use_envmap=True)
    tr = HashNeRFTrainer(cfg, ds)
    assert set(tr.params) == {"nerf", "sdf", "color", "variance", "envmap"}
    m = tr.run(num_iters=3)
    assert np.isfinite(m["loss"])

    # foreground-only + envmap-only variants also build and step
    cfg2 = NeRFRunnerConfig(
        sdf=HashSDFConfig(grid=tiny, d_hidden=16, n_layers=2),
        rendering=HashRenderingConfig(grid=tiny, d_hidden=16, n_layers=2),
        n_samples=8, batch_size=16,
        use_background=False, use_foreground=True, use_envmap=False)
    m2 = HashNeRFTrainer(cfg2, ds).run(num_iters=2)
    assert np.isfinite(m2["loss"])
