"""Does stage-2 preserve genus-1 geometry when started from a PERFECT torus?

The r256 torus quality run collapsed to a genus-0 blob after stage 2
(exp_quality_torus_r256: chamfer 0.27 vs sphere's 0.033).  This isolates
the stage-2 side: fit the SDF network to the analytic torus by direct
regression, start stage 2 from that near-perfect geometry, and track
chamfer / SDF-at-hole / hole topology across training segments.

Usage: python scripts/diag_torus_stage2.py [s2_iters] [segments]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import numpy as np
import jax, jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_only, sdf_grad
from iron_tpu.export.mesh import extract_geometry, largest_component
from iron_tpu.eval.metrics import chamfer_distance
from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
from iron_tpu.surface.render import SurfaceRenderConfig

S2_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 25000
SEGMENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
RES = int(sys.argv[3]) if len(sys.argv) > 3 else 256

data = render_synthetic_dataset("torus", n_views=14, H=RES, W=RES, light=30.0)
gt_sdf = data["sdf_fn"]
gt_v, gt_t = largest_component(*extract_geometry(lambda p: -gt_sdf(p), resolution=128))

# ---- fit the SDF net to the analytic torus by regression ----
cfg = SDFConfig(bias=0.5)
params = init_sdf(jax.random.PRNGKey(0), cfg)
tx = optax.adam(1e-4)
opt = tx.init(params)

def fit_loss(p, key):
    k1, k2 = jax.random.split(key)
    x_vol = jax.random.uniform(k1, (4096, 3), minval=-1.0, maxval=1.0)
    # near-surface points: perturb GT surface samples
    idx = jax.random.randint(k2, (4096,), 0, gt_v.shape[0])
    x_srf = jnp.asarray(gt_v)[idx] + 0.02 * jax.random.normal(k2, (4096, 3))
    x = jnp.concatenate([x_vol, x_srf], 0)
    pred = sdf_only(p, x, cfg)
    return jnp.mean((pred - gt_sdf(x)) ** 2)

@jax.jit
def fit_step(p, o, key):
    l, g = jax.value_and_grad(fit_loss)(p, key)
    u, o = tx.update(g, o, p)
    return optax.apply_updates(p, u), o, l

key = jax.random.PRNGKey(1)
t0 = time.time()
for i in range(4000):
    key, sub = jax.random.split(key)
    params, opt, l = fit_step(params, opt, sub)
print(json.dumps({"fit_loss": float(l), "fit_s": round(time.time() - t0, 1)}),
      flush=True)


def geometry_report(sdf_params, sdf_cfg, tag):
    v, t = extract_geometry(lambda p: -sdf_only(sdf_params, p, sdf_cfg),
                            resolution=128)
    vl, tl = largest_component(v, t)
    # hole probe: SDF along the hole axis (y) at center — positive = open
    probe = jnp.stack([jnp.zeros(5), jnp.linspace(-0.1, 0.1, 5), jnp.zeros(5)], -1)
    rep = {
        "tag": tag,
        "chamfer": float(chamfer_distance(vl, tl, gt_v, gt_t)),
        "verts": int(len(v)), "verts_largest": int(len(vl)),
        "sdf_at_hole": [round(float(s), 4)
                        for s in sdf_only(sdf_params, probe, sdf_cfg)],
    }
    print(json.dumps(rep), flush=True)
    return rep

geometry_report(params, cfg, "fitted_init")

# ---- stage 2 from the fitted geometry (mirror of e2e_validation config) ----
train_idx = list(range(12))
s2_cfg = Stage2Config(renderer_name="ggx", patch_size=min(RES, 128),
                      num_iters=S2_ITERS,
                      surface=SurfaceRenderConfig(edge_budget=1024),
                      save_freq=10 ** 9)
s2 = Stage2Trainer(s2_cfg, data["images"][train_idx], data["Ks"][train_idx],
                   data["W2Cs"][train_idx])
s2.params["sdf"] = params
s2.opt_state = s2.tx.init(s2.params)

seg = S2_ITERS // SEGMENTS
for s in range(SEGMENTS):
    m = s2.run(num_iters=seg, seed=s)
    print(f"[stage2 {s2.step}] " +
          " ".join(f"{k}={v:.4f}" for k, v in m.items()), flush=True)
    geometry_report(s2.params["sdf"], s2_cfg.sdf, f"after_{s2.step}")

light = float(s2.params["materials"]["point_light_network"]["light"])
print(json.dumps({"light_recovered": light, "light_gt": 30.0}), flush=True)
np.save("/tmp/diag_torus_s2_sdf.npy",
        jax.tree_util.tree_map(np.asarray, s2.params["sdf"]),
        allow_pickle=True)

# ---- edge coverage at full-image resolutions (VERDICT r2 items 4+7) ----
# Render one view at 256/512 through the trainer's resolution-scaled
# config and report seed/drop/edge-pixel counts.
from iron_tpu.core.camera import make_camera, resize_camera
from iron_tpu.surface.render import render_camera, scale_config_for_resolution
from iron_tpu.train.stage2 import build_stage2_fns

f = build_stage2_fns(s2.params, s2.mat_cfgs, s2_cfg)
for side in (256, 512):
    cam = make_camera(np.asarray(data["Ks"][0]), np.asarray(data["W2Cs"][0]),
                      RES, RES)
    cam = resize_camera(cam, side / RES)
    surf_cfg = scale_config_for_resolution(s2_cfg.surface, cam.H, cam.W,
                                           train_patch=s2_cfg.patch_size)
    res = jax.jit(lambda p, c: render_camera(
        f["sdf_fn"], f["sdf_all_fn"], f["shade_fn"], c, surf_cfg,
        is_training=False))(s2.params, cam)
    print(json.dumps({
        "edge_coverage_at": side,
        "edge_budget": surf_cfg.edge_budget,
        "edge_seed_count": int(res["edge_seed_count"]),
        "edge_seeds_dropped": int(res["edge_seeds_dropped"]),
        "edge_pixels": int(jnp.sum(res["edge_mask"]))}), flush=True)
