import time, json, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.data.dataset import RayDataset
from iron_tpu.train.stage1 import Stage1Config, Stage1Trainer
from iron_tpu.volume.integrator import NeuSRenderConfig
from iron_tpu.fields.sdf import SDFConfig, sdf_only
from iron_tpu.export.mesh import extract_geometry, largest_component
from iron_tpu.eval.metrics import chamfer_distance

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
data = render_synthetic_dataset("torus", n_views=14, H=128, W=128, light=30.0)
ds = RayDataset.from_arrays(data["images"][:12], data["Ks"][:12], data["W2Cs"][:12],
                            data["masks"][:12][..., :1])
cfg = Stage1Config(end_iter=iters, warm_up_end=iters // 20, anneal_end=iters // 2,
                   batch_size=512, sdf=SDFConfig(bias=0.5), mask_weight=0.1,
                   render=NeuSRenderConfig(n_samples=64, n_importance=64,
                                           n_outside=0, up_sample_steps=4, perturb=1.0))
tr = Stage1Trainer(cfg, ds)
m = tr.run(num_iters=iters, log_every=iters // 4)
print("final:", {k: round(float(v), 4) for k, v in m.items()}, flush=True)

gt_v, gt_t = largest_component(*extract_geometry(lambda p: -data["sdf_fn"](p), resolution=128))
v, t = extract_geometry(lambda p: -sdf_only(tr.params["sdf"], p, cfg.sdf), resolution=128)
vl, tl = largest_component(v, t)
def euler(v, t):
    edges = set()
    for tri in t:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            e = (min(tri[a], tri[b]), max(tri[a], tri[b]))
            edges.add(e)
    return len(v) - len(edges) + len(t)
print(json.dumps({
    "verts": len(v), "verts_largest": len(vl),
    "euler_largest": euler(vl, tl),  # 2 = sphere, 0 = torus
    "euler_gt": euler(gt_v, gt_t),
    "chamfer": chamfer_distance(vl, tl, gt_v, gt_t),
    # SDF at the hole center: positive (open) vs negative (membrane)
    "sdf_at_hole": float(sdf_only(tr.params["sdf"], jnp.zeros((1, 3)), cfg.sdf)[0]),
    "gt_sdf_at_hole": float(data["sdf_fn"](jnp.zeros((1, 3)))[0]),
}), flush=True)

# ---- stage 2 from this stage-1: does current code preserve the hole? ----
from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
from iron_tpu.surface.render import SurfaceRenderConfig
s2_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
s2_cfg = Stage2Config(renderer_name="ggx", patch_size=128, num_iters=s2_iters,
                      surface=SurfaceRenderConfig(edge_budget=1024),
                      save_freq=10 ** 9)
s2 = Stage2Trainer(s2_cfg, data["images"][:12], data["Ks"][:12], data["W2Cs"][:12],
                   stage1_params=tr.params)
m2 = s2.run(num_iters=s2_iters, log_every=s2_iters // 4)
print("stage2 final:", {k: round(float(v), 4) for k, v in m2.items()}, flush=True)
v2, t2 = largest_component(*extract_geometry(
    lambda p: -sdf_only(s2.params["sdf"], p, s2_cfg.sdf), resolution=128))
print(json.dumps({
    "post_stage2_chamfer": chamfer_distance(v2, t2, gt_v, gt_t),
    "post_stage2_sdf_at_hole": float(sdf_only(s2.params["sdf"], jnp.zeros((1, 3)), s2_cfg.sdf)[0]),
    "post_stage2_verts": len(v2),
}), flush=True)
