"""Torus stage-2 collapse experiment (round 4).

The reference-schedule torus run collapsed between iters 35-40k (chamfer
0.045 -> 0.27 in one 5k-checkpoint window; stage-1 and the first 35k of
stage-2 were healthy).  This resumes stage 2 from the PRE-collapse 35k
checkpoint and trains `--iters` more steps under a chosen arm:

  --arm control   fresh Adam state, no clipping (does the collapse
                  reproduce with a different RNG path?)
  --arm clip      same + per-group grad clipping (--clip norm)

and reports the chamfer trajectory every 5k from the new checkpoints.
Run on the chip after the quality chain frees it.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arm", choices=["control", "clip"], required=True)
    p.add_argument("--clip", type=float, default=5.0)
    p.add_argument("--iters", type=int, default=15000)
    p.add_argument("--from_ckpt",
                   default="exp_quality_r4_torus/stage2/ckpt_0035000.pkl")
    p.add_argument("--out_dir", default=None)
    args = p.parse_args()
    out_dir = args.out_dir or f"exp_torus_resume_{args.arm}"

    from iron_tpu.eval.independent_gt import render_independent_dataset, \
        SCENES_NP, mesh_scene_np
    from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
    from iron_tpu.surface.render import SurfaceRenderConfig
    from iron_tpu.fields.sdf import SDFConfig, sdf_only
    from iron_tpu.export.mesh import extract_geometry, largest_component
    from iron_tpu.eval.metrics import chamfer_distance

    # same data/config as the quality run (e2e_validation.py)
    data = render_independent_dataset(
        "torus", n_views=14, H=256, W=256, light=30.0, rig="hemisphere",
        rig_kwargs={"pole": "y"}, mesh_resolution=384)
    test_idx = [14 // 3, (2 * 14) // 3]
    train_idx = [i for i in range(14) if i not in test_idx]

    cfg = Stage2Config(renderer_name="ggx", patch_size=128,
                       num_iters=100000,
                       surface=SurfaceRenderConfig(edge_budget=1024),
                       save_freq=5000,
                       grad_clip=args.clip if args.arm == "clip" else 0.0)
    tr = Stage2Trainer(cfg, data["images"][train_idx], data["Ks"][train_idx],
                       data["W2Cs"][train_idx], out_dir=out_dir)
    ck = pickle.load(open(args.from_ckpt, "rb"))
    tr.params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
    tr.step = 35000
    # different crop RNG path than the original run
    tr.run(num_iters=args.iters, log_every=2500, seed=args.iters + 7)

    sdf_np = SCENES_NP["torus"]()
    gt_verts, gt_tris = mesh_scene_np(sdf_np, resolution=256)
    import glob
    for pth in sorted(glob.glob(os.path.join(out_dir, "ckpt_*.pkl"))):
        c = pickle.load(open(pth, "rb"))
        verts, tris = extract_geometry(
            lambda q: -sdf_only(c["params"]["sdf"], q, SDFConfig()),
            resolution=128)
        lv, lt = largest_component(verts, tris)
        ch = chamfer_distance(lv, lt, gt_verts, gt_tris)
        print(f"[{args.arm}] {os.path.basename(pth)}: verts={len(lv)} "
              f"chamfer={ch:.4f}", flush=True)


if __name__ == "__main__":
    main()
