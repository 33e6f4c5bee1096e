"""A/B the silhouette counterweight against the masked-loss shrink bias.

Round-4 e2e runs measured stage-2 geometry eroding after its ~20k peak
(sphere chamfer 0.0283@20k -> 0.0425@50k; torus catastrophically) because
the image losses are masked to the render's own coverage (the reference
has the identical structure, render_surface.py:571-607).  This script
trains ONE shared stage 1, then forks stage 2 into a control arm
(silhouette_weight=0, reference parity) and a counterweight arm
(Stage2Config.silhouette_weight > 0), recording the chamfer + vertex +
mask-miss/excess trajectory of each at every checkpoint interval.

The bias needs tens of thousands of iters to show at full scale; at the
default reduced schedule here the arms are compared on (a) the
mask_miss_count trajectory (the direct shrink signal) and (b) chamfer
drift after the early peak.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="./exp_silhouette_ab")
    p.add_argument("--scene", default="sphere",
                   choices=["sphere", "blobby", "torus", "genus2"])
    p.add_argument("--rig", default="ring", choices=["ring", "hemisphere"])
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--stage1_iters", type=int, default=15000)
    p.add_argument("--stage2_iters", type=int, default=20000)
    p.add_argument("--ckpt_every", type=int, default=2500)
    p.add_argument("--silhouette_weight", type=float, default=0.3)
    p.add_argument("--arms", nargs="+", default=["control", "silhouette"])
    args = p.parse_args()

    from iron_tpu.data.synthetic import render_synthetic_dataset
    from iron_tpu.data.dataset import RayDataset
    from iron_tpu.train.stage1 import Stage1Config, Stage1Trainer
    from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
    from iron_tpu.volume.integrator import NeuSRenderConfig
    from iron_tpu.surface.render import SurfaceRenderConfig
    from iron_tpu.fields.sdf import SDFConfig, sdf_only
    from iron_tpu.export.mesh import extract_geometry, largest_component
    from iron_tpu.eval.metrics import chamfer_distance

    os.makedirs(args.out_dir, exist_ok=True)
    rig_kwargs = {"pole": "y"} if (args.rig == "hemisphere"
                                   and args.scene == "torus") else None
    n_views = 12
    data = render_synthetic_dataset(args.scene, n_views=n_views, H=args.res,
                                    W=args.res, light=30.0, rig=args.rig,
                                    rig_kwargs=rig_kwargs)
    gt_verts, gt_tris = extract_geometry(lambda q: -data["sdf_fn"](q),
                                         resolution=128)
    gt_verts, gt_tris = largest_component(gt_verts, gt_tris)
    ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                                data["masks"][..., :1])
    print(f"[data] {n_views} views res {args.res}, GT mesh "
          f"{len(gt_verts)} verts", flush=True)

    s1_cfg = Stage1Config(
        batch_size=512, num_iters=args.stage1_iters,
        sdf=SDFConfig(bias=0.5), mask_weight=0.1,
        render=NeuSRenderConfig(n_samples=64, n_importance=64, n_outside=0,
                                up_sample_steps=4, perturb=1.0))
    t0 = time.time()
    s1 = Stage1Trainer(s1_cfg, ds, out_dir=os.path.join(args.out_dir, "stage1"))
    start1 = s1.resume()
    if start1:
        print(f"[stage1] resumed at {start1}", flush=True)
    s1.run(num_iters=args.stage1_iters - start1,
           log_every=max(args.stage1_iters // 5, 1))
    s1.wait_for_saves()
    print(f"[stage1] {time.time() - t0:.0f}s", flush=True)

    def chamfer_of(params_sdf, sdf_cfg):
        v, t = extract_geometry(lambda q: -sdf_only(params_sdf, q, sdf_cfg),
                                resolution=128)
        v, t = largest_component(v, t)
        return {"verts": int(len(v)),
                "chamfer": chamfer_distance(v, t, gt_verts, gt_tris)}

    report = {"scene": args.scene, "rig": args.rig, "res": args.res,
              "stage1_iters": args.stage1_iters,
              "stage2_iters": args.stage2_iters,
              "silhouette_weight": args.silhouette_weight, "arms": {}}
    for arm in args.arms:
        w = args.silhouette_weight if arm == "silhouette" else 0.0
        cfg = Stage2Config(renderer_name="ggx",
                           patch_size=min(args.res, 128),
                           num_iters=args.stage2_iters,
                           silhouette_weight=w,
                           surface=SurfaceRenderConfig(edge_budget=1024),
                           save_freq=args.ckpt_every)
        tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"],
                           stage1_params=s1.params, masks=data["masks"],
                           out_dir=os.path.join(args.out_dir, f"stage2_{arm}"))
        start2 = tr.resume()
        if start2:
            print(f"[{arm}] resumed at {start2}", flush=True)
        traj = {}
        train_s = 0.0   # tr.run() wall only — the host-side chamfer/mesh
        # extraction between checkpoints is excluded (ADVICE r4 item 2)
        while tr.step < args.stage2_iters:
            n = min(args.ckpt_every - tr.step % args.ckpt_every,
                    args.stage2_iters - tr.step)
            t0 = time.time()
            m = tr.run(num_iters=n)
            train_s += time.time() - t0
            rec = chamfer_of(tr.params["sdf"], cfg.sdf)
            rec["mask_miss"] = m.get("mask_miss_count")
            rec["mask_excess"] = m.get("mask_excess_count")
            traj[tr.step] = rec
            print(f"[{arm} {tr.step}] chamfer {rec['chamfer']:.4f} "
                  f"verts {rec['verts']} miss {rec['mask_miss']} "
                  f"excess {rec['mask_excess']}", flush=True)
        rays_s = (args.stage2_iters - start2) * cfg.patch_size ** 2 \
            / max(train_s, 1e-9)
        report["arms"][arm] = {"trajectory": traj,
                               "rays_per_s": round(rays_s, 1)}
        with open(os.path.join(args.out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2, default=float)

    print(json.dumps(report, indent=2, default=float))


if __name__ == "__main__":
    main()
