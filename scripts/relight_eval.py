"""Relit-novel-light PSNR of EXPORTED assets (VERDICT r4 item 4).

The reference's test_mitsuba scripts re-render the exported mesh + baked
texture maps under novel lighting to judge material recovery.  Here:

  1. export mesh -> smart UV -> baked material atlases from a trained
     stage-2 checkpoint (the CLI export path),
  2. render the exported assets under a NOVEL flash (held-out poses,
     2x the training light intensity) with the independent BVH renderer,
  3. render GT at the same poses/intensity from the analytic scene,
  4. report masked PSNR.

Light-scale handling: for a co-located flash only light x albedo is
identifiable, so the baked albedos absorb an arbitrary scale c and the
recovered light is ~30c.  The assets are relit with
`light = light_rec * (L_novel / L_train)` — exactly what a user of the
exported assets would do — which cancels c and scores the identifiable
quantities (albedo ratios, roughness, geometry).

Usage: python scripts/relight_eval.py --run_dir exp_r5_sphere_control \
          --scene sphere --rig ring [--res 256] [--ckpt best|final]
Writes <run_dir>/relight_eval.json.
"""
import argparse
import json
import os
import sys
from types import SimpleNamespace

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
    p.add_argument("--run_dir", required=True)
    p.add_argument("--scene", default="sphere",
                   choices=["sphere", "blobby", "torus", "genus2"])
    p.add_argument("--rig", default="ring", choices=["ring", "hemisphere"])
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--train_light", type=float, default=30.0)
    p.add_argument("--novel_light", type=float, default=60.0)
    p.add_argument("--ckpt", default="best", choices=["best", "final"])
    p.add_argument("--export_res", type=int, default=256)
    args = p.parse_args()

    from iron_tpu.train.stage2 import Stage2Config
    from iron_tpu.train.checkpoints import latest_checkpoint, load_checkpoint
    from iron_tpu.shading.materials import renderer_network_configs
    from iron_tpu.cli.train_surface import export_assets
    from iron_tpu.eval.independent_gt import SCENES_NP, mesh_scene_np, render_view_np
    from iron_tpu.eval.relight import render_mesh_flash
    from iron_tpu.eval.metrics import psnr_np
    from iron_tpu.data.synthetic import ring_cameras, hemisphere_cameras
    from iron_tpu.core.camera import make_camera
    from iron_tpu.data.io import write_image

    s2_dir = os.path.join(args.run_dir, "stage2")
    path = os.path.join(s2_dir, "ckpt_best.pkl")
    if args.ckpt == "final" or not os.path.exists(path):
        path = latest_checkpoint(s2_dir) or latest_checkpoint(args.run_dir)
    ck = load_checkpoint(path)
    params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
    light_rec = float(params["materials"]["point_light_network"]["light"])
    print(f"[params] {path} step {ck['step']} light_rec {light_rec:.2f}", flush=True)

    cfg = Stage2Config(renderer_name="ggx")
    trainer = SimpleNamespace(params=params, cfg=cfg,
                              mat_cfgs=renderer_network_configs("ggx"))
    export_dir = os.path.join(args.run_dir, "export_relight")
    export_assets(trainer, export_dir, resolution=args.export_res)

    # novel poses: a rig rotated/elevated away from the training rig
    rig_fn = {"ring": ring_cameras, "hemisphere": hemisphere_cameras}[args.rig]
    kw = {"seed": 7} if args.rig == "hemisphere" else {}
    _, Ks, W2Cs = rig_fn(5, H=args.res, W=args.res, **kw)
    views = [2, 4]

    sdf_np = SCENES_NP[args.scene]()
    gv, gt_ = mesh_scene_np(sdf_np, resolution=384)
    scale = args.novel_light / args.train_light
    mesh_path = os.path.join(export_dir, "mesh.obj")

    psnrs = []
    mosaics = []
    for vi in views:
        gt = render_view_np(gv, gt_, sdf_np, Ks[vi], W2Cs[vi],
                            args.res, args.res, args.novel_light)
        cam = make_camera(Ks[vi], W2Cs[vi], args.res, args.res)
        pred = render_mesh_flash(mesh_path, export_dir, cam,
                                 light=light_rec * scale)
        a = np.clip(pred["color"], 0, 1)
        b = np.clip(gt["color"], 0, 1)
        psnrs.append(psnr_np(a, b))
        mosaics += [b, a]
        print(f"[view {vi}] relight PSNR {psnrs[-1]:.2f}", flush=True)

    from iron_tpu.utils.logging import concatenate_result
    write_image(os.path.join(args.run_dir, "relight_mosaic.png"),
                concatenate_result(mosaics, 2))
    report = {"scene": args.scene, "ckpt": path, "ckpt_step": int(ck["step"]),
              "light_recovered": light_rec,
              "novel_light": args.novel_light,
              "relight_psnr": float(np.mean(psnrs)),
              "per_view": [float(x) for x in psnrs]}
    with open(os.path.join(args.run_dir, "relight_eval.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
