"""Decompose the held-out PSNR gap vs independent GT (VERDICT r4 item 3).

Round 4 measured sphere 27.2 dB / torus 24.9 dB on independent GT vs
mid-30s in the round-2 self-oracle runs, with nobody attributing the gap
between geometry error, material/shading error, and renderer-convention
mismatch.  This script renders the held-out test views in three nested
configurations through the SAME framework surface renderer:

  D  GT analytic SDF + GT constant materials + GT light
       -> renderer-convention floor: how far the framework's sphere-traced
          GGX render is from the independent BVH+numpy GT renderer when
          EVERYTHING is known.  (data/synthetic.py golden shader vs
          eval/independent_gt.py; disagreement = conventions/discretization)
  B  learned SDF + GT materials + GT light
       -> adds geometry error only (B - D = geometry cost)
  A  learned SDF + learned materials + learned light
       -> adds material-recovery error only (A - B = material cost)

plus masked variants (PSNR inside the GT object mask) that exclude
background/silhouette pixels from the attribution.

Usage: python scripts/psnr_decomposition.py --run_dir exp_r5_sphere_control \
           --scene sphere --rig ring [--ckpt best|final] [--res 256]
Writes <run_dir>/psnr_decomposition.json (copy into results/).
"""
import argparse
import json
import os
import sys

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
    p.add_argument("--n_views", type=int, default=14)
    p.add_argument("--light", type=float, default=30.0)
    p.add_argument("--ckpt", default="best", choices=["best", "final"])
    args = p.parse_args()

    from iron_tpu.data.synthetic import (render_synthetic_dataset,
                                         make_ggx_shade_fn)
    from iron_tpu.eval.independent_gt import render_independent_dataset
    from iron_tpu.eval.metrics import psnr_np, ssim_np
    from iron_tpu.train.stage2 import Stage2Config, build_stage2_fns
    from iron_tpu.train.checkpoints import latest_checkpoint, load_checkpoint
    from iron_tpu.surface.render import (SurfaceRenderConfig, render_camera,
                                         scale_config_for_resolution)
    from iron_tpu.core.camera import make_camera
    from iron_tpu.shading.materials import renderer_network_configs
    from iron_tpu.fields.sdf import SDFConfig, sdf_only, sdf_value_feat_grad

    rig_kwargs = {"pole": "y"} if (args.rig == "hemisphere"
                                   and args.scene == "torus") else None
    data = render_independent_dataset(args.scene, n_views=args.n_views,
                                      H=args.res, W=args.res, light=args.light,
                                      rig=args.rig, rig_kwargs=rig_kwargs)
    # analytic jnp SDF of the same scene (the golden-oracle geometry)
    gt = render_synthetic_dataset(args.scene, n_views=1, H=8, W=8,
                                  light=args.light, rig=args.rig,
                                  rig_kwargs=rig_kwargs)
    gt_sdf_fn, gt_sdf_all_fn = gt["sdf_fn"], gt["sdf_all_fn"]

    if args.rig == "hemisphere":
        test_idx = [args.n_views // 3, (2 * args.n_views) // 3]
    else:
        test_idx = [args.n_views - 2, args.n_views - 1]

    # ---- learned params ----
    s2_dir = os.path.join(args.run_dir, "stage2")
    path = os.path.join(s2_dir, "ckpt_best.pkl")
    if args.ckpt == "final" or not os.path.exists(path):
        path = latest_checkpoint(s2_dir) or latest_checkpoint(args.run_dir)
    ck = load_checkpoint(path)
    params = jax.tree_util.tree_map(jnp.asarray, ck["params"])
    print(f"[params] {path} (step {ck['step']})", flush=True)

    cfg = Stage2Config(renderer_name="ggx",
                       surface=SurfaceRenderConfig(edge_budget=1024))
    mat_cfgs = renderer_network_configs("ggx")
    surf_cfg = scale_config_for_resolution(cfg.surface, args.res, args.res)
    gt_shade = make_ggx_shade_fn(args.light)

    f = build_stage2_fns(params, mat_cfgs, cfg)

    def render_config(name):
        if name == "A":       # learned SDF + learned materials
            return jax.jit(lambda cam: render_camera(
                f["sdf_fn"], f["sdf_all_fn"], f["shade_fn"], cam, surf_cfg,
                trace_sdf_fn=f["trace_sdf_fn"],
                trace_sdf_all_fn=f["trace_sdf_all_fn"],
                coarse_sdf_fn=f["coarse_sdf_fn"],
                coarse_march_fn=f["coarse_march_fn"]))
        if name == "B":       # learned SDF + GT materials/light
            return jax.jit(lambda cam: render_camera(
                f["sdf_fn"], f["sdf_all_fn"], gt_shade, cam, surf_cfg,
                trace_sdf_fn=f["trace_sdf_fn"],
                trace_sdf_all_fn=f["trace_sdf_all_fn"],
                coarse_sdf_fn=f["coarse_sdf_fn"],
                coarse_march_fn=f["coarse_march_fn"]))
        if name == "D":       # GT SDF + GT materials/light
            return jax.jit(lambda cam: render_camera(
                gt_sdf_fn, gt_sdf_all_fn, gt_shade, cam, surf_cfg))
        raise ValueError(name)

    report = {"scene": args.scene, "rig": args.rig, "res": args.res,
              "ckpt": path, "ckpt_step": int(ck["step"]),
              "test_views": test_idx, "configs": {}}
    for name, desc in [("D", "GT sdf + GT materials (convention floor)"),
                       ("B", "learned sdf + GT materials (+geometry error)"),
                       ("A", "learned sdf + learned materials (full)")]:
        rfn = render_config(name)
        psnrs, psnrs_m, ssims = [], [], []
        for ti in test_idx:
            cam = make_camera(np.asarray(data["Ks"][ti]),
                              np.asarray(data["W2Cs"][ti]),
                              args.res, args.res)
            res = rfn(cam)
            pred = np.clip(np.asarray(res["color"]), 0, 1)
            gt_img = np.clip(data["images"][ti], 0, 1)
            m = data["masks"][ti][..., 0] > 0.5
            psnrs.append(psnr_np(pred, gt_img))
            ssims.append(ssim_np(pred, gt_img))
            psnrs_m.append(-10.0 * np.log10(
                np.mean((pred[m] - gt_img[m]) ** 2) + 1e-12))
        report["configs"][name] = {
            "desc": desc, "psnr": float(np.mean(psnrs)),
            "psnr_in_mask": float(np.mean(psnrs_m)),
            "ssim": float(np.mean(ssims))}
        print(f"[{name}] {report['configs'][name]}", flush=True)

    c = report["configs"]
    report["attribution_db"] = {
        "convention_floor_psnr": c["D"]["psnr"],
        "geometry_cost_db": c["D"]["psnr"] - c["B"]["psnr"],
        "material_cost_db": c["B"]["psnr"] - c["A"]["psnr"],
    }
    out = os.path.join(args.run_dir, "psnr_decomposition.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report["attribution_db"], indent=2))


if __name__ == "__main__":
    main()
