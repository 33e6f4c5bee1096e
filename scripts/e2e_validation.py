"""End-to-end two-stage pipeline validation with quality metrics.

Renders a synthetic co-located-flash dataset from an analytic SDF (the
golden-oracle renderer), trains stage 1 -> converts -> trains stage 2,
then reports:
  * held-out view PSNR/SSIM (render vs golden GT),
  * Chamfer distance of the exported mesh vs the GT mesh,
  * light-intensity recovery error,
and writes a JSON report + validation mosaics.

This is the quality gate (BASELINE.md: "PSNR + Chamfer parity") run on
self-contained data; with real scene data the same flow applies via the
CLIs.  Usage:  python scripts/e2e_validation.py [--fast] [--out_dir D]
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

# persistent compilation cache: stage-1/2 step programs take minutes to
# compile through the remote-compile tunnel; cached reruns start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="./exp_e2e_validation")
    p.add_argument("--fast", action="store_true", help="tiny iteration counts")
    p.add_argument("--scene", default="blobby", choices=["sphere", "blobby", "torus", "genus2"])
    p.add_argument("--rig", default="ring", choices=["ring", "hemisphere"],
                   help="camera rig; hemisphere is required for genus>0 scenes")
    p.add_argument("--stage1_iters", type=int, default=3000)
    p.add_argument("--stage2_iters", type=int, default=1500)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--n_samples", type=int, default=48)
    p.add_argument("--n_importance", type=int, default=48)
    p.add_argument("--silhouette_weight", type=float, default=0.0,
                   help="stage-2 IDR-style silhouette counterweight to the "
                        "masked-loss shrink bias (Stage2Config."
                        "silhouette_weight; 0 = reference parity)")
    p.add_argument("--independent_gt", action="store_true",
                   help="train + evaluate against the INDEPENDENT ground-"
                        "truth renderer (native BVH + numpy Mitsuba GGX, "
                        "iron_tpu/eval/independent_gt.py) instead of the "
                        "framework's own golden renderer — the Mitsuba-"
                        "equivalent de-circularized quality gate")
    args = p.parse_args()
    if args.fast:
        args.stage1_iters, args.stage2_iters, args.res = 300, 150, 64

    from iron_tpu.data.synthetic import render_synthetic_dataset
    from iron_tpu.data.dataset import RayDataset
    from iron_tpu.data.io import write_image
    from iron_tpu.train.stage1 import Stage1Config, Stage1Trainer
    from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
    from iron_tpu.train.checkpoints import stage1_to_stage2
    from iron_tpu.volume.integrator import NeuSRenderConfig
    from iron_tpu.surface.render import SurfaceRenderConfig
    from iron_tpu.fields.sdf import SDFConfig, sdf_only
    from iron_tpu.export.mesh import extract_geometry, largest_component
    from iron_tpu.eval.metrics import psnr_np, ssim_np, chamfer_distance
    from iron_tpu.utils.logging import concatenate_result

    os.makedirs(args.out_dir, exist_ok=True)
    t_start = time.time()
    report = {"scene": args.scene, "res": args.res,
              "stage1_iters": args.stage1_iters, "stage2_iters": args.stage2_iters,
              "gt_source": "independent" if args.independent_gt else "golden"}

    # ---- GT data ----
    n_views = 14
    light_gt = 30.0
    rig_kwargs = None
    if args.rig == "hemisphere" and args.scene == "torus":
        rig_kwargs = {"pole": "y"}   # torus hole axis (data/synthetic.py)
    if args.independent_gt:
        from iron_tpu.eval.independent_gt import render_independent_dataset
        data = render_independent_dataset(
            args.scene, n_views=n_views, H=args.res, W=args.res,
            light=light_gt, rig=args.rig, rig_kwargs=rig_kwargs,
            mesh_resolution=192 if args.fast else 384)
    else:
        data = render_synthetic_dataset(args.scene, n_views=n_views, H=args.res,
                                        W=args.res, light=light_gt, rig=args.rig,
                                        rig_kwargs=rig_kwargs)
    if args.rig == "hemisphere":
        # the Fibonacci spiral orders views by elevation — hold out two
        # mid-sequence views so the test elevations are inside the train range
        test_idx = [n_views // 3, (2 * n_views) // 3]
    else:
        test_idx = [n_views - 2, n_views - 1]
    train_idx = [i for i in range(n_views) if i not in test_idx]
    ds = RayDataset.from_arrays(data["images"][train_idx], data["Ks"][train_idx],
                                data["W2Cs"][train_idx],
                                data["masks"][train_idx][..., :1])
    if args.independent_gt:
        gt_verts, gt_tris = data["verts"], data["tris"]  # independent mesher
    else:
        gt_verts, gt_tris = extract_geometry(lambda p: -data["sdf_fn"](p),
                                             resolution=128)
    gt_verts, gt_tris = largest_component(gt_verts, gt_tris)
    print(f"[data] {n_views} views, GT mesh {len(gt_verts)} verts", flush=True)

    # ---- stage 1 ----
    # geometric-init sphere at the reference's default bias 0.5 — the
    # "objects inside the unit sphere" convention the data generator follows
    # mask supervision (wmask-style): synthetic backgrounds are pure black
    # with no background model, so without masks NeuS collapses to fog
    # (weight_max ~0.01, inv_s stalls) — the reference always trains with
    # either a background NeRF (n_outside=32) or masks.
    s1_cfg = Stage1Config(
        end_iter=args.stage1_iters, warm_up_end=max(args.stage1_iters // 20, 10),
        anneal_end=args.stage1_iters // 2, batch_size=512,
        sdf=SDFConfig(bias=0.5), mask_weight=0.1,
        render=NeuSRenderConfig(n_samples=args.n_samples,
                                n_importance=args.n_importance, n_outside=0,
                                up_sample_steps=4, perturb=1.0))
    t0 = time.time()
    # checkpoint + resume inside the run dir: a wedged device session (the
    # axon tunnel can stall a stream mid-run) costs at most one save
    # interval after a retry, not the whole stage
    s1 = Stage1Trainer(s1_cfg, ds, out_dir=os.path.join(args.out_dir, "stage1"))
    start1 = s1.resume()
    if start1:
        print(f"[stage1] resumed at {start1}", flush=True)
    m1 = s1.run(num_iters=args.stage1_iters - start1,
                log_every=max(args.stage1_iters // 10, 1))
    s1.wait_for_saves()
    report["stage1"] = {**m1, "wall_s": time.time() - t0,
                        "iters_per_s": (args.stage1_iters - start1)
                        / max(time.time() - t0, 1e-9),
                        "resumed_at": start1}
    print(f"[stage1] {report['stage1']}", flush=True)

    # ---- stage 2 ----
    s2_cfg = Stage2Config(
        renderer_name="ggx", patch_size=min(args.res, 128),
        num_iters=args.stage2_iters,
        silhouette_weight=args.silhouette_weight,
        surface=SurfaceRenderConfig(edge_budget=1024), save_freq=5000)
    t0 = time.time()
    s2 = Stage2Trainer(s2_cfg, data["images"][train_idx], data["Ks"][train_idx],
                       data["W2Cs"][train_idx], stage1_params=s1.params,
                       masks=data["masks"][train_idx],
                       out_dir=os.path.join(args.out_dir, "stage2"))
    start2 = s2.resume()
    if start2:
        print(f"[stage2] resumed at {start2}", flush=True)

    # validation-driven model selection (VERDICT r4 item 8): held-out view
    # PSNR at every checkpoint interval; the trainer retains the best
    # params as stage2/ckpt_best.pkl.  Renders through a second trainer
    # that holds ALL views (the training one only has train views).
    import dataclasses as _dc
    s2_val = Stage2Trainer(_dc.replace(s2_cfg, silhouette_weight=0.0),
                           data["images"], data["Ks"], data["W2Cs"])
    val_time = [0.0]

    def val_fn(tr):
        tv = time.time()
        s2_val.params = tr.params
        ps = []
        for ti in test_idx:
            r = s2_val.render_full(ti, factor=1.0, keys=("color",))
            ps.append(psnr_np(np.clip(r["color"], 0, 1),
                              np.clip(data["images"][ti], 0, 1)))
        val_time[0] += time.time() - tv
        out = {"metric": float(np.mean(ps))}
        print(f"[val {tr.step}] heldout_psnr {out['metric']:.2f}", flush=True)
        return out

    m2 = s2.run(num_iters=args.stage2_iters - start2,
                log_every=max(args.stage2_iters // 10, 1),
                val_fn=val_fn, val_every=5000)
    s2.wait_for_saves()
    train_wall = time.time() - t0 - val_time[0]
    report["stage2"] = {**m2, "wall_s": time.time() - t0,
                        "val_wall_s": val_time[0],
                        "rays_per_s": (args.stage2_iters - start2)
                        * s2_cfg.patch_size ** 2 / max(train_wall, 1e-9)}
    report["val_history"] = s2.val_history
    report["best_step"] = s2.best_step
    report["best_heldout_psnr"] = s2.best_metric if s2.val_history else None
    print(f"[stage2] {report['stage2']}", flush=True)

    # ---- recovered geometry (needed below: materials are scored ON the
    # recovered surface — that is where shading actually samples them, and
    # where the reference bakes its texture maps) ----
    rec_verts, rec_tris = extract_geometry(
        lambda p: -sdf_only(s2.params["sdf"], p, s2_cfg.sdf), resolution=128)
    rec_verts, rec_tris = largest_component(rec_verts, rec_tris)

    # ---- material recovery (VERDICT r4 item 4) ----
    # The synthetic GT materials are spatial constants (data/synthetic.py
    # make_ggx_shade_fn defaults).  For a co-located flash the IDENTIFIABLE
    # quantities are light x albedo products (any c>0 rescale of light with
    # albedo/c renders identically), roughness, and albedo ratios; raw
    # albedo/light rel_errs are reported for context only.
    light_rec = float(s2.params["materials"]["point_light_network"]["light"])
    from iron_tpu.fields.sdf import sdf_value_feat_grad
    from iron_tpu.shading.materials import get_materials
    d_gt = np.asarray([0.6, 0.3, 0.2])
    s_gt = np.asarray([0.3, 0.3, 0.3])
    r_gt = 0.2

    def material_stats(verts):
        surf = jnp.asarray(verts[np.random.default_rng(0).choice(
            len(verts), size=min(4096, len(verts)), replace=False)], jnp.float32)
        _, feat, grad = sdf_value_feat_grad(s2.params["sdf"], surf, s2_cfg.sdf)
        nrm = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-10)
        mats = get_materials(s2.params["materials"], s2.mat_cfgs, surf, nrm, feat)
        d = np.asarray(mats["diffuse_albedo"])
        s = np.asarray(mats["specular_albedo"])
        r = np.asarray(mats["specular_roughness"])
        d_mean, s_mean, r_mean = d.mean(0), s.mean(0), float(r.mean())
        rel = lambda a, b: float(np.mean(np.abs(a - b) / np.clip(np.abs(b), 1e-9, None)))
        chroma = lambda v: v / max(np.sum(v), 1e-9)
        return {
            "diffuse_albedo_mean": d_mean.tolist(),
            "specular_albedo_mean": s_mean.tolist(),
            "roughness_mean": r_mean,
            "roughness_std": float(r.std()),
            "diffuse_albedo_spatial_std": float(d.std(0).mean()),
            # identifiable metrics
            "roughness_abs_err": abs(r_mean - r_gt),
            "light_diffuse_product_rel_err": rel(light_rec * d_mean, light_gt * d_gt),
            "light_specular_product_rel_err": rel(light_rec * s_mean, light_gt * s_gt),
            "diffuse_chroma_l1": float(np.abs(chroma(d_mean) - chroma(d_gt)).sum()),
            # context-only (scale-ambiguous)
            "diffuse_albedo_rel_err": rel(d_mean, d_gt),
            "specular_albedo_rel_err": rel(s_mean, s_gt),
        }

    report["materials"] = material_stats(rec_verts)
    report["materials_at_gt_surface"] = material_stats(gt_verts)
    print(f"[materials] {json.dumps(report['materials'])}", flush=True)
    prod_rel_err = report["materials"]["light_diffuse_product_rel_err"]
    report["light"] = {"gt": light_gt, "recovered": light_rec,
                       "rel_err": abs(light_rec - light_gt) / light_gt,
                       "light_albedo_product_rel_err": prod_rel_err}

    # ---- held-out view quality ----
    psnrs, ssims = [], []
    full_ds_imgs = data["images"]
    s2_all = s2_val
    s2_all.params = s2.params
    mosaics = []
    for ti in test_idx:
        res = s2_all.render_full(ti, factor=1.0)
        pred = np.clip(res["color"], 0, 1)
        gt = np.clip(full_ds_imgs[ti], 0, 1)
        psnrs.append(psnr_np(pred, gt))
        ssims.append(ssim_np(pred, gt))
        normal = res["normal"]
        normal = normal / (np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-10)
        mosaics += [gt, pred, (normal + 1) / 2]
    write_image(os.path.join(args.out_dir, "testviews.png"),
                concatenate_result(mosaics, 3))
    report["test_psnr"] = float(np.mean(psnrs))
    report["test_ssim"] = float(np.mean(ssims))
    print(f"[quality] PSNR {report['test_psnr']:.2f}  SSIM {report['test_ssim']:.4f}",
          flush=True)

    # ---- geometry quality ----
    report["chamfer"] = chamfer_distance(rec_verts, rec_tris, gt_verts, gt_tris)
    # geometry trajectory: stage-1 final + every stage-2 checkpoint (the
    # round-4 torus collapse was only visible in this curve — a single
    # end-of-schedule chamfer can hide a mid-run catastrophe)
    import glob as _glob
    import pickle as _pickle

    def _chamfer_of(params_sdf):
        v, t = extract_geometry(lambda p: -sdf_only(params_sdf, p, s2_cfg.sdf),
                                resolution=128)
        v, t = largest_component(v, t)
        return {"verts": int(len(v)),
                "chamfer": chamfer_distance(v, t, gt_verts, gt_tris)}

    traj = {}
    s1_cks = sorted(_glob.glob(os.path.join(args.out_dir, "stage1", "ckpt_*.pkl")))
    if s1_cks:
        ck = _pickle.load(open(s1_cks[-1], "rb"))
        traj["stage1_final"] = _chamfer_of(ck["params"]["sdf"])
    for pth in sorted(_glob.glob(os.path.join(args.out_dir, "stage2", "ckpt_*.pkl"))):
        step = os.path.basename(pth).split("_")[-1].split(".")[0]
        if not step.isdigit():
            continue  # ckpt_best.pkl — reported separately below
        ck = _pickle.load(open(pth, "rb"))
        traj[f"stage2_{int(step)}"] = _chamfer_of(ck["params"]["sdf"])
    report["chamfer_trajectory"] = traj
    print(f"[geometry] trajectory {traj}", flush=True)
    # best-checkpoint row (VERDICT r4 item 8): the run's best model by
    # held-out PSNR (selection rule: max val PSNR over 5k checkpoints,
    # retained by Stage2Trainer as ckpt_best.pkl), with its chamfer
    best_path = os.path.join(args.out_dir, "stage2", "ckpt_best.pkl")
    if os.path.exists(best_path):
        ck = _pickle.load(open(best_path, "rb"))
        best = {"step": ck["step"],
                "heldout_psnr": ck["extra"]["val"]["metric"],
                **_chamfer_of(ck["params"]["sdf"]),
                "selection_rule": "max held-out PSNR over 5k checkpoints"}
        report["best"] = best
        print(f"[best] {best}", flush=True)
    # persist the recovered mesh + final params so failures are inspectable
    # post-hoc (genus, hole membranes, ...)
    from iron_tpu.export.mesh import write_obj
    write_obj(os.path.join(args.out_dir, "recovered_mesh.obj"),
              rec_verts, rec_tris)
    from iron_tpu.train.checkpoints import save_checkpoint
    save_checkpoint(args.out_dir, args.stage2_iters, s2.params)
    print(f"[geometry] chamfer {report['chamfer']:.5f} "
          f"({len(rec_verts)} verts)", flush=True)

    report["total_wall_s"] = time.time() - t_start
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k in ("test_psnr", "test_ssim", "chamfer", "light")}))


if __name__ == "__main__":
    main()
