"""Stage-2 CLI — the `render_surface.py` / `render_nir.py` equivalent.

Usage:
  python -m iron_tpu.cli.train_surface --data_dir D --out_dir O \
      [--neus_ckpt_fpath ckpt.pkl] [--render_all] [--export_all] [...]

Flags mirror render_surface.py:42-95; the NIR variant's differences
(roughness hinge 0.1, eta priors in-loss, render_nir.py:535-566) are the
--nir switch.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--folder_name", default="image")
    p.add_argument("--neus_ckpt_fpath", default=None)
    p.add_argument("--renderer_name", default="comp",
                   choices=["ggx", "multi", "comp", "comp2"])
    p.add_argument("--num_iters", type=int, default=50001)
    p.add_argument("--patch_size", type=int, default=128)
    p.add_argument("--eik_weight", type=float, default=0.1)
    p.add_argument("--ssim_weight", type=float, default=1.0)
    p.add_argument("--roughrange_weight", type=float, default=0.1)
    p.add_argument("--metal_eta_weight", type=float, default=0.1)
    p.add_argument("--metal_k_weight", type=float, default=0.1)
    p.add_argument("--dielectric_eta_weight", type=float, default=0.1)
    p.add_argument("--no_edgesample", action="store_true")
    p.add_argument("--inv_gamma_gt", action="store_true")
    p.add_argument("--gamma_pred", action="store_true")
    p.add_argument("--is_metal", action="store_true")
    p.add_argument("--nir", action="store_true",
                   help="NIR variant: roughness hinge 0.1 + eta priors in loss")
    p.add_argument("--init_light_scale", type=float, default=8.0)
    p.add_argument("--export_all", action="store_true")
    p.add_argument("--export_res", type=int, default=512,
                   help="marching-cubes grid resolution for exports")
    p.add_argument("--skip_final_export", action="store_true",
                   help="do not export mesh+materials after training")
    p.add_argument("--render_all", action="store_true")
    p.add_argument("--use_mask", action="store_true")
    p.add_argument("--silhouette_weight", type=float, default=0.0,
                   help="IDR-style silhouette counterweight to the masked-"
                        "loss drift (needs --use_mask; 0 = reference "
                        "parity, the reference has no stage-2 mask loss). "
                        "RECOMMENDED 0.3 whenever masks exist: the round-5 "
                        "full-schedule A/B measured torus chamfer 0.0147 vs "
                        "0.0519 and +2.3 dB held-out PSNR at unchanged "
                        "throughput (results/quality_torus_r5_*.json)")
    p.add_argument("--plot_image_name", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sync_ckpt", action="store_true",
                   help="blocking pickle checkpoints instead of async orbax")
    args = p.parse_args(argv)

    from iron_tpu.data.dataset import load_image_folder
    from iron_tpu.data.io import write_image, to8b, gamma_correction
    from iron_tpu.surface.render import SurfaceRenderConfig
    from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
    from iron_tpu.train.checkpoints import load_any_checkpoint
    from iron_tpu.utils.logging import ExperimentDir, concatenate_result

    exp = ExperimentDir(args.out_dir, vars(args))
    fpaths, images, Ks, W2Cs, masks = load_image_folder(
        args.data_dir, args.folder_name,
        mask_dir=os.path.join(args.data_dir, "masks") if args.use_mask else None,
        apply_mask=args.use_mask)
    print(f"[stage2] {len(fpaths)} images {images.shape[1:3]}")

    cfg = Stage2Config(
        renderer_name=args.renderer_name,
        num_iters=args.num_iters, patch_size=args.patch_size,
        eik_weight=args.eik_weight, ssim_weight=args.ssim_weight,
        roughrange_weight=args.roughrange_weight,
        roughness_value=0.1 if args.nir else 0.5,
        metal_eta_weight=args.metal_eta_weight,
        metal_k_weight=args.metal_k_weight,
        dielectric_eta_weight=args.dielectric_eta_weight,
        include_eta_priors=args.nir,
        is_metal=args.is_metal, gamma_pred=args.gamma_pred,
        inv_gamma_gt=args.inv_gamma_gt,
        init_light_scale=args.init_light_scale,
        async_ckpt=not args.sync_ckpt,
        silhouette_weight=args.silhouette_weight,
        surface=SurfaceRenderConfig(handle_edges=not args.no_edgesample))
    if args.silhouette_weight > 0 and not args.use_mask:
        p.error("--silhouette_weight requires --use_mask (dataset masks)")

    stage1_params = None
    ck = load_any_checkpoint(args.neus_ckpt_fpath) if args.neus_ckpt_fpath else None
    if ck is not None:
        stage1_params = ck["params"]
        sdf_conf = ck.get("extra", {}).get("sdf_config")
        if sdf_conf:  # adopt the stage-1 SDF architecture
            import dataclasses
            from iron_tpu.fields.sdf import SDFConfig
            sdf_conf = {**sdf_conf, "skip_in": tuple(sdf_conf.get("skip_in", ()))}
            cfg = dataclasses.replace(cfg, sdf=SDFConfig(**sdf_conf))

    trainer = Stage2Trainer(cfg, images, Ks, W2Cs, out_dir=args.out_dir,
                            stage1_params=stage1_params,
                            masks=masks if args.use_mask else None)
    start = trainer.resume()
    print(f"[stage2] resume step {start}, light="
          f"{float(trainer.params['materials']['point_light_network']['light']):.2f}")

    def mosaic(idx, factor=0.25):
        res = trainer.render_full(idx, factor=factor)
        color = res["color"]
        if args.gamma_pred:
            color = gamma_correction(color)
        normal = res["normal"]
        normal = normal / (np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-10)
        imgs = [np.asarray(images[idx])[::int(1 / factor), ::int(1 / factor)],
                color, (normal + 1) / 2, res["edge_mask"].astype(np.float32),
                res.get("diffuse_color", color), res.get("specular_color", color)]
        return concatenate_result(imgs, 3)

    if args.render_all:
        render_dir = exp.file(f"render_{os.path.basename(args.data_dir)}_{start}")
        os.makedirs(render_dir, exist_ok=True)
        for i, fp in enumerate(fpaths):
            res = trainer.render_full(i, factor=1.0)
            color = res["color"]
            diffuse = res.get("diffuse_color", color)
            if args.gamma_pred:
                color, diffuse = gamma_correction(color), gamma_correction(diffuse)
                specular = np.clip(color - diffuse, 0.0, None)
            else:
                specular = res.get("specular_color", color)
            stem = os.path.splitext(os.path.basename(fp))[0]
            normal = res["normal"]
            normal = normal / (np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-10)
            write_image(os.path.join(render_dir, stem + ".jpg"), color)
            write_image(os.path.join(render_dir, stem + "_normal.jpg"), (normal + 1) / 2)
            write_image(os.path.join(render_dir, stem + "_diff.jpg"), diffuse)
            write_image(os.path.join(render_dir, stem + "_specular.jpg"), specular)
        return

    if args.export_all:
        export_dir = exp.file(f"mesh_and_materials_{start}")
        export_assets(trainer, export_dir, resolution=args.export_res)
        return

    while trainer.step < args.num_iters:
        n = min(cfg.val_freq, args.num_iters - trainer.step)
        metrics = trainer.run(num_iters=n, log_every=100, seed=args.seed)
        exp.metrics.add_scalars(trainer.step, metrics, prefix="stage2/")
        if trainer.step % cfg.val_freq == 0:
            idx = trainer.step % len(fpaths)
            write_image(exp.file(f"logim_{trainer.step}.png"), mosaic(idx))
    trainer.save()
    trainer.wait_for_saves()
    if not args.skip_final_export:
        export_assets(trainer, exp.file(f"mesh_and_materials_{trainer.step}"),
                      resolution=args.export_res)


def export_assets(trainer, export_dir: str, resolution: int = 512):
    """Mesh + UV + baked materials (render_surface.py:418-457)."""
    import jax.numpy as jnp
    from iron_tpu.export.mesh import export_mesh
    from iron_tpu.export.uv import unwrap_obj
    from iron_tpu.export.materials import export_materials
    from iron_tpu.fields.sdf import sdf_only, sdf_value_feat_grad
    from iron_tpu.shading.materials import get_materials, get_materials_comp

    os.makedirs(export_dir, exist_ok=True)
    cfg = trainer.cfg
    sdf_fn = lambda p: sdf_only(trainer.params["sdf"], p, cfg.sdf)
    mesh_path = os.path.join(export_dir, "mesh.obj")
    export_mesh(sdf_fn, mesh_path, resolution=resolution)
    unwrap_obj(mesh_path, mesh_path)

    def predictor(points):
        _, feats, normals = sdf_value_feat_grad(trainer.params["sdf"], points, cfg.sdf)
        normals = normals / (jnp.linalg.norm(normals, axis=-1, keepdims=True) + 1e-10)
        if cfg.renderer_name in ("comp", "comp2"):
            res = get_materials_comp(trainer.params["materials"], trainer.mat_cfgs,
                                     points, normals, feats)
        else:
            res = get_materials(trainer.params["materials"], trainer.mat_cfgs,
                                points, normals, feats, is_metal=cfg.is_metal)
        return (res["diffuse_albedo"], res["specular_albedo"],
                res["specular_roughness"])

    export_materials(mesh_path, predictor, export_dir)
    print(f"[stage2] exported mesh + materials to {export_dir}")


if __name__ == "__main__":
    main()
