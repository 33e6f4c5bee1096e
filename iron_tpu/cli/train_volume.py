"""Stage-1 CLI — the `render_volume.py` equivalent.

Usage:
  python -m iron_tpu.cli.train_volume --mode train --conf iron_tpu/configs/womask_iron.json \
      --case my_scene [--data_dir override] [--out_dir override]

Modes (render_volume.py:875-902): train, validate_mesh, validate_image.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="train",
                   choices=["train", "validate_mesh", "validate_image"])
    p.add_argument("--conf", required=True)
    p.add_argument("--case", default="")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--folder_name", default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--num_iters", type=int, default=None)
    p.add_argument("--mcube_resolution", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init_ckpt_dir", default=None,
                   help="warm-start params from another experiment's latest "
                        "checkpoint (env<->flash handoff, model_volume.py:134-159)")
    p.add_argument("--sync_ckpt", action="store_true",
                   help="blocking pickle checkpoints instead of async orbax")
    p.add_argument("--per_host_shard", action="store_true",
                   help="multi-host: each process loads only its image shard")
    args = p.parse_args(argv)

    from iron_tpu.config import load_config_file, stage1_config_from_dict
    from iron_tpu.data.dataset import RayDataset
    from iron_tpu.data.io import write_image, to8b
    from iron_tpu.train.stage1 import Stage1Config, Stage1Trainer
    from iron_tpu.utils.logging import ExperimentDir, concatenate_result

    conf = load_config_file(args.conf, case=args.case)
    cfg = stage1_config_from_dict(conf)
    if not args.sync_ckpt:
        import dataclasses
        cfg = dataclasses.replace(cfg, async_ckpt=True)
    data_dir = args.data_dir or conf.get("dataset", {}).get("data_dir")
    folder = args.folder_name or conf.get("dataset", {}).get("folder_name", "image")
    out_dir = args.out_dir or conf.get("general", {}).get("base_exp_dir", "./exp")

    exp = ExperimentDir(out_dir, vars(args))
    import jax
    if args.per_host_shard and jax.process_count() > 1:
        # This CLI trains with the single-host Stage1Trainer (no
        # cross-process gradient pmean): sharded data without the
        # distributed dp step would silently train divergent models racing
        # on one out_dir (ADVICE r3).  Multi-host training goes through
        # dist.train.make_dp_stage1_step on a global mesh.
        p.error("--per_host_shard requires the distributed dp step; this "
                "CLI is single-process. Use iron_tpu.dist.train."
                "make_dp_stage1_step for multi-host runs.")
    ds = RayDataset.from_folder(data_dir, folder_name=folder,
                            per_host_shard=args.per_host_shard)
    trainer = Stage1Trainer(cfg, ds, out_dir=out_dir)
    start = trainer.resume()
    if start == 0 and args.init_ckpt_dir:
        from iron_tpu.train.checkpoints import load_any_checkpoint
        import jax.numpy as jnp
        import jax as _jax
        ck = load_any_checkpoint(args.init_ckpt_dir)
        if ck is not None:
            trainer.params = _jax.tree_util.tree_map(jnp.asarray, ck["params"])
            print(f"[stage1] warm-started from {args.init_ckpt_dir} "
                  f"(step {ck['step']})")
    print(f"[stage1] dataset {ds.n_images} images {ds.hw}; resume step {start}")

    if args.mode == "validate_image":
        out = trainer.render_image(0, resolution_level=4)
        write_image(exp.file(f"val_{trainer.step:07d}.png"),
                    concatenate_result([out["color"],
                                        (out["normal"] + 1) / 2], 2))
        return

    if args.mode == "validate_mesh":
        from iron_tpu.export.mesh import extract_geometry, write_obj
        from iron_tpu.fields.sdf import sdf_only
        verts, tris = extract_geometry(
            lambda pts: -sdf_only(trainer.params["sdf"], pts, cfg.sdf),
            resolution=args.mcube_resolution)
        write_obj(exp.file(f"mesh_{trainer.step:07d}.obj"), verts, tris)
        return

    total = args.num_iters if args.num_iters is not None else cfg.end_iter
    while trainer.step < total:
        n = min(cfg.val_freq, total - trainer.step)
        metrics = trainer.run(num_iters=n, log_every=cfg.report_freq,
                              seed=args.seed)
        exp.metrics.add_scalars(trainer.step, metrics, prefix="stage1/")
        out = trainer.render_image(trainer.step % ds.n_images, resolution_level=4)
        gt = np.asarray(ds.images[trainer.step % ds.n_images])[::4, ::4]
        write_image(exp.file(f"val_{trainer.step:07d}.png"),
                    concatenate_result([gt, out["color"], (out["normal"] + 1) / 2], 3))
    trainer.save()
    trainer.wait_for_saves()


if __name__ == "__main__":
    main()
