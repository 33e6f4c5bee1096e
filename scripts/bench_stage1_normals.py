"""Stage-1 normals-mode A/B: vjp (reverse) vs jvp (forward-mode) normals.

VERDICT r3 item 3 / SURVEY §7.4.2: the round-3 ablation showed the stage-1
ceiling is the second-order render_core graph — the loss backward
differentiates through vjp-based normals (reverse-over-reverse).  The
'jvp' mode (fields.sdf.sdf_value_feat_grad_fwd) builds normals from 3
structured forward-mode tangents so the loss backward is
reverse-over-forward.  Both are exact (tests/test_fields.py pins parity);
this script measures which is faster on the chip, plus an optional
equal-PSNR check at --iters training steps.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.data.dataset import RayDataset
from iron_tpu.train.stage1 import Stage1Config, Stage1Trainer
from iron_tpu.volume.integrator import NeuSRenderConfig

data = render_synthetic_dataset("sphere", n_views=4, H=128, W=128, light=30.0)
ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                            data["masks"][..., :1])


def bench(batch, mode, iters=96, train_iters=0, bg=False, spc=16):
    cfg = Stage1Config(batch_size=batch, mask_weight=0.1, normals_mode=mode,
                       render=NeuSRenderConfig(n_samples=64, n_importance=64,
                                               n_outside=32 if bg else 0,
                                               up_sample_steps=4, perturb=1.0))
    tr = Stage1Trainer(cfg, ds)
    tr.run(num_iters=32, steps_per_call=spc)
    jax.block_until_ready(tr.params)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        tr.run(num_iters=iters, steps_per_call=spc)
        jax.block_until_ready(tr.params)
        best = min(best, time.perf_counter() - t0)
    rec = {"batch": batch, "mode": mode, "bg_nerf": bg, "steps_per_call": spc,
           "it_per_s": round(iters / best, 2),
           "rays_per_s": round(batch * iters / best, 1)}
    if train_iters:
        m = tr.run(num_iters=train_iters, steps_per_call=spc)
        rec["psnr_at"] = tr.step
        rec["psnr"] = round(m.get("psnr", float("nan")), 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=0,
                   help="additionally train this many steps and report PSNR")
    p.add_argument("--batches", type=int, nargs="+", default=[512, 2048])
    p.add_argument("--bg", action="store_true", help="include bg NeRF")
    p.add_argument("--spc", type=int, nargs="+", default=[16, 1],
                   help="steps_per_call values (scan vs per-step dispatch)")
    p.add_argument("--modes", nargs="+", default=["vjp", "jvp"],
                   choices=["vjp", "jvp", "pallas"],
                   help="normals modes to A/B ('pallas' = the fused "
                        "second-order kernel, kernels/fused_sdf_grad.py)")
    args = p.parse_args()
    for batch in args.batches:
        for mode in args.modes:
            for spc in args.spc:
                bench(batch, mode, train_iters=args.iters if spc == args.spc[0] else 0,
                      bg=args.bg, spc=spc)
