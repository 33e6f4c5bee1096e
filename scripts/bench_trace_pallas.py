"""Stage-2 trace_pallas on-chip A/B (BENCH_NOTES roadmap 7).

The hi/lo-split fused kernel (make_pallas_sdf_only_3pass_fn) replaces the
XLA-HIGH evaluator on every accurate no-grad trace consumer: refine,
bisection, fallback revalidation, edge-side traces.  Same workload as
bench.py.  Also microbenches the raw evaluator vs the XLA HIGH path.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PATCH, WARMUP, ITERS, WINDOWS = 128, 8, 30, 3

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
from iron_tpu.surface.render import SurfaceRenderConfig

# --- raw evaluator microbench ---
import dataclasses as dc
from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_only
from iron_tpu.kernels.fused_sdf import make_pallas_sdf_only_3pass_fn

cfg0 = SDFConfig()
params0 = init_sdf(jax.random.PRNGKey(0), cfg0)
x = jax.random.uniform(jax.random.PRNGKey(1), (262144, 3), minval=-1, maxval=1)
high = dc.replace(cfg0, precision="high")
for name, fn in [("xla_high", jax.jit(lambda p: sdf_only(params0, p, high))),
                 ("pallas_3pass", jax.jit(make_pallas_sdf_only_3pass_fn(params0, cfg0)))]:
    fn(x).block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fn(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"micro": name,
                      "mpts_per_s": round(x.shape[0] / best / 1e6, 2)}),
          flush=True)

# --- full training-step A/B ---
data = render_synthetic_dataset("sphere", n_views=4, H=PATCH * 2,
                                W=PATCH * 2, light=30.0)
for trace_pallas in (False, True):
    cfg = Stage2Config(renderer_name="comp", patch_size=PATCH,
                       trace_pallas=trace_pallas,
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
    print(json.dumps({"trace_pallas": trace_pallas,
                      "rays_per_s": round(PATCH * PATCH * ITERS / best, 1),
                      "ms_per_step": round(best / ITERS * 1e3, 2)}),
          flush=True)
