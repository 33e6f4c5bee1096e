"""Sweep stage-2 trainer perf knobs on the real chip (one JSON line each)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
from iron_tpu.surface.render import SurfaceRenderConfig

PATCH, ITERS = 128, 30
data = render_synthetic_dataset("sphere", n_views=4, H=PATCH*2, W=PATCH*2, light=30.0)

def bench(tag, **kw):
    surf = kw.pop("surface", SurfaceRenderConfig(edge_budget=1024, interior_budget=4096))
    cfg = Stage2Config(renderer_name="comp", patch_size=PATCH, surface=surf, **kw)
    tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"])
    tr.run(num_iters=3); jax.block_until_ready(tr.params)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter(); tr.run(num_iters=ITERS); jax.block_until_ready(tr.params)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"tag": tag, "rays_per_s": round(PATCH*PATCH*ITERS/best, 1)}), flush=True)

if __name__ == "__main__":
    from iron_tpu.surface.tracer import TracerConfig
    import dataclasses as _dc
    for arg in sys.argv[1:]:
        if arg == "baseline":
            bench("no_coarse", coarse_trace_precision=None)
        elif arg == "coarse":
            bench("coarse_default", coarse_trace_precision="default")
        elif arg.startswith("c2f:"):
            # c2f:cd=12,cs=16,rf=2,fb=2048,eb=1024,ib=4096,esb=512
            kv = dict(s.split("=") for s in arg[4:].split(","))
            tc = TracerConfig(
                coarse_dense_iters=int(kv.get("cd", 12)),
                coarse_straggler_iters=int(kv.get("cs", 16)),
                refine_iters=int(kv.get("rf", 2)),
                fallback_budget=int(kv.get("fb", 2048)),
                n_steps=int(kv.get("ns", 128)),
                sphere_tracing_iters=int(kv.get("st", 48)),
            )
            surf = SurfaceRenderConfig(
                tracer=tc,
                edge_budget=int(kv.get("eb", 1024)),
                interior_budget=int(kv.get("ib", 4096)),
                edge_side_fallback_budget=int(kv.get("esb", 512)),
            )
            bench(arg, surface=surf, coarse_trace_precision="default")
