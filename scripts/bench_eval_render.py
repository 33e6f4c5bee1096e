"""Full-image eval render bench (--render_all / validation path) with
edge-budget safety accounting (VERDICT r3 item 5).

Renders the TORUS (the scene that motivated resolution-scaled edge
budgets) through Stage2Trainer.render_full — which applies
scale_config_for_resolution — at 512^2 (timed) and 1024^2 (once), and
asserts edge_seeds_dropped == 0 at both: the reference processes ALL edge
pixels (raytracer.py:422-539), so a capped eval render is a correctness
bug, not a perf choice.

Timing note: fetching only tiny scalar buffers keeps the measurement
device-bound (the axon tunnel transfers ~28 MB/s; fetching full 512^2
buffers would dominate).  ms_per_image_fetch adds the color buffer fetch
for context.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
from iron_tpu.surface.render import SurfaceRenderConfig


def bench(res, timed_iters=5):
    data = render_synthetic_dataset("torus", n_views=2, H=res, W=res,
                                    light=30.0, rig="hemisphere",
                                    rig_kwargs={"pole": "y"})
    cfg = Stage2Config(renderer_name="comp", patch_size=128,
                       surface=SurfaceRenderConfig(edge_budget=1024,
                                                   interior_budget=4096))
    tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"])
    tr.run(num_iters=50)  # move off geometric init a bit

    scalar_keys = ("edge_seed_count", "edge_seeds_dropped")
    res0 = tr.render_full(0, keys=scalar_keys)  # compile
    seeds = int(res0["edge_seed_count"])
    dropped = int(res0["edge_seeds_dropped"])
    assert dropped == 0, (
        f"{res}^2 render dropped {dropped} of {seeds} edge seeds — "
        "scale_config_for_resolution budget too small")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(timed_iters):
            r = tr.render_full(0, keys=scalar_keys)
        best = min(best, (time.perf_counter() - t0) / timed_iters)

    t0 = time.perf_counter()
    tr.render_full(0, keys=("color",))
    fetch_dt = time.perf_counter() - t0

    print(json.dumps({"metric": "stage2_eval_render_rays_per_s",
                      "scene": "torus", "res": res,
                      "value": round(res * res / best, 1),
                      "ms_per_image": round(best * 1e3, 1),
                      "ms_per_image_fetch": round(fetch_dt * 1e3, 1),
                      "edge_seed_count": seeds,
                      "edge_seeds_dropped": dropped}), flush=True)


if __name__ == "__main__":
    bench(512, timed_iters=5)
    bench(1024, timed_iters=1)
