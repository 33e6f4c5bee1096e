"""Full-image eval render throughput (the --render_all / validation path):
rays/s for a 512x512 surface render through Stage2Trainer.render_full,
which now routes through the HIGH trace + Pallas coarse march."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
from iron_tpu.surface.render import SurfaceRenderConfig

RES = 512
data = render_synthetic_dataset("blobby", n_views=2, H=RES, W=RES, light=30.0)
cfg = Stage2Config(renderer_name="comp", patch_size=128,
                   surface=SurfaceRenderConfig(edge_budget=4096,
                                               interior_budget=131072))
tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"])
tr.run(num_iters=50)  # move off geometric init a bit

KEYS = ("color", "normal", "depth", "convergent_mask")
res = tr.render_full(0, keys=KEYS)  # compile
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        res = tr.render_full(0, keys=KEYS)
    best = min(best, (time.perf_counter() - t0) / 5)
# NOTE: on tunneled devices this includes the host transfer of the fetched
# buffers (~28 MB/s through the axon tunnel); the device-only render is
# ~99 ms / 2.6M rays/s at 512^2 (measured by timing the jitted call with
# buffers left on device).
print(json.dumps({"metric": "stage2_eval_render_rays_per_s",
                  "res": RES,
                  "value": round(RES * RES / best, 1),
                  "ms_per_image": round(best * 1e3, 1)}))
