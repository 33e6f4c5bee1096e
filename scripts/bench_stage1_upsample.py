"""Stage-1 upsample_pallas measurement on the chip: throughput (it/s) and
short-run quality (train PSNR after N iters) with the fused bf16 kernel
driving the importance-sampling sweeps vs the XLA HIGH path."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.data.dataset import RayDataset
from iron_tpu.train.stage1 import Stage1Config, Stage1Trainer
from iron_tpu.volume.integrator import NeuSRenderConfig

ITERS_BENCH = 200
ITERS_QUALITY = int(sys.argv[1]) if len(sys.argv) > 1 else 3000

data = render_synthetic_dataset("sphere", n_views=8, H=256, W=256, light=30.0)
ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"])

for flag, core in ((False, "highest"), (True, "highest"), (True, "high")):
    cfg = Stage1Config(upsample_pallas=flag, core_precision=core,
                       end_iter=ITERS_QUALITY + 1,
                       warm_up_end=500, anneal_end=ITERS_QUALITY,
                       render=NeuSRenderConfig(n_samples=64, n_importance=64,
                                               up_sample_steps=4, n_outside=32))
    tr = Stage1Trainer(cfg, ds)
    tr.run(num_iters=20)  # compile + warm
    jax.block_until_ready(tr.params)
    t0 = time.perf_counter()
    tr.run(num_iters=ITERS_BENCH)
    jax.block_until_ready(tr.params)
    dt = time.perf_counter() - t0
    m = tr.run(num_iters=ITERS_QUALITY - ITERS_BENCH - 20)
    psnr = float(np.ravel(np.asarray(m["psnr"]))[-1]) if "psnr" in m else None
    loss = float(np.ravel(np.asarray(m["loss"]))[-1])
    print(json.dumps({"upsample_pallas": flag, "core_precision": core,
                      "it_per_s": round(ITERS_BENCH / dt, 2),
                      "final_loss": round(loss, 5),
                      "final_psnr": None if psnr is None else round(psnr, 3)}),
          flush=True)
