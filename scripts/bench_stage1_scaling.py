"""Stage-1 throughput sweep: batch size x remat x occupancy, on the chip.

The reference trains 512 rays/iter (confs/womask_iron.conf:22); at that
size the program is latency-bound (BENCH_NOTES stage-1 breakdown).  This
sweep measures the rays/s headroom from (a) larger batches, enabled by
rematerializing the second-order eikonal graph (Stage1Config.remat_core),
and (b) occupancy-guided initial sampling (use_occupancy).  Quality per
*ray* is what matters for the loss; batch is a config knob.
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


def bench(batch, remat, occupancy, iters=96):
    cfg = Stage1Config(batch_size=batch, mask_weight=0.1, remat_core=remat,
                       use_occupancy=occupancy,
                       render=NeuSRenderConfig(n_samples=64, n_importance=64,
                                               n_outside=0, up_sample_steps=4,
                                               perturb=1.0))
    try:
        tr = Stage1Trainer(cfg, ds)
        tr.run(num_iters=32)
        jax.block_until_ready(tr.params)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            tr.run(num_iters=iters)
            jax.block_until_ready(tr.params)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "batch": batch, "remat": remat, "occupancy": occupancy,
            "it_per_s": round(iters / best, 2),
            "rays_per_s": round(batch * iters / best, 1)}), flush=True)
    except Exception as e:  # OOM at compile etc.
        print(json.dumps({"batch": batch, "remat": remat,
                          "occupancy": occupancy,
                          "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true")
    args = p.parse_args()
    if args.full:
        for occ in (False, True):
            for batch, remat in [(512, False), (2048, False), (2048, True),
                                 (4096, True), (8192, True), (16384, True)]:
                bench(batch, remat, occ)
    else:
        for batch, remat in [(512, False), (2048, True), (8192, True),
                             (16384, True)]:
            bench(batch, remat, False)
