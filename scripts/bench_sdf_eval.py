"""Microbenchmark: SDF sweep throughput — XLA precision paths vs the fused
Pallas kernels (no-grad trace evaluators).  Run on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_tpu.fields.sdf import SDFConfig, init_sdf, sdf_only
from iron_tpu.kernels.fused_sdf import (make_pallas_sdf_only_bf16_fn,
                                        make_pallas_sdf_fn, pallas_available)

N = 262_144
REPS = 20


def bench(name, fn, x, ref=None):
    y = jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(REPS):
        y = fn(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / REPS
    err = ""
    if ref is not None:
        err = f"  maxerr={float(jnp.max(jnp.abs(y - ref))):.2e}"
    print(f"{name:34s} {N / dt / 1e6:8.1f} Mpts/s{err}")
    return y


def main():
    import dataclasses as dc
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-1.0, maxval=1.0)

    f_highest = jax.jit(lambda p: sdf_only(params, p, cfg))
    f_high = jax.jit(lambda p: sdf_only(params, p, dc.replace(cfg, precision="high")))
    f_default = jax.jit(lambda p: sdf_only(params, p, dc.replace(cfg, precision="default")))

    ref = bench("xla HIGHEST", f_highest, x)
    bench("xla HIGH", f_high, x, ref)
    bench("xla DEFAULT", f_default, x, ref)
    if pallas_available():
        for tile in (512, 1024, 2048, 4096):
            f_pl = jax.jit(make_pallas_sdf_only_bf16_fn(params, cfg, tile=tile))
            bench(f"pallas bf16 sdf-only tile={tile}", f_pl, x, ref)
        f_full = jax.jit(lambda p: make_pallas_sdf_fn(params, cfg)(p)[..., 0])
        bench("pallas HIGHEST full (old)", f_full, x, ref)
    else:
        print("pallas unavailable on this backend")


if __name__ == "__main__":
    main()
