"""Bench the shard_map dp stage-2 step on a 1-device mesh vs the plain
single-device trainer step (VERDICT r2 item 2: the multi-chip path must
keep the Pallas coarse-march kernel and the interior budget, so a dp=1
shard_map step should match the single-chip rays/s headline).

Run on the real chip:  /opt/venv/bin/python scripts/bench_dp_shardmap.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PATCH = 128
ITERS = 30
WINDOWS = 3


def main():
    from iron_tpu.data.synthetic import render_synthetic_dataset
    from iron_tpu.train.stage2 import (Stage2Config, init_stage2_params,
                                       make_optimizer, init_light_from_cameras)
    from iron_tpu.surface.render import SurfaceRenderConfig
    from iron_tpu.dist.mesh import make_mesh, replicate, shard_batch
    from iron_tpu.dist.train import make_dp_stage2_step

    data = render_synthetic_dataset("sphere", n_views=4, H=PATCH * 2,
                                    W=PATCH * 2, light=30.0)
    cfg = Stage2Config(renderer_name="comp", patch_size=PATCH,
                       surface=SurfaceRenderConfig(edge_budget=1024,
                                                   interior_budget=4096))
    params, mat_cfgs = init_stage2_params(jax.random.PRNGKey(0), cfg)
    params["materials"]["point_light_network"]["light"] = jnp.asarray(
        init_light_from_cameras(data["W2Cs"]), jnp.float32)
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    D = len(jax.devices())
    mesh = make_mesh(dp=D, tp=1)
    step = make_dp_stage2_step(cfg, mat_cfgs, tx, mesh,
                               data["images"], data["Ks"], data["W2Cs"])

    g = np.random.default_rng(0)
    p = replicate(params, mesh)
    o = replicate(opt_state, mesh)

    def run_iters(p, o, n, seed0):
        for i in range(n):
            keys = jax.random.split(jax.random.PRNGKey(seed0 + i), D)
            idx = jnp.asarray(g.integers(0, 4, size=(D,)), jnp.int32)
            cols = jnp.asarray(g.integers(0, PATCH, size=(D,)), jnp.int32)
            rows = jnp.asarray(g.integers(0, PATCH, size=(D,)), jnp.int32)
            p, o, m = step(p, o, shard_batch(keys, mesh),
                           shard_batch(idx, mesh), shard_batch(cols, mesh),
                           shard_batch(rows, mesh))
        jax.block_until_ready(m)
        return p, o, m

    t0 = time.perf_counter()
    p, o, m = run_iters(p, o, 3, 0)
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s; "
          f"loss {float(m['loss']):.4f}")

    best = float("inf")
    for w in range(WINDOWS):
        t0 = time.perf_counter()
        p, o, m = run_iters(p, o, ITERS, 100 * (w + 1))
        best = min(best, time.perf_counter() - t0)

    rays_s = PATCH * PATCH * ITERS * D / best
    print(f"dp={D} shard_map stage-2 step: {rays_s:,.0f} rays/s total "
          f"({rays_s / D:,.0f} rays/s/chip)")


if __name__ == "__main__":
    main()
