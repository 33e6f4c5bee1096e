"""Chase the 538k-vs-465k anomaly (VERDICT r3 item 4): the dp=1 shard_map
stage-2 step (per-step host dispatch) measured 16% faster than the plain
trainer (lax.scan over 8 steps).  This A/B isolates the program structure:

  a) plain single step, per-step host dispatch (async-pipelined)
  b) scan-of-N steps (the trainer's _train_steps path)
  c) dp=1 shard_map step, per-step dispatch (the round-3 winner)

Same config/workload as bench.py.  Run on the chip.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PATCH = 128
ITERS = 32
WINDOWS = 3


def timed(label, warm, run):
    warm()
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    rays_s = PATCH * PATCH * ITERS / best
    print(json.dumps({"variant": label, "rays_per_s": round(rays_s, 1),
                      "ms_per_step": round(1e3 * best / ITERS, 2)}), flush=True)
    return rays_s


def main():
    from iron_tpu.data.synthetic import render_synthetic_dataset
    from iron_tpu.train.stage2 import (Stage2Config, Stage2Trainer,
                                       init_stage2_params, make_optimizer,
                                       init_light_from_cameras)
    from iron_tpu.surface.render import SurfaceRenderConfig
    from iron_tpu.dist.mesh import make_mesh, replicate, shard_batch
    from iron_tpu.dist.train import make_dp_stage2_step

    data = render_synthetic_dataset("sphere", n_views=4, H=PATCH * 2,
                                    W=PATCH * 2, light=30.0)
    cfg = Stage2Config(renderer_name="comp", patch_size=PATCH,
                       surface=SurfaceRenderConfig(edge_budget=1024,
                                                   interior_budget=4096))
    tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"])

    g = np.random.default_rng(0)

    # The workload depends on SDF state (Pallas march early exit, fallback
    # population), so every variant must measure from the SAME state: train
    # a fixed burn-in once, snapshot, and reset before each variant.
    tr.run(num_iters=64, steps_per_call=8)
    jax.block_until_ready(tr.params)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    p0, o0 = copy(tr.params), copy(tr.opt_state)

    # (a) scan-of-8 (the trainer default)
    def warm_a():
        tr.params, tr.opt_state = copy(p0), copy(o0)
        tr.run(num_iters=8, steps_per_call=8)
        jax.block_until_ready(tr.params)

    def run_a():
        tr.params, tr.opt_state = copy(p0), copy(o0)
        tr.run(num_iters=ITERS, steps_per_call=8)
        jax.block_until_ready(tr.params)

    timed("scan_of_8", warm_a, run_a)

    # (b) per-step dispatch of the plain one-step program (async-pipelined)
    def steps_b(n, seed0):
        p, o = copy(p0), copy(o0)
        for i in range(n):
            idx = jnp.asarray(g.integers(0, 4), jnp.int32)
            col = jnp.asarray(g.integers(0, PATCH), jnp.int32)
            row = jnp.asarray(g.integers(0, PATCH), jnp.int32)
            p, o, m = tr._train_step(p, o, jax.random.PRNGKey(seed0 + i),
                                     idx, col, row)
        jax.block_until_ready(p)

    timed("plain_per_step", lambda: steps_b(4, 0), lambda: steps_b(ITERS, 100))

    # (c) dp=1 shard_map, per-step dispatch — SAME burn-in state
    mat_cfgs = tr.mat_cfgs
    tx = tr.tx
    D = len(jax.devices())
    mesh = make_mesh(dp=D, tp=1)
    step = make_dp_stage2_step(cfg, mat_cfgs, tx, mesh,
                               data["images"], data["Ks"], data["W2Cs"])

    def iters_c(n, seed0):
        p = replicate(copy(p0), mesh)
        o = replicate(copy(o0), mesh)
        for i in range(n):
            keys = jax.random.split(jax.random.PRNGKey(seed0 + i), D)
            idx = jnp.asarray(g.integers(0, 4, size=(D,)), jnp.int32)
            cols = jnp.asarray(g.integers(0, PATCH, size=(D,)), jnp.int32)
            rows = jnp.asarray(g.integers(0, PATCH, size=(D,)), jnp.int32)
            p, o, m = step(p, o, shard_batch(keys, mesh),
                           shard_batch(idx, mesh), shard_batch(cols, mesh),
                           shard_batch(rows, mesh))
        jax.block_until_ready(p)

    timed("shardmap_dp1_per_step", lambda: iters_c(4, 0),
          lambda: iters_c(ITERS, 1000))


if __name__ == "__main__":
    main()
