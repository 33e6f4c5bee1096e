"""Where does the stage-2 *trainer* step spend time beyond loss+grad?

Times (a) loss+grad alone, (b) grad + optimizer update (one_step body),
(c) the scan-dispatched _train_steps path the bench measures.  All on the
same params so the numbers subtract cleanly.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.train.stage2 import (Stage2Config, Stage2Trainer, stage2_loss,
                                   init_stage2_params)
from iron_tpu.surface.render import SurfaceRenderConfig
from iron_tpu.core.camera import Camera, crop_camera

PATCH = 128
data = render_synthetic_dataset("sphere", n_views=4, H=PATCH * 2, W=PATCH * 2,
                                light=30.0)
cfg = Stage2Config(renderer_name="comp", patch_size=PATCH,
                   surface=SurfaceRenderConfig(edge_budget=1024,
                                               interior_budget=4096))
tr = Stage2Trainer(cfg, data["images"], data["Ks"], data["W2Cs"])
params, mat_cfgs = tr.params, tr.mat_cfgs

K = jnp.asarray(data["Ks"][0]); W2C = jnp.asarray(data["W2Cs"][0])
base = Camera(K=K, W2C=W2C, K_inv=jnp.linalg.inv(K), C2W=jnp.linalg.inv(W2C),
              H=PATCH * 2, W=PATCH * 2)
cam = crop_camera(base, 64, 64, PATCH, PATCH)
gt = jnp.zeros((PATCH, PATCH, 3))
key = jax.random.PRNGKey(1)


def bench(name, f, *a, n=10, **kw):
    r = f(*a, **kw); jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a, **kw)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / n)
    print(json.dumps({"part": name, "ms": round(best * 1e3, 2)}), flush=True)


loss_grad = jax.jit(lambda p: jax.grad(
    lambda q: stage2_loss(q, mat_cfgs, cfg, cam, gt, key)[0])(p))
bench("loss_grad", loss_grad, params)

one = tr._train_step
# donated args: re-feed outputs to keep buffers valid
p, o = params, tr.opt_state
p, o, _ = one(p, o, key, jnp.asarray(0), jnp.asarray(64), jnp.asarray(64))
jax.block_until_ready(p)
for tag, keyed in (("fixed_crop", False), ("random_crop", True)):
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(10):
            if keyed:
                kk = jax.random.fold_in(key, w * 100 + i)
                k1, k2, k3 = jax.random.split(kk, 3)
                idx = jax.random.randint(k1, (), 0, 4)
                uc = jax.random.randint(k2, (), 0, 128)
                ur = jax.random.randint(k3, (), 0, 128)
            else:
                kk, idx, uc, ur = key, jnp.asarray(0), jnp.asarray(64), jnp.asarray(64)
            p, o, m = one(p, o, kk, idx, uc, ur)
        jax.block_until_ready((p, o))
        best = min(best, (time.perf_counter() - t0) / 10)
    print(json.dumps({"part": f"one_step({tag})", "ms": round(best * 1e3, 2)}),
          flush=True)

for chunk in (1, 8, 30):
    p, o, _ = tr._train_steps(p, o, key, chunk)
    jax.block_until_ready(p)
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        p, o, m = tr._train_steps(p, o, jax.random.fold_in(key, 7 * w), chunk)
        jax.block_until_ready((p, o))
        best = min(best, (time.perf_counter() - t0) / chunk)
    print(json.dumps({"part": f"train_steps(chunk={chunk})",
                      "ms": round(best * 1e3, 2)}), flush=True)
