"""Stage-1 step breakdown on the chip: sampling / upsample / core / grad."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.data.dataset import RayDataset, near_far_from_sphere
from iron_tpu.train.stage1 import (Stage1Config, Stage1Trainer, init_stage1_params,
                                   stage1_loss, stage1_render)
from iron_tpu.volume.integrator import NeuSRenderConfig

cfg = Stage1Config(batch_size=512,
                   render=NeuSRenderConfig(n_samples=64, n_importance=64,
                                           n_outside=0, up_sample_steps=4,
                                           perturb=1.0))
params = init_stage1_params(jax.random.PRNGKey(0), cfg)

g = np.random.default_rng(0)
d = g.normal(size=(512, 3)); d /= np.linalg.norm(d, -1, keepdims=True)
ro = jnp.asarray(3.0 * d, jnp.float32); rd = jnp.asarray(-d, jnp.float32)
batch = jnp.concatenate([ro, rd, jnp.ones((512, 3)) * 0.5, jnp.ones((512, 1))], -1)
key = jax.random.PRNGKey(1)

def t_render_fwd(params):
    near, far = near_far_from_sphere(ro, rd)
    out = stage1_render(params, cfg, ro, rd, near, far, key, 1.0, None)
    return out["color_fine"].sum()

def t_loss(params):
    return stage1_loss(params, cfg, batch, key, 1.0)[0]

def t_grad(params):
    return jax.grad(lambda p: stage1_loss(p, cfg, batch, key, 1.0)[0])(params)["sdf"]["layers"][0]["g"].sum()

def bench(name, fn):
    f = jax.jit(fn)
    r = f(params); jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(params)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / 20)
    print(json.dumps({"part": name, "ms": round(best * 1e3, 2)}), flush=True)

bench("render_fwd", t_render_fwd)
bench("loss_fwd", t_loss)
bench("loss_grad", t_grad)

# full trainer step rate (scan-amortized)
data = render_synthetic_dataset("sphere", n_views=4, H=128, W=128, light=30.0)
ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                            data["masks"][..., :1])
tr = Stage1Trainer(cfg, ds)
tr.run(num_iters=32)
t0 = time.perf_counter(); tr.run(num_iters=200); jax.block_until_ready(tr.params)
dt = time.perf_counter() - t0
print(json.dumps({"part": "full_step_rate_it_s", "value": round(200 / dt, 1)}), flush=True)
