"""Where does the stage-1 step actually spend its time?  Component
ablation on the chip: forward-only vs +grad, with/without the importance
chain, and the chain's sort/merge cost in isolation.
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
from iron_tpu.train.stage1 import Stage1Config, stage1_loss, init_stage1_params
from iron_tpu.volume.integrator import NeuSRenderConfig

BATCH = 2048

data = render_synthetic_dataset("sphere", n_views=4, H=128, W=128, light=30.0)
ds = RayDataset.from_arrays(data["images"], data["Ks"], data["W2Cs"],
                            data["masks"][..., :1])


def timeit(f, *args, n=20):
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def cfg_with(**kw):
    render_kw = dict(n_samples=64, n_importance=64, n_outside=0,
                     up_sample_steps=4, perturb=1.0)
    render_kw.update({k: v for k, v in kw.items() if k in render_kw})
    other = {k: v for k, v in kw.items() if k not in render_kw}
    return Stage1Config(batch_size=BATCH, mask_weight=0.1,
                        render=NeuSRenderConfig(**render_kw), **other)


key = jax.random.PRNGKey(0)
params = init_stage1_params(key, cfg_with())
batch = ds.gen_random_rays(jax.random.PRNGKey(1), 0, BATCH)
batch = jax.block_until_ready(batch)

rows = {}
for name, cfg in [
    ("full_4rounds", cfg_with()),
    ("1round64", cfg_with(up_sample_steps=1)),
    ("0rounds_128uniform", cfg_with(n_importance=0, n_samples=128)),
    ("4rounds_16samples", cfg_with(n_samples=16)),
]:
    fwd = jax.jit(lambda p, b, k: stage1_loss(p, cfg, b, k, 1.0)[0])
    g = jax.jit(jax.grad(lambda p, b, k: stage1_loss(p, cfg, b, k, 1.0)[0]))
    k = jax.random.PRNGKey(2)
    rows[name] = {"fwd_ms": round(timeit(fwd, params, batch, k), 2),
                  "fwd_bwd_ms": round(timeit(g, params, batch, k), 2)}
    print(json.dumps({name: rows[name]}), flush=True)

# isolated sort cost at the chain's shapes
z = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, 128))
srt = jax.jit(lambda x: jnp.sort(x, axis=-1))
print(json.dumps({"sort_2048x128_ms": round(timeit(srt, z), 3)}), flush=True)
ss = jax.jit(lambda c, u: jax.vmap(lambda cc, uu: jnp.searchsorted(cc, uu, side="right"))(c, u))
u = jax.random.uniform(jax.random.PRNGKey(4), (BATCH, 16))
print(json.dumps({"searchsorted_2048x128x16_ms": round(timeit(ss, jnp.sort(z, -1), u), 3)}), flush=True)
