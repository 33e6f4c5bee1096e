"""Multi-host (2-process loopback) test of the distributed runtime.

SURVEY.md §4: "multi-host tests on CPU via jax.distributed loopback".
Two processes bootstrap through jax.distributed.initialize, build a global
mesh over their local CPU devices, and run a dp-sharded stage-1 training
step; process 0 checks the loss is finite and both processes agree.
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid, local_device_ids=[0, 1])
import numpy as np
import jax.numpy as jnp
import optax
sys.path.insert(0, os.getcwd())
from iron_tpu.dist.mesh import make_mesh
from iron_tpu.dist.train import make_dp_stage1_step
from iron_tpu.train.stage1 import Stage1Config, init_stage1_params
from iron_tpu.volume.integrator import NeuSRenderConfig
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4

cfg = Stage1Config(end_iter=4, warm_up_end=1, anneal_end=2, batch_size=32,
                   render=NeuSRenderConfig(n_samples=8, n_importance=8,
                                           n_outside=0, up_sample_steps=2,
                                           perturb=1.0))
params = init_stage1_params(jax.random.PRNGKey(0), cfg)
tx = optax.adam(1e-3)
opt_state = tx.init(params)
mesh = make_mesh(dp=4, tp=1)

g = np.random.default_rng(0)
d = g.normal(size=(32, 3)); d /= np.linalg.norm(d, axis=-1, keepdims=True)
batch_np = np.concatenate([3.0*d, -d, g.uniform(size=(32,3)), np.ones((32,1))], -1).astype(np.float32)
sharding = NamedSharding(mesh, P("dp"))
batch = jax.make_array_from_callback(
    batch_np.shape, sharding,
    lambda idx: batch_np[idx])

step = make_dp_stage1_step(cfg, tx, mesh, tp_shard=False)
p, o, m = step(params, opt_state, batch, jnp.asarray(1), jax.random.PRNGKey(1))
loss = float(m["loss"])
assert np.isfinite(loss)
print(f"RESULT {pid} {loss:.6f}", flush=True)
"""


WORKER_S2 = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid, local_device_ids=[0, 1])
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.getcwd())
from iron_tpu.dist.mesh import make_mesh, replicate, shard_batch
from iron_tpu.dist.train import make_dp_stage2_step, host_sharded_views
from iron_tpu.data.synthetic import render_synthetic_dataset
from iron_tpu.train.stage2 import (Stage2Config, init_stage2_params,
                                   make_optimizer, init_light_from_cameras)
from iron_tpu.surface.render import SurfaceRenderConfig
from iron_tpu.surface.tracer import TracerConfig

assert jax.process_count() == 2
mesh = make_mesh(dp=4, tp=1)

# every process renders the same deterministic dataset, then supplies ONLY
# its own two views to host_sharded_views (the
# make_array_from_process_local_data branch, dist/train.py)
data = render_synthetic_dataset("sphere", n_views=4, H=48, W=48, light=30.0)
local = slice(2 * pid, 2 * pid + 2)
imgs_g, Ks_g, W2Cs_g = host_sharded_views(
    data["images"][local], data["Ks"][local], data["W2Cs"][local], mesh)

cfg = Stage2Config(renderer_name="ggx", patch_size=16,
                   surface=SurfaceRenderConfig(
                       edge_budget=64, edge_side_fallback_budget=16,
                       tracer=TracerConfig(sphere_tracing_iters=16,
                                           dense_iters=8,
                                           fallback_budget=64)))
params, mat_cfgs = init_stage2_params(jax.random.PRNGKey(0), cfg)
params["materials"]["point_light_network"]["light"] = jnp.asarray(
    init_light_from_cameras(data["W2Cs"]), jnp.float32)
tx = make_optimizer(cfg, params)
opt_state = tx.init(params)

D = 4
keys = jax.random.split(jax.random.PRNGKey(1), D)
g = np.random.default_rng(0)
cols = jnp.asarray(g.integers(0, 32, size=(D,)), jnp.int32)
rows = jnp.asarray(g.integers(0, 32, size=(D,)), jnp.int32)

step = make_dp_stage2_step(cfg, mat_cfgs, tx, mesh, per_shard_data=True)
p, o, m = step(replicate(params, mesh), replicate(opt_state, mesh),
               imgs_g, Ks_g, W2Cs_g, shard_batch(keys, mesh),
               shard_batch(jnp.zeros((D,), jnp.int32), mesh),
               shard_batch(cols, mesh), shard_batch(rows, mesh))
loss = float(m["loss"])
assert np.isfinite(loss)
print(f"RESULT {pid} {loss:.8f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_stage2_per_shard_data(tmp_path):
    """VERDICT r4 item 9: drive make_dp_stage2_step(per_shard_data=True) +
    host_sharded_views across two REAL processes (each supplying only its
    own views through jax.make_array_from_process_local_data) and pin one
    step's loss against the identical single-process computation."""
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker_s2.py"
    script.write_text(WORKER_S2)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              cwd=os.path.dirname(os.path.dirname(__file__)),
                              env=env, text=True)
             for i in range(2)]
    losses = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}\n{err[-4000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                losses.append(float(line.split()[2]))
    assert len(losses) == 2
    assert abs(losses[0] - losses[1]) < 1e-7  # both processes agree

    # single-process reference: same step on a 4-device mesh in THIS process
    import jax
    import jax.numpy as jnp
    import numpy as np
    from iron_tpu.dist.mesh import make_mesh, replicate, shard_batch
    from iron_tpu.dist.train import make_dp_stage2_step, host_sharded_views
    from iron_tpu.data.synthetic import render_synthetic_dataset
    from iron_tpu.train.stage2 import (Stage2Config, init_stage2_params,
                                       make_optimizer, init_light_from_cameras)
    from iron_tpu.surface.render import SurfaceRenderConfig
    from iron_tpu.surface.tracer import TracerConfig

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    data = render_synthetic_dataset("sphere", n_views=4, H=48, W=48, light=30.0)
    imgs_g, Ks_g, W2Cs_g = host_sharded_views(
        data["images"], data["Ks"], data["W2Cs"], mesh)
    cfg = Stage2Config(renderer_name="ggx", patch_size=16,
                       surface=SurfaceRenderConfig(
                           edge_budget=64, edge_side_fallback_budget=16,
                           tracer=TracerConfig(sphere_tracing_iters=16,
                                               dense_iters=8,
                                               fallback_budget=64)))
    params, mat_cfgs = init_stage2_params(jax.random.PRNGKey(0), cfg)
    params["materials"]["point_light_network"]["light"] = jnp.asarray(
        init_light_from_cameras(data["W2Cs"]), jnp.float32)
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    D = 4
    keys = jax.random.split(jax.random.PRNGKey(1), D)
    g = np.random.default_rng(0)
    cols = jnp.asarray(g.integers(0, 32, size=(D,)), jnp.int32)
    rows = jnp.asarray(g.integers(0, 32, size=(D,)), jnp.int32)
    step = make_dp_stage2_step(cfg, mat_cfgs, tx, mesh, per_shard_data=True)
    _, _, m = step(replicate(params, mesh), replicate(opt_state, mesh),
                   imgs_g, Ks_g, W2Cs_g, shard_batch(keys, mesh),
                   shard_batch(jnp.zeros((D,), jnp.int32), mesh),
                   shard_batch(cols, mesh), shard_batch(rows, mesh))
    np.testing.assert_allclose(losses[0], float(m["loss"]), rtol=1e-5)


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              cwd=os.path.dirname(os.path.dirname(__file__)),
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    losses = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                losses.append(float(line.split()[2]))
    assert len(losses) == 2
    assert abs(losses[0] - losses[1]) < 1e-6  # both processes agree
