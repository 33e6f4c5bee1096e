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
