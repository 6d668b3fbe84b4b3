"""Real multi-process (multi-host-style) training test on CPU.

Launches TWO coordinator-connected processes, each with 4 virtual CPU
devices (global mesh = 8), shards a train step over the global 'data' axis
with per-process local batch shards (``local_batch_to_global``), and checks
both processes compute the identical global loss — the multi-host smoke the
reference lacks entirely (SURVEY §4: "no real-cluster distributed tests").
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys

coord, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, {repo!r})
from rsprompter_tpu.parallel.distributed import (
    initialize, local_batch_to_global, process_info,
)

initialize(coordinator_address=coord, num_processes=2, process_id=pid)
info = process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax

from rsprompter_tpu.engine.train_state import TrainState, make_sharded_train_step
from rsprompter_tpu.parallel.mesh import make_mesh


class Toy(nn.Module):
    @nn.compact
    def loss(self, batch, rng=None):
        y = nn.Dense(8, name="head")(batch["x"])
        return {"loss_mse": jnp.mean((y - batch["y"]) ** 2)}

    def __call__(self, batch, rng=None):
        return self.loss(batch, rng)


mesh = make_mesh(n_data=8, n_model=1)
model = Toy()
# deterministic global batch; each process holds rows [pid*8:(pid+1)*8)
full_x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4) / 10.0
full_y = np.ones((16, 8), np.float32)
local = {"x": full_x[pid * 8:(pid + 1) * 8], "y": full_y[pid * 8:(pid + 1) * 8]}
batch = local_batch_to_global(local, mesh)

variables = model.init({"params": jax.random.PRNGKey(0)}, batch, method="loss")
tx = optax.sgd(0.1)
state = TrainState.create(variables["params"], None, tx)
step, sharded_state = make_sharded_train_step(
    model, tx, mesh, state, batch, zero=True
)
new_state, metrics = step(sharded_state, batch, jax.random.PRNGKey(1))
loss = float(metrics["loss"])
assert np.isfinite(loss)
assert int(jax.device_get(new_state.step)) == 1
print(f"RANK{pid} OK loss={loss:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = _WORKER.replace("{repo!r}", repr(REPO))
    env = dict(os.environ)
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i}:\n{out[-3000:]}"
    losses = [
        line.split("loss=")[1]
        for out in outs for line in out.splitlines() if "OK loss=" in line
    ]
    assert len(losses) == 2 and losses[0] == losses[1], losses
