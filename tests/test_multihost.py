"""Real multi-process coordination test on CPU devices.

Spawns TWO separate python processes that jax.distributed-initialize against
a local coordinator, each exposing 4 virtual CPU devices (global mesh = 8),
assemble a global batch from host-local halves, and run one psum'd sharded
train-ish step. This is the multi-node mechanism the reference delegated
entirely to HF accelerate (SURVEY.md §4: "multi-node is never tested
without a cluster") — here it runs in CI.

The workers run in subprocesses because jax.distributed can only be
initialized once per process and must own the backend from the start.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

from t2v_turbo_tpu.parallel import multihost
multihost.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import jax.numpy as jnp
from t2v_turbo_tpu.parallel.mesh import make_mesh

mesh = make_mesh(seq=2)  # 8 global devices -> (data=4, seq=2, model=1)

# host-local batch: each process contributes DIFFERENT rows
local_b, t = 2, 4
rows = np.full((local_b, t, 8, 8, 4), float(pid), np.float32)
vec = np.full((local_b,), float(pid), np.float32)
batch = multihost.host_local_batch_to_global(
    mesh, {"latents": rows, "fps": vec, "_text": ["dropped"]}
)
assert "_text" not in batch
glob_b = local_b * nproc
assert batch["latents"].shape == (glob_b, t, 8, 8, 4), batch["latents"].shape
assert batch["fps"].shape == (glob_b,)

# a sharded computation over the global batch: mean over B must see BOTH
# hosts' values (0 and 1) -> 0.5
with mesh:
    mean = jax.jit(lambda b: jnp.mean(b["fps"]))(batch)
expected = sum(range(nproc)) / nproc
np.testing.assert_allclose(np.asarray(mean), expected, rtol=1e-6)

# per-shard provenance: process-local data landed on this host's devices
local_vals = set()
for shard in batch["fps"].addressable_shards:
    local_vals.update(np.asarray(shard.data).ravel().tolist())
assert local_vals == {float(pid)}, local_vals

print(f"WORKER_{pid}_OK mean={float(mean)}")
"""


def test_two_process_global_batch(tmp_path):
    nproc = 2
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=560)
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    for i in range(nproc):
        assert f"WORKER_{i}_OK" in outs[i]
