"""Real 2-process jax.distributed smoke test (VERDICT r2 Next #8):
`initialize_distributed` has only ever taken its no-coordinator early-return
branch in tests. Here two actual processes wire up through a localhost
coordinator (CPU backend, 2 virtual devices each -> 4 global devices),
build the ('data','model') mesh over the GLOBAL device set with
parallel.mesh.make_mesh, and run one sharded computation whose psum spans
both processes."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")   # beat the axon sitecustomize
sys.path.insert(0, os.environ["GSAVATAR_REPO"])

from gsavatar.parallel.mesh import initialize_distributed, make_mesh

ok = initialize_distributed(
    coordinator_address=os.environ["COORD"],
    num_processes=2, process_id=int(os.environ["PROC_ID"]))
assert ok, "initialize_distributed took the no-op branch"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

mesh = make_mesh()  # over the global device set
assert dict(mesh.shape) == {"data": 2, "model": 2}, mesh.shape

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# one sharded step: data-sharded batch, replicated params, psum-mean grad —
# the communication pattern of the sharded train step in miniature
xs = jax.device_put(
    jnp.arange(8.0).reshape(4, 2),
    NamedSharding(mesh, P("data", None)))
w = jax.device_put(jnp.ones((2, 2)), NamedSharding(mesh, P()))

@jax.jit
def step(w, xs):
    loss = jnp.mean((xs @ w) ** 2)
    return loss, jax.grad(lambda w: jnp.mean((xs @ w) ** 2))(w)

loss, g = step(w, xs)
jax.block_until_ready(g)
print(f"proc {jax.process_index()}: loss={float(loss):.4f} "
      f"gsum={float(jnp.sum(g)):.4f}", flush=True)
assert abs(float(loss) - 69.0) < 1e-4, float(loss)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(COORD=coord, PROC_ID=str(pid), GSAVATAR_REPO=repo)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    assert any("proc 0: loss=69.00" in o for o in outs), outs
    assert any("proc 1: loss=69.00" in o for o in outs), outs
