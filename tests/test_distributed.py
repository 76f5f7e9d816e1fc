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


# mini end-to-end `training()` THROUGH THE DRIVER across both processes:
# cfg.parallel={data:2, model:2} over the 4 global devices — the data axis
# spans the two processes, so every gradient psum crosses the coordinator-
# wired transport; frame sampling is seed-identical on both hosts; only
# process 0 owns the metrics logger.
_WORKER_TRAIN = _WORKER + r"""
from gsavatar.config import load_config
from gsavatar.train import training

cfg = load_config(overrides=[
    "dataset=synthetic",
    "dataset.img_hw=[64,64]",
    "dataset.n_verts=512",
    "dataset.n_points=768",
    "dataset.n_target_gaussians=512",
    "dataset.train_frames=[0,2,1]",
    "dataset.train_views=['0']",
    "model.gaussian.capacity=1024",
    "model.gaussian.delay=0",
    "rasterizer.max_pairs=65536",
    "rasterizer.per_tile_capacity=1024",
    "rasterizer.chunk=32",
    "opt.skinning_pool_size=2048",
    "opt.n_reg_pts=128",
    "parallel.data=2",
    "parallel.model=2",
    "test_interval=0",
    "checkpoint_iterations=[]",
    "seed=0",
])
cfg['exp_dir'] = os.path.join(os.environ["EXP_DIR"], "exp")
scene, state, logger = training(cfg, max_iterations=3, log_every=1,
                                progress=False)
if jax.process_index() == 0:
    losses = [r['loss/total_loss'] for r in logger.history
              if 'loss/total_loss' in r]
    assert len(losses) == 3, logger.history
    assert all(l == l for l in losses), losses
    print(f"train-mini ok losses={losses}", flush=True)
else:
    assert logger is None
    print("train-mini ok (follower)", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, body, timeout):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(body)
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(COORD=coord, PROC_ID=str(pid), GSAVATAR_REPO=repo,
                   EXP_DIR=str(tmp_path))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    return outs


def test_two_process_distributed(tmp_path):
    outs = _run_workers(tmp_path, _WORKER, timeout=180)
    assert any("proc 0: loss=69.00" in o for o in outs), outs
    assert any("proc 1: loss=69.00" in o for o in outs), outs


@pytest.mark.slow  # two full train-step compiles on two shared host CPUs
def test_two_process_driver_training(tmp_path):
    outs = _run_workers(tmp_path, _WORKER_TRAIN, timeout=1500)
    assert any("train-mini ok losses=" in o for o in outs), outs
    assert any("train-mini ok (follower)" in o for o in outs), outs
