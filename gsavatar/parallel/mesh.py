"""Device mesh construction for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.12) — every parallel
capability here is new design. The workload's natural axes:

  * `data`  — independent camera frames (and, multi-subject, independent
              avatars): pure data parallelism, gradients psum-reduced.
              Maps to DCN between hosts and ICI within a slice.
  * `model` — within one frame: the Gaussian set for the geometry stages
              (deformers are embarrassingly parallel over points — the
              tensor-parallel analog) and the tile grid for compositing
              (the sequence-parallel analog; pixels are this workload's
              "sequence"). XLA SPMD inserts the all-gathers/reduce-scatters
              between the two layouts.

Pipeline/expert parallelism have no counterpart here: the model is a few
tiny MLPs (microseconds per layer — no pipeline depth to fill) and there is
no routed sparsity. Scale comes from data x (gaussians|tiles)."""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


_DIST_INITIALIZED = False


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """Multi-host runtime init (jax.distributed). Call once per process
    before building a mesh; afterwards `jax.devices()` is the GLOBAL device
    set and `make_mesh` lays ('data','model') across hosts — put `data`
    outermost so the frame-parallel gradient psum rides DCN while the
    gaussian/tile `model` collectives stay on ICI within a slice.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) / TPU metadata autodetection, exactly
    like jax.distributed.initialize. Idempotent; a no-op for single-process
    runs with no coordinator configured."""
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return False
    import os
    have_cfg = (coordinator_address or num_processes
                or os.environ.get('JAX_COORDINATOR_ADDRESS')
                or os.environ.get('COORDINATOR_ADDRESS'))
    if not have_cfg:
        return False  # single-process: nothing to wire
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    _DIST_INITIALIZED = True
    return True


def factorize(n: int) -> tuple:
    """Split n devices into (data, model) as square as possible, data-major."""
    best = (n, 1)
    for d in range(1, n + 1):
        if n % d == 0:
            m = n // d
            if abs(math.log(d / m)) < abs(math.log(best[0] / best[1])):
                best = (d, m)
    return best


def make_mesh(n_devices=None, data=None, model=None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None or model is None:
        data, model = factorize(n)
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=('data', 'model'))
