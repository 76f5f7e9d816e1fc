"""Sharding-hint context.

Compute-path modules (rasterizer, losses) call `hint(x, axes)` at layout
boundaries; outside a mesh context it is a no-op (single-chip jit), inside
`sharding_scope(mesh)` it becomes a `with_sharding_constraint` over the named
axes. This keeps the ops code mesh-agnostic while letting the sharded train
step (parallel/shard.py) lay the tile grid over `model` for compositing and
arena rows over `model` for geometry — XLA SPMD then places the regroup
collectives between the two layouts. Constraints compose with vmap (the
batch dim is rank-prepended automatically, verified on jax 0.9)."""
from __future__ import annotations

import contextlib
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


@contextlib.contextmanager
def sharding_scope(mesh: Mesh):
    global _MESH
    prev = _MESH
    _MESH = mesh
    try:
        with mesh:
            yield mesh
    finally:
        _MESH = prev


def active_mesh() -> Optional[Mesh]:
    return _MESH


def hint(x, *axes):
    """Constrain `x`'s leading dims to the given mesh axes (None = not
    sharded); no-op outside sharding_scope. Trailing unlisted dims are
    unsharded."""
    if _MESH is None:
        return x
    axes = tuple(a if a is None or a in _MESH.shape else None for a in axes)
    return jax.lax.with_sharding_constraint(x, NamedSharding(_MESH, P(*axes)))
