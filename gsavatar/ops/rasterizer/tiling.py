"""Gaussian->tile pair building and depth ordering.

TPU-first replacement for the CUDA kernel's duplicate+radix-sort stage
(SURVEY.md §2.9): instead of a dynamic per-frame pair count, we expand into a
fixed-capacity pair arena (static shapes for XLA), lexicographically sort by
(tile, depth) with jax.lax.sort, and scatter into a dense (num_tiles, K)
per-tile index matrix that the compositor consumes with fully regular loads.
Overflow (pairs beyond capacity, or per-tile entries beyond K) is counted and
reported — the reference never drops work, so callers should size capacities
to keep the overflow counters at zero (they are cheap to check in tests).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .project import Projection


class TileAssignment(NamedTuple):
    tile_gauss_idx: jnp.ndarray  # (num_tiles, K) int32, -1 = empty
    n_pairs: jnp.ndarray         # () int32: valid pairs produced
    pair_overflow: jnp.ndarray   # () int32: pairs dropped (arena full)
    tile_overflow: jnp.ndarray   # () int32: pairs dropped (tile K full)


def build_tile_assignment(proj: Projection, grid_x: int, grid_y: int,
                          max_pairs: int, per_tile_capacity: int) -> TileAssignment:
    num_tiles = grid_x * grid_y
    # run expansion via per-(gaussian, rect-row) scatter + cummax — shared
    # with the pairs path; division-free (see pairs.expand_pairs)
    from .pairs import expand_pairs
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    g_safe, tile_id, valid, total = expand_pairs(proj, grid_x, grid_y,
                                                 max_pairs)
    depth = jnp.where(valid, proj.depths[g_safe], jnp.inf)

    # lexicographic (tile, depth) sort; gaussian index rides along
    sorted_tile, _, sorted_g = jax.lax.sort(
        (tile_id, depth, g_safe), num_keys=2)

    # per-tile segment starts via scatter-min + reversed cummin (see
    # pairs.py)
    first = jnp.full((num_tiles + 1,), max_pairs, jnp.int32)
    first = first.at[jnp.clip(sorted_tile, 0, num_tiles)].min(slots)
    tile_start = jax.lax.associative_scan(jnp.minimum, first,
                                          reverse=True)[:num_tiles]
    rank = slots - tile_start[jnp.clip(sorted_tile, 0, num_tiles - 1)]
    in_tile = sorted_tile < num_tiles
    keep = in_tile & (rank < per_tile_capacity)

    dense = jnp.full((num_tiles, per_tile_capacity), -1, jnp.int32)
    # dropped entries get an out-of-bounds tile index; mode='drop' discards
    # them, so kept (tile, rank) targets are unique and order-independent
    scatter_tile = jnp.where(keep, sorted_tile, num_tiles)
    scatter_rank = jnp.where(keep, rank, 0)
    dense = dense.at[scatter_tile, scatter_rank].set(sorted_g, mode='drop')

    n_valid = jnp.minimum(total, max_pairs)
    return TileAssignment(
        tile_gauss_idx=dense,
        n_pairs=n_valid,
        pair_overflow=jnp.maximum(total - max_pairs, 0),
        tile_overflow=jnp.sum(in_tile & (rank >= per_tile_capacity)).astype(jnp.int32),
    )
