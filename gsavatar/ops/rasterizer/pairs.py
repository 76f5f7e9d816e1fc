"""Pair-array machinery for the fused (Pallas) compositor path.

Differences from tiling.py's dense (tile, K) matrix:
  * single packed uint32 sort key — (tile_id << DEPTH_BITS) | quantized
    depth — halves sort traffic vs the lexicographic 2-key sort (the CUDA
    kernel packs (tileID | depth) into 64 bits the same way; 20-bit depth
    quantization over the view frustum only perturbs ordering of splats
    closer than ~1e-4 of the depth range, which is visually and numerically
    immaterial);
  * no per-tile capacity: compositing consumes contiguous [start, end)
    ranges per tile, exactly like the reference CUDA kernel's ranges array;
  * per-pair gaussian data gathered once into a contiguous (P, C) matrix the
    kernel can stream with plain DMAs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .project import Projection

DEPTH_BITS = 20
DEPTH_LEVELS = (1 << DEPTH_BITS) - 1

# pair_data column layout
PAIR_COLS = 12  # [m2dx, m2dy, con_a, con_b, con_c, r, g, b, opac, 0, 0, 0]


class PairArrays(NamedTuple):
    pair_data: jnp.ndarray   # (P, PAIR_COLS) f32
    pair_gauss: jnp.ndarray  # (P,) int32 source gaussian per pair
    tile_start: jnp.ndarray  # (num_tiles + 1,) int32 range offsets
    n_pairs: jnp.ndarray     # () int32
    pair_overflow: jnp.ndarray  # () int32


ROW_BITS = 6  # rect row index within a splat; grid_y <= 64 (height <= 1024)


def expand_pairs(proj: Projection, grid_x: int, grid_y: int, max_pairs: int):
    """Expand per-gaussian tile rects into a flat pair arena WITHOUT any
    integer division (a 1M-wide div/mod by a traced vector costs ~150 ms on
    TPU — tools/profile_pairs.py). One run is written per (gaussian,
    rect-row): the run start is excl[g] + r*w[g], the payload packs
    (g << ROW_BITS | r); a log-depth cummax fills the runs, after which the
    tile id is pure shifts/multiplies:
        col  = slot - (excl[g] + r*w[g])
        tile = (y0[g] + r) * grid_x + x0[g] + col
    Returns (g_safe, tile_id, valid, total); tile_id = num_tiles for dead
    slots."""
    assert grid_y <= (1 << ROW_BITS), grid_y
    num_tiles = grid_x * grid_y
    counts = proj.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(counts)
    total = offsets[-1]
    excl = offsets - counts
    n_gauss = counts.shape[0]

    w = proj.rect_max[:, 0] - proj.rect_min[:, 0]
    h = proj.rect_max[:, 1] - proj.rect_min[:, 1]
    gidx = jnp.arange(n_gauss, dtype=jnp.int32)

    r_ar = jnp.arange(grid_y, dtype=jnp.int32)[None, :]        # (1, H)
    run_start = excl[:, None] + r_ar * w[:, None]              # (N, H)
    valid_run = (r_ar < h[:, None]) & (counts[:, None] > 0)
    write_pos = jnp.where(valid_run, run_start, max_pairs).reshape(-1)
    payload = ((gidx[:, None] << ROW_BITS) | r_ar).reshape(-1)
    seg = jnp.full((max_pairs,), -1, jnp.int32)
    seg = seg.at[write_pos].max(payload, mode='drop')
    packed = jax.lax.associative_scan(jnp.maximum, seg)

    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = (slots < jnp.minimum(total, max_pairs)) & (packed >= 0)
    g = packed >> ROW_BITS
    r = packed & ((1 << ROW_BITS) - 1)
    g_safe = jnp.clip(g, 0, n_gauss - 1)
    col = slots - (excl[g_safe] + r * w[g_safe])
    tile_id = (proj.rect_min[g_safe, 1] + r) * grid_x \
        + proj.rect_min[g_safe, 0] + col
    tile_id = jnp.where(valid, tile_id, num_tiles)
    return g_safe, tile_id, valid, total


def build_pairs(proj: Projection, colors, opacities, grid_x: int, grid_y: int,
                max_pairs: int, znear: float = 0.2,
                zfar: float = 100.0) -> PairArrays:
    num_tiles = grid_x * grid_y
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    g_safe, tile_id, valid, total = expand_pairs(proj, grid_x, grid_y,
                                                 max_pairs)
    n_gauss_i = proj.tiles_touched.shape[0]

    depth = proj.depths[g_safe]
    dq = jnp.clip(((depth - znear) / (zfar - znear) * DEPTH_LEVELS)
                  .astype(jnp.int32), 0, DEPTH_LEVELS)
    key = (tile_id << DEPTH_BITS) | jnp.where(valid, dq, DEPTH_LEVELS)

    n_gauss = n_gauss_i
    g_payload = jnp.where(valid, g_safe, n_gauss)  # sentinel for dead pairs
    sorted_key, sorted_g = jax.lax.sort((key, g_payload), num_keys=1)
    sorted_tile = sorted_key >> DEPTH_BITS

    # per-tile range starts without a second sort: scatter-min each pair's
    # slot index into its tile bin, then a reversed cummin assigns empty
    # tiles the start of the next non-empty one (== searchsorted 'left')
    first = jnp.full((num_tiles + 1,), max_pairs, jnp.int32)
    first = first.at[sorted_tile].min(slots, mode='drop')
    tile_start = jax.lax.associative_scan(jnp.minimum, first, reverse=True)

    # one fused gather of everything the compositor needs; dead pairs
    # (sentinel index) read row 0 but sit in the sentinel tile's range,
    # which no kernel program touches
    gathered = jnp.concatenate([
        proj.means2d, proj.conics, colors, opacities.reshape(-1, 1),
        jnp.zeros((colors.shape[0], PAIR_COLS - 9), colors.dtype)], axis=1)
    pair_data = gathered[jnp.minimum(sorted_g, n_gauss - 1)]

    return PairArrays(pair_data=pair_data, pair_gauss=sorted_g,
                      tile_start=tile_start,
                      n_pairs=jnp.minimum(total, max_pairs),
                      pair_overflow=jnp.maximum(total - max_pairs, 0))


def scatter_pair_grads(pair_grads, pair_gauss, n_gaussians: int):
    """Reduce per-pair gradient rows onto gaussians. pair_grads (P, C).
    Uses a segment-sum scatter-add; pairs for one gaussian were contiguous
    before sorting, but after the (tile,depth) sort they are scattered —
    XLA's scatter-add handles the reduction; swap in a sort-based variant if
    profiling shows it on the critical path."""
    out = jnp.zeros((n_gaussians, pair_grads.shape[1]), pair_grads.dtype)
    return out.at[pair_gauss].add(pair_grads, mode='drop')
