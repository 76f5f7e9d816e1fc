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
LIVE_COLS = 9   # leading columns that carry real data (the rest are
                # structural zero lanes; pallas_composite.PAIR_LANES padding
                # and the backward lane extraction both key off this)


class PairArrays(NamedTuple):
    pair_data: jnp.ndarray   # (P + pad_rows, lanes) f32 (zero-padded)
    pair_gauss: jnp.ndarray  # (P,) int32 source gaussian per pair
    tile_start: jnp.ndarray  # (num_tiles + 1,) int32 range offsets
    n_pairs: jnp.ndarray     # () int32
    pair_overflow: jnp.ndarray  # () int32 pairs dropped (arena full)
    rect_dropped: jnp.ndarray   # () int32 tiles dropped by the max_rect clamp


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


def _pair_gather(gathered, sorted_g, *, pad_rows: int, lanes: int):
    """pair_data = gathered[sorted_g], zero-padded to (P + pad_rows, lanes)
    for the fused compositor's DMA layout, with a fast-transpose VJP.

    Layout discipline (the whole game at P=2M): a row-major f32 (P, 12)
    array is physically lane-padded to (P, 128) on TPU — 1 GB — so every
    extra pass over it costs ~3 ms. Forward therefore gathers straight
    from a pre-padded (N+1, lanes) source into the final padded buffer
    (no separate 1 GB pad pass). Backward extracts the 12 live gradient
    lanes of the compositor's raw padded cotangent buffer with ONE MXU
    matmul (12,128) @ (128,P) -> (12,P) row-major — column slices of that
    are free bitcasts — instead of a transpose copy whose {0,1} layout
    made each of the 12 sort-operand extractions re-read the whole
    buffer (~13 ms/step measured). The selector matmul also zero-masks
    the dead lanes, so uninitialized garbage there never rides the sort.
    Rows past the last tile range belong to sentinel gaussians
    (id == n_gauss): they sort to the tail and the blocked kernel both
    drops their ids and zero-masks values past the valid span, so their
    NaN bit patterns never reach real gradients."""

    import functools as _ft

    @_ft.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def f(src, sg, pr, ln):
        src_pad = jnp.zeros((src.shape[0] + 1, ln), src.dtype)
        src_pad = jax.lax.dynamic_update_slice(src_pad, src, (0, 0))
        sg_ext = jnp.concatenate(
            [sg, jnp.full((pr,), src.shape[0], sg.dtype)])
        return src_pad[jnp.minimum(sg_ext, src.shape[0])]

    def fwd(src, sg, pr, ln):
        return f(src, sg, pr, ln), (sg, src.shape[0])

    def bwd(pr, ln, res, ct):
        sg, n_gauss = res
        max_p = sg.shape[0]
        # MXU lane extraction of the LIVE columns only (LIVE_COLS of
        # PAIR_COLS — trailing cols are structural zeros whose gradients are
        # discarded): (LIVE, lanes) selector @ (lanes, P) -> row-major
        # (LIVE, P). Precision pinned HIGHEST: the 0/1 selector side is
        # bf16-exact, so the extraction stays an exact f32 copy instead of
        # rounding every pair gradient to bf16 under DEFAULT (the matmul is
        # tiny — 9xlanes — so the extra MXU passes cost nothing next to the
        # 1 GB cotangent read).
        live = LIVE_COLS
        sel = jnp.eye(live, ct.shape[1], dtype=ct.dtype)
        ct_t = jax.lax.dot_general(
            sel, ct[:max_p],
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        cols = [ct_t[i] for i in range(live)]
        out = jax.lax.sort((sg, *cols), num_keys=1, is_stable=False)
        from gsavatar.ops.segsum import _backend
        backend = _backend()
        if backend.startswith('pallas'):
            from gsavatar.ops.segsum_pallas import \
                segment_sum_sorted_blocked_t
            d = segment_sum_sorted_blocked_t(
                jnp.stack(out[1:], axis=0), out[0], n_gauss,
                interpret=backend.endswith('interpret'))
        else:
            from gsavatar.ops.segsum import segment_sum_sorted
            d = segment_sum_sorted(jnp.stack(out[1:], axis=1), out[0],
                                   n_gauss)
        # widen back to the full src column count (zeros for the structural
        # lanes past LIVE_COLS)
        return jnp.pad(d, ((0, 0), (0, PAIR_COLS - live))), None

    f.defvjp(fwd, bwd)
    return f(gathered, sorted_g, pad_rows, lanes)


def build_pairs(proj: Projection, colors, opacities, grid_x: int, grid_y: int,
                max_pairs: int, znear: float = 0.2, zfar: float = 100.0,
                max_rect: int = 8, pad_rows: int = 0,
                lanes: int = PAIR_COLS) -> PairArrays:
    """Dense rect-window pair building: instead of expanding a flat pair
    arena (a 1M-update scatter costs ~50 ms — tools/profile_pairs*.py), every
    gaussian owns a static (max_rect x max_rect) window of candidate tiles;
    keys are built by pure broadcasting (no gathers, no division, no
    scatter), dead slots get a sentinel key that sorts to the end, and ONE
    (key, gaussian) sort both orders and compacts. Per-tile ranges fall out
    of a binary search over the sorted tile prefix. Splats overlapping more
    than max_rect tiles per axis have their rect clamped — CENTERED on the
    full rect (less biased than anchoring a corner) — with the dropped tiles
    counted separately in rect_dropped; the overflow alarm in train.py makes
    both counters loud."""
    num_tiles = grid_x * grid_y
    # packed (tile << DEPTH_BITS) keys go negative once the tile id needs
    # more than 31 - DEPTH_BITS bits, silently corrupting the sort order
    assert num_tiles < (1 << (31 - DEPTH_BITS)), (
        f"tile grid {grid_x}x{grid_y} overflows the packed int32 sort key; "
        f"max {(1 << (31 - DEPTH_BITS)) - 1} tiles at DEPTH_BITS={DEPTH_BITS}")
    n_gauss = proj.tiles_touched.shape[0]
    w = proj.rect_max[:, 0] - proj.rect_min[:, 0]
    h = proj.rect_max[:, 1] - proj.rect_min[:, 1]
    vis = proj.tiles_touched > 0
    wc = jnp.minimum(w, max_rect)
    hc = jnp.minimum(h, max_rect)
    # center the clamped window on the rect (stays inside the rect, which
    # project() already clipped to the grid)
    x0 = proj.rect_min[:, 0] + (w - wc) // 2
    y0 = proj.rect_min[:, 1] + (h - hc) // 2
    rect_dropped = jnp.sum(jnp.where(vis, w * h - wc * hc, 0))

    r = jnp.arange(max_rect, dtype=jnp.int32)[None, :, None]   # (1, R, 1)
    c = jnp.arange(max_rect, dtype=jnp.int32)[None, None, :]   # (1, 1, R)
    tile = ((y0[:, None, None] + r) * grid_x
            + x0[:, None, None] + c)                            # (N, R, R)
    valid = (vis[:, None, None] & (r < hc[:, None, None])
             & (c < wc[:, None, None]))
    dq = jnp.clip(((proj.depths - znear) / (zfar - znear) * DEPTH_LEVELS)
                  .astype(jnp.int32), 0, DEPTH_LEVELS)
    sentinel = (num_tiles << DEPTH_BITS) | DEPTH_LEVELS
    key = jnp.where(valid, (tile << DEPTH_BITS) | dq[:, None, None],
                    sentinel).reshape(-1)
    # u16 payload when the arena fits (sentinel n_gauss included): 6 B/slot
    # of candidate-sort traffic instead of 8 — this sort runs over the FULL
    # N*R^2 candidate grid, the widest array in the pipeline
    gdtype = jnp.uint16 if n_gauss < (1 << 16) else jnp.int32
    gidx = jnp.arange(n_gauss, dtype=gdtype)
    gid = jnp.where(valid, gidx[:, None, None],
                    jnp.asarray(n_gauss, gdtype)).reshape(-1)

    # unstable: order within identical (tile, quantized-depth) keys is
    # arbitrary anyway (the stability iota would be a third sort operand)
    sorted_key, sorted_g = jax.lax.sort((key, gid), num_keys=1,
                                        is_stable=False)
    sorted_g = sorted_g.astype(jnp.int32)
    sorted_key = sorted_key[:max_pairs]
    sorted_g = sorted_g[:max_pairs]
    sorted_tile = sorted_key >> DEPTH_BITS

    # per-tile [start, end) ranges: binary search over the sorted tiles
    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side='left').astype(jnp.int32)

    # one fused gather of everything the compositor needs; sentinel pairs
    # read the appended all-zero pad row and sit past the last tile range,
    # which no program touches. The custom VJP (_pair_gather) reduces pair
    # gradients onto
    # gaussians via index-presort + permuting gather + blocked segment sum.
    gathered = jnp.concatenate([
        proj.means2d, proj.conics, colors, opacities.reshape(-1, 1),
        jnp.zeros((colors.shape[0], PAIR_COLS - LIVE_COLS), colors.dtype)],
        axis=1)
    pair_data = _pair_gather(gathered, sorted_g, pad_rows=pad_rows,
                             lanes=lanes)

    total = jnp.sum(jnp.where(vis, wc * hc, 0))
    return PairArrays(pair_data=pair_data, pair_gauss=sorted_g,
                      tile_start=tile_start,
                      n_pairs=jnp.minimum(total, max_pairs),
                      pair_overflow=jnp.maximum(total - max_pairs, 0),
                      rect_dropped=rect_dropped)
