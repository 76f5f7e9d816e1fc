"""Scatter-free segment sums for gather transposes.

XLA's TPU scatter executes ~26M updates/s regardless of flavor (add/set,
sorted/unique — measured, tools/profile_scatter2.py), while lax.sort runs
~1G elem/s. Every hot backward that XLA would lower to a big scatter-add
(hash-grid tables: 7.3M updates; pair gradients: 2M x 12) is therefore
reformulated as

    sort by segment id (values ride the sort as extra operands)
    -> blocked one-hot-matmul segment sum (ops/segsum_pallas.py on TPU).

The TPU path costs ~2-5 ms for the 7.3M-element hash-grid backward; the
portable XLA fallback (cumsum -> searchsorted -> diff) runs anywhere but
pays ~10-100x more at multi-million scale (searchsorted's binary search is
log2(M) sequential rounds of num_segments random gathers).

Precision: the Pallas path accumulates each 512-row block with exact f32
MXU sums — no running-sum cancellation. The XLA fallback computes segment
totals as differences of an f32 running cumsum; relative error
~ulp(|running sum|)/|segment total| (~1e-5 at gradient scales, grows
~sqrt(M) — tested at realistic scale in tests/test_segsum.py)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _backend() -> str:
    """'pallas' | 'pallas_interpret' | 'xla'. Auto: the fused kernel on
    TPU-like platforms, XLA elsewhere. Override: GSAVATAR_SEGSUM=..."""
    forced = os.environ.get('GSAVATAR_SEGSUM')
    if forced:
        return forced
    return ('pallas' if jax.default_backend() in ('tpu', 'axon') else 'xla')


def segment_sum_sorted(values, seg_ids, num_segments: int):
    """values (M, C) f32, seg_ids (M,) int32 SORTED ascending (ids >=
    num_segments act as dropped). Returns (num_segments, C)."""
    backend = _backend()
    if backend.startswith('pallas'):
        from gsavatar.ops.segsum_pallas import segment_sum_sorted_blocked_t
        return segment_sum_sorted_blocked_t(
            values.T, seg_ids, num_segments,
            interpret=backend.endswith('interpret'))
    # rows with dropped ids may carry garbage (uninitialized pair-gradient
    # tails); zero them so they cannot poison the running cumsum
    values = jnp.where((seg_ids < num_segments)[:, None], values, 0.0)
    c = jnp.cumsum(values, axis=0)                      # (M, C)
    # end[t] = number of elements with id <= t  (index of segment end + 1)
    end = jnp.searchsorted(seg_ids,
                           jnp.arange(num_segments, dtype=seg_ids.dtype),
                           side='right')
    cpad = jnp.concatenate([jnp.zeros((1,) + c.shape[1:], c.dtype), c],
                           axis=0)                      # prefix with 0
    tot_incl = cpad[end]                                # (S, C) cumsum at end
    start = jnp.concatenate([jnp.zeros((1,), end.dtype), end[:-1]])
    # empty leading segments: start == end -> zero automatically
    return tot_incl - cpad[start]


def segment_sum(values, seg_ids, num_segments: int):
    """Unsorted variant. The value columns ride the sort as extra operands
    (one fused multi-operand lax.sort) instead of a sort-permutation
    followed by a multi-million-row gather — the gather costs more than the
    wider sort at every hot shape (55 ms vs ~10 ms at 2M x 12).

    Everything stays COLUMNAR around the sort: values.T is one relayout
    pass and its row slices are contiguous, whereas slicing columns out of
    the row-major (M, C) array re-reads the whole lane-padded (M, 128)
    buffer once per column (measured 10x ~4 ms/step at the 2M pair
    shape)."""
    vals_t = values.T                                   # (C, M)
    cols = [vals_t[i] for i in range(vals_t.shape[0])]
    # unstable: order within a segment is irrelevant for summation, and
    # stability would ride an extra iota operand through the sort
    out = jax.lax.sort((seg_ids, *cols), num_keys=1, is_stable=False)
    sids = out[0]
    backend = _backend()
    if backend.startswith('pallas'):
        from gsavatar.ops.segsum_pallas import segment_sum_sorted_blocked_t
        return segment_sum_sorted_blocked_t(
            jnp.stack(out[1:], axis=0), sids, num_segments,
            interpret=backend.endswith('interpret'))
    return segment_sum_sorted(jnp.stack(out[1:], axis=1), sids,
                              num_segments)


def segment_sum_leveled(values, seg_ids_local, level_size: int):
    """Batched per-level variant for the hash-grid backward: values
    (L, Mp, C), seg_ids_local (L, Mp) int32 in [0, level_size). Returns
    (L * level_size, C) — the transpose of L independent gathers from a
    (L * level_size, C) table.

    Sorting each level independently (one batched unstable lax.sort over
    the last axis) is cheaper than one global sort of L*Mp elements: the
    comparator runs log2(Mp) instead of log2(L*Mp) rounds, and the
    level-major concatenation of per-level-sorted ids (+ level offsets) is
    globally sorted, so the blocked kernel consumes it unchanged."""
    L, Mp, C = values.shape
    backend = _backend()
    # u16 ids hold values < 2^16: the default log2_hashmap_size=16 fits
    # exactly (ids <= 65535); a config raising it past 16 would silently
    # wrap and corrupt hash-grid gradients, so gate like pairs.py's u16
    # guard and fall through to the int32 path (ADVICE r4)
    if backend.startswith('pallas') and C == 2 and level_size <= (1 << 16):
        # TPU fast path: the hash-table cotangent pair rides the sort as ONE
        # u32 operand of two packed bf16 lanes and the ids as u16 — 6 B/elem
        # of sort traffic instead of 12. Precision: tinycudann runs this
        # entire encoding (tables, features AND gradient accumulation) in
        # fp16 (network_utils.py:329), so half-precision cotangents are
        # parity-faithful; the blocked kernel still sums the bf16 inputs
        # with exact f32 MXU accumulation (no running-sum cancellation).
        packed = jax.lax.bitcast_convert_type(
            values.astype(jnp.bfloat16), jnp.uint32)        # (L, Mp)
        ids16 = seg_ids_local.astype(jnp.uint16)
        out = jax.lax.sort((ids16, packed), num_keys=1, is_stable=False)
        offs = (jnp.arange(L, dtype=jnp.int32) * level_size)[:, None]
        ids_flat = (out[0].astype(jnp.int32) + offs).reshape(-1)
        # unpack WITHOUT a relayout: a bf16 is the high 16 bits of its f32,
        # so each column is one elementwise shift+bitcast over the sorted
        # u32 buffer — contiguous (1, L*Mp) rows for the kernel, no
        # (M, 2) -> (2, M) transpose pass
        bits = out[1]
        col0 = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
        col1 = jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32)
        vals_t = jnp.stack([col0.reshape(-1), col1.reshape(-1)], axis=0)
        from gsavatar.ops.segsum_pallas import segment_sum_sorted_blocked_t
        return segment_sum_sorted_blocked_t(
            vals_t, ids_flat, L * level_size,
            interpret=backend.endswith('interpret'))
    vt = values.transpose(2, 0, 1)      # one relayout pass, contiguous rows
    cols = [vt[i] for i in range(C)]
    out = jax.lax.sort((seg_ids_local, *cols), num_keys=1, is_stable=False)
    offs = (jnp.arange(L, dtype=jnp.int32) * level_size)[:, None]
    ids_flat = (out[0] + offs).reshape(-1)
    if backend.startswith('pallas'):
        from gsavatar.ops.segsum_pallas import segment_sum_sorted_blocked_t
        vals_t = jnp.stack([c.reshape(-1) for c in out[1:]], axis=0)
        return segment_sum_sorted_blocked_t(
            vals_t, ids_flat, L * level_size,
            interpret=backend.endswith('interpret'))
    vals = jnp.stack([c.reshape(-1) for c in out[1:]], axis=1)
    return segment_sum_sorted(vals, ids_flat, L * level_size)


def make_gather_with_fast_transpose():
    """gather(src (S, C), idx (M,)) -> (M, C) whose VJP reduces cotangents
    with the sort-based segment sum instead of XLA's scatter-add. Out-of-
    range idx (>= S) read row 0 forward (clipped) and are DROPPED in the
    backward."""

    @jax.custom_vjp
    def gather(src, idx):
        return src[jnp.minimum(idx, src.shape[0] - 1)]

    def fwd(src, idx):
        return gather(src, idx), (idx, src.shape[0])

    def bwd(res, ct):
        idx, S = res
        d_src = segment_sum(ct, idx, S)
        return d_src, None

    gather.defvjp(fwd, bwd)
    return gather


gather_rows = make_gather_with_fast_transpose()
