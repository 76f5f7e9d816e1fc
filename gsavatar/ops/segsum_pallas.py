"""Blocked segment-sum — Pallas TPU kernel.

Replaces the XLA cumsum+searchsorted formulation in ops/segsum.py for the
hot gather transposes (hash-grid table gradients, pair-gradient reduction,
AIAP neighbor reductions). The XLA path costs ~300 ms/step at the bench
shape — dominated by jnp.searchsorted's binary search (23 sequential 1M-
element random gathers, ~173 ms), two multi-million-row cumsums (~90 ms)
and the permutation gathers (~90 ms). None of that work is necessary:

With seg_ids SORTED, all elements of segment s are contiguous, so the
elements contributing to a block of SEG_BLOCK consecutive output rows form
one contiguous span [starts[b], starts[b+1]) — found by a searchsorted with
only NB+1 queries (thousands, not millions). Each kernel program owns one
output block, streams its span in lane-aligned chunks (double-buffered DMA),
builds a one-hot matrix by comparing a sublane iota against the chunk's
segment ids (no gathers, no transposes — ids arrive on lanes, the block-row
index lives on sublanes), and reduces with ONE MXU matmul per chunk:

    acc(C, SB) += V(C, CHUNK) @ onehot(SB, CHUNK)^T

Per-element cost ~0.5 VPU compare-rows + ~2C MXU MACs: a few ms for the
7.34M-element hash-grid backward vs ~300 ms for the XLA formulation.
Block-local f32 matmul accumulation is also *more* precise than the
cumsum-difference trick (no running-sum cancellation — ADVICE.md r2).

Data layout: everything rides lanes, COLUMNAR end to end. Values arrive
(C, M) — the sort in segsum.segment_sum emits per-column arrays that stack
columnar for free — and the output is built (C, S_pad) then transposed back
(XLA keeps narrow arrays column-major, so that transpose is a free
bitcast). f32 holds ids exactly below 2^24; asserted.

Values in the trailing lane-chunk past each block's span are masked to
zero before the matmul: they are either neighbors (one-hot misses them
anyway) or, at the global tail, uninitialized pair-gradient rows whose
NaN/Inf bit patterns would otherwise poison the 0*NaN matmul products.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG_BLOCK = 512    # output segment rows per kernel program
CHUNK = 1024       # elements per DMA chunk (lane-aligned)


def _kernel(starts_ref, ids_hbm, vals_hbm, out_ref, ibuf, vbuf, isem, vsem,
            *, n_cols: int, seg_block: int, chunk: int):
    b = pl.program_id(0)
    s0 = starts_ref[b]
    s1 = starts_ref[b + 1]
    c0 = s0 // chunk
    n_chunks = jnp.where(s1 > s0, (s1 + chunk - 1) // chunk - c0, 0)
    base = (b * seg_block).astype(jnp.float32)

    # ids and values live in separate HBM arrays (and separate scratch
    # buffers) so the kernel never slices sublanes — Mosaic requires
    # sublane slices tile-aligned, which a packed (C+1, chunk) block's
    # value rows are not.
    def load(i, slot):
        off = pl.ds((c0 + i) * chunk, chunk)
        return (pltpu.make_async_copy(ids_hbm.at[:, off], ibuf.at[slot],
                                      isem.at[slot]),
                pltpu.make_async_copy(vals_hbm.at[:, off], vbuf.at[slot],
                                      vsem.at[slot]))

    @pl.when(n_chunks > 0)
    def _():
        for dma in load(0, 0):
            dma.start()

    # Mosaic only lowers integer iota; the compare happens in f32 (ids are
    # integer-exact f32 below 2^24)
    iota_b = jax.lax.broadcasted_iota(
        jnp.int32, (seg_block, chunk), 0).astype(jnp.float32)
    iota_e = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            for dma in load(i + 1, (i + 1) % 2):
                dma.start()

        for dma in load(i, slot):
            dma.wait()
        rel = ibuf[slot] - base               # (1, CHUNK) f32 ids - base
        # elements outside [s0, s1) that share a boundary chunk belong to
        # neighboring blocks: their ids fall outside [base, base+SB) by
        # construction (sorted ids + searchsorted spans), so the one-hot
        # misses them. Their VALUES must still be zeroed: past the global
        # valid range they can be uninitialized memory whose NaNs survive
        # multiplication by a zero one-hot.
        in_span = (c0 + i) * chunk + iota_e < s1          # (1, CHUNK)
        vals = jnp.where(in_span, vbuf[slot], 0.0)        # (C, CHUNK)
        onehot = (iota_b == rel).astype(jnp.float32)      # (SB, CHUNK)
        # manual hi/lo split: ONE bf16 MXU pass (precision DEFAULT rounds
        # the f32 operands to bf16 in-flight — exact for the one-hot and
        # for the pre-rounded hi/lo parts) instead of HIGHEST's 6. hi and
        # lo ride as extra sublane rows of the same matmul — the narrow C
        # dim wastes most of the 128-row MXU tile anyway, so doubling rows
        # is free while pass count dominates kernel time. Error ~2^-18
        # relative — well below the f32 sums being reduced. (Operands stay
        # f32: Mosaic rejects explicit-bf16 NT matmuls at some shapes.)
        vhi = vals.astype(jnp.bfloat16).astype(jnp.float32)
        vlo = vals - vhi
        both = jnp.concatenate([vhi, vlo], axis=0)        # (2C, CHUNK)
        out = jax.lax.dot_general(
            both, onehot, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)          # (2C, SB)
        return acc + out[:n_cols] + out[n_cols:]

    acc = jax.lax.fori_loop(
        0, n_chunks, body,
        jnp.zeros((n_cols, seg_block), jnp.float32))
    out_ref[:, :] = acc


@functools.partial(jax.jit,
                   static_argnames=('num_segments', 'interpret'))
def segment_sum_sorted_blocked_t(values_t, seg_ids, num_segments: int,
                                 interpret: bool = False):
    """values_t (C, M) f32 columnar, seg_ids (M,) int32 SORTED ascending.
    ids in [num_segments, 2^24) are dropped (summed into padding rows that
    are sliced away). Returns (num_segments, C) f32."""
    C, M = values_t.shape
    NB = (num_segments + SEG_BLOCK - 1) // SEG_BLOCK
    S_pad = NB * SEG_BLOCK
    assert S_pad + SEG_BLOCK < (1 << 24), "ids must stay f32-exact"
    M_pad = ((M + CHUNK - 1) // CHUNK) * CHUNK
    # scratch sublane slices must be tile-aligned (multiples of 8 rows)
    C_pad = ((C + 7) // 8) * 8

    ids_f = jnp.pad(jnp.minimum(seg_ids, S_pad).astype(jnp.float32),
                    (0, M_pad - M),
                    constant_values=float(S_pad))[None, :]    # (1, M_pad)
    vals_t = jnp.pad(values_t, ((0, C_pad - C), (0, M_pad - M)))

    bounds = jnp.arange(NB + 1, dtype=jnp.int32) * SEG_BLOCK
    starts = jnp.searchsorted(seg_ids, jnp.minimum(bounds, num_segments),
                              side='left').astype(jnp.int32)
    starts = jnp.minimum(starts, M)

    kernel = functools.partial(_kernel, n_cols=C_pad, seg_block=SEG_BLOCK,
                               chunk=CHUNK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((C_pad, SEG_BLOCK), lambda b, *_: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, CHUNK), jnp.float32),
            pltpu.VMEM((2, C_pad, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C_pad, S_pad), jnp.float32),
        interpret=interpret,
    )(starts, ids_f, vals_t)
    return out_t[:C, :num_segments].T


def segment_sum_sorted_blocked(values, seg_ids, num_segments: int,
                               interpret: bool = False):
    """Row-major (M, C) convenience wrapper."""
    return segment_sum_sorted_blocked_t(values.T, seg_ids, num_segments,
                                        interpret=interpret)
