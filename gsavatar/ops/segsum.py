"""Scatter-free segment sums for gather transposes.

XLA's TPU scatter executes ~26M updates/s regardless of flavor (add/set,
sorted/unique — measured, tools/profile_scatter2.py), while lax.sort runs
~1G elem/s and gathers ~400M rows/s. Every hot backward that XLA would
lower to a big scatter-add (hash-grid tables: 4.2M updates = 168 ms; pair
gradients: 2M x 12 = 32 ms) is therefore reformulated as

    sort by segment id -> cumsum -> searchsorted(segment ends) -> diff,

which is pure sort/gather/cumsum: ~10-20 ms for the same shapes.

Precision note: the cumsum-diff computes each segment total as a difference
of two running sums; the relative error is ~ulp(|running sum|)/|segment
total|. For gradient workloads (zero-mean values, segment sizes ~4-8) this
is ~1e-5 relative — well inside the tolerance of the gradient-parity tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum_sorted(values, seg_ids, num_segments: int):
    """values (M, C) f32, seg_ids (M,) int32 SORTED ascending (ids >=
    num_segments act as dropped). Returns (num_segments, C)."""
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
    """Unsorted variant: sorts (seg_ids, iota) first, gathers values through
    the permutation, then segment_sum_sorted."""
    M = seg_ids.shape[0]
    perm = jnp.arange(M, dtype=jnp.int32)
    sids, perm = jax.lax.sort((seg_ids, perm), num_keys=1)
    return segment_sum_sorted(values[perm], sids, num_segments)


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
