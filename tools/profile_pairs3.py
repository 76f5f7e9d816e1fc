#!/usr/bin/env python
"""Scatter-variant experiments for the pair expansion."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gsavatar.utils.jax_cache import setup_cache
setup_cache()


def timeit(label, fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:<52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    N = 32768
    GY = 34
    MAX_PAIRS = 1 << 20
    rng = np.random.default_rng(0)
    # realistic: ~25% visible with small rects
    vis = rng.random(N) < 0.3
    w = np.where(vis, rng.integers(1, 4, N), 0).astype(np.int32)
    h = np.where(vis, rng.integers(1, 4, N), 0).astype(np.int32)
    counts_np = (w * h).astype(np.int32)
    counts = jnp.asarray(counts_np)
    wj = jnp.asarray(w)
    hj = jnp.asarray(h)
    gidx = jnp.arange(N, dtype=jnp.int32)

    # v1: current — (N, GY) writes, invalid all collide at MAX_PAIRS
    @jax.jit
    def v1(counts, wj, hj):
        excl = jnp.cumsum(counts) - counts
        r_ar = jnp.arange(GY, dtype=jnp.int32)[None, :]
        run_start = excl[:, None] + r_ar * wj[:, None]
        valid = (r_ar < hj[:, None]) & (counts[:, None] > 0)
        wp = jnp.where(valid, run_start, MAX_PAIRS).reshape(-1)
        payload = ((gidx[:, None] << 6) | r_ar).reshape(-1)
        seg = jnp.full((MAX_PAIRS,), -1, jnp.int32)
        seg = seg.at[wp].max(payload, mode='drop')
        return jax.lax.associative_scan(jnp.maximum, seg)
    timeit('v1 (N,34) scatter-max, colliding sentinels', v1, counts, wj, hj)

    # v2: same but UNIQUE indices (distinct OOB positions) + .set
    @jax.jit
    def v2(counts, wj, hj):
        excl = jnp.cumsum(counts) - counts
        r_ar = jnp.arange(GY, dtype=jnp.int32)[None, :]
        run_start = excl[:, None] + r_ar * wj[:, None]
        valid = (r_ar < hj[:, None]) & (counts[:, None] > 0)
        flat_id = gidx[:, None] * GY + r_ar
        wp = jnp.where(valid, run_start, MAX_PAIRS + flat_id).reshape(-1)
        payload = ((gidx[:, None] << 6) | r_ar).reshape(-1)
        seg = jnp.full((MAX_PAIRS,), -1, jnp.int32)
        seg = seg.at[wp].set(payload, mode='drop', unique_indices=True)
        return jax.lax.associative_scan(jnp.maximum, seg)
    timeit('v2 (N,34) scatter-set, unique indices', v2, counts, wj, hj)

    # v3: two-level with unique scatters
    MAX_ROWS = 1 << 18

    @jax.jit
    def v3(counts, wj, hj):
        excl = jnp.cumsum(counts) - counts
        row_counts = hj
        row_excl = jnp.cumsum(row_counts) - row_counts
        # level 1: rows — one write per gaussian
        wp1 = jnp.where(row_counts > 0, row_excl, MAX_ROWS + gidx)
        seg1 = jnp.full((MAX_ROWS,), -1, jnp.int32)
        seg1 = seg1.at[wp1].set(gidx, mode='drop', unique_indices=True)
        gs_row = jax.lax.associative_scan(jnp.maximum, seg1)     # row -> g
        gs_row_c = jnp.clip(gs_row, 0, N - 1)
        row_slots = jnp.arange(MAX_ROWS, dtype=jnp.int32)
        r = row_slots - row_excl[gs_row_c]                        # row idx
        run_start = excl[gs_row_c] + r * wj[gs_row_c]
        # level 2: pairs — one write per row
        row_valid = gs_row >= 0
        wp2 = jnp.where(row_valid, run_start, MAX_PAIRS + row_slots)
        seg2 = jnp.full((MAX_PAIRS,), -1, jnp.int32)
        seg2 = seg2.at[wp2].set(row_slots, mode='drop',
                                unique_indices=True)
        rs_pair = jax.lax.associative_scan(jnp.maximum, seg2)    # pair -> row
        rs_c = jnp.clip(rs_pair, 0, MAX_ROWS - 1)
        slots = jnp.arange(MAX_PAIRS, dtype=jnp.int32)
        col = slots - run_start[rs_c]
        g = gs_row_c[rs_c]
        return g + col + r[rs_c]
    timeit('v3 two-level unique scatters', v3, counts, wj, hj)

    # v4: v2 but payload via .add on zeros (dense add semantics)
    @jax.jit
    def v4(counts, wj, hj):
        excl = jnp.cumsum(counts) - counts
        r_ar = jnp.arange(GY, dtype=jnp.int32)[None, :]
        run_start = excl[:, None] + r_ar * wj[:, None]
        valid = (r_ar < hj[:, None]) & (counts[:, None] > 0)
        flat_id = gidx[:, None] * GY + r_ar
        wp = jnp.where(valid, run_start, MAX_PAIRS + flat_id).reshape(-1)
        payload = (((gidx[:, None] << 6) | r_ar) + 1).reshape(-1)
        seg = jnp.zeros((MAX_PAIRS,), jnp.int32)
        seg = seg.at[wp].add(payload, mode='drop', unique_indices=True)
        return jax.lax.associative_scan(jnp.maximum, seg) - 1
    timeit('v4 (N,34) scatter-add, unique indices', v4, counts, wj, hj)


if __name__ == '__main__':
    main()
