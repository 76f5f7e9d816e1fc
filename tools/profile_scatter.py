#!/usr/bin/env python
"""Scatter-add strategies for the hashgrid-table backward (4.2M updates into
(2^20, 2)) and the pair-grad transpose (2M x 12 into (32k, 12))."""
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
    print(f"{label:<56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # ---- hashgrid shape: 16 levels x 32768 pts x 8 corners -> 2^16 rows --
    L, N, C, T = 16, 32768, 8, 1 << 16
    idx = jnp.asarray(rng.integers(0, T, (L, N * C)), jnp.int32)
    val = jnp.asarray(rng.random((L, N * C, 2)), jnp.float32)

    @jax.jit
    def h0(idx, val):
        out = jnp.zeros((L, T, 2), jnp.float32)
        return out.at[jnp.arange(L)[:, None], idx].add(val)
    timeit('hash v0 .at[].add (L,NC)->(L,T,2)', h0, idx, val)

    @jax.jit
    def h0f(idx, val):
        flat = idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
        out = jnp.zeros((L * T, 2), jnp.float32)
        return out.at[flat.reshape(-1)].add(val.reshape(-1, 2))
    timeit('hash v0f flat .at[].add 4.2M->(2^20,2)', h0f, idx, val)

    @jax.jit
    def h1(idx, val):
        flat = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
        v = val.reshape(-1, 2)
        si, sv0, sv1 = jax.lax.sort((flat, v[:, 0], v[:, 1]), num_keys=1)
        out = jnp.zeros((L * T, 2), jnp.float32)
        sv = jnp.stack([sv0, sv1], 1)
        return out.at[si].add(sv, indices_are_sorted=True)
    timeit('hash v1 sort + sorted scatter-add', h1, idx, val)

    @jax.jit
    def h2(idx, val):
        # sort + segment boundaries + prefix-sum diff (pure gather/cumsum)
        flat = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
        v = val.reshape(-1, 2)
        si, sv0, sv1 = jax.lax.sort((flat, v[:, 0], v[:, 1]), num_keys=1)
        c0 = jnp.cumsum(sv0)
        c1 = jnp.cumsum(sv1)
        # last position of each segment: si[i] != si[i+1]
        M = si.shape[0]
        last = jnp.concatenate([si[:-1] != si[1:],
                                jnp.ones((1,), bool)])
        # segment sum at row si[i] = c[i_last] - c[prev_last]
        seg_end_c0 = jnp.where(last, c0, 0.0)
        seg_end_c1 = jnp.where(last, c1, 0.0)
        out0 = jnp.zeros((L * T,), jnp.float32).at[si].max(
            jnp.where(last, c0, -jnp.inf), mode='drop')
        # simpler: scatter the per-segment totals via set (unique: one last
        # per segment)
        row = jnp.where(last, si, L * T)
        tot0 = jnp.zeros((L * T + 1,), jnp.float32).at[row].set(
            seg_end_c0, mode='drop', unique_indices=True)
        tot1 = jnp.zeros((L * T + 1,), jnp.float32).at[row].set(
            seg_end_c1, mode='drop', unique_indices=True)
        # subtract prefix before segment: scatter c at PREVIOUS segment's
        # last into current row start... (approximate cost model: one more
        # unique scatter + gather)
        return tot0[:-1] + tot1[:-1]
    timeit('hash v2 sort + cumsum-diff unique scatters', h2, idx, val)

    # ---- pair grads: 2M x 12 -> (32k, 12) --------------------------------
    P, NG = 1 << 21, 32768
    pg = jnp.asarray(rng.random((P, 12)), jnp.float32)
    gid = jnp.asarray(np.sort(rng.integers(0, NG, P)), jnp.int32)  # ~sorted
    gid_r = jnp.asarray(rng.integers(0, NG, P), jnp.int32)

    @jax.jit
    def p0(pg, gid):
        return jnp.zeros((NG, 12), jnp.float32).at[gid].add(pg)
    timeit('pair v0 .at[].add random gid', p0, pg, gid_r)
    timeit('pair v0 .at[].add sorted gid (flagless)', p0, pg, gid)

    @jax.jit
    def p1(pg, gid):
        return jnp.zeros((NG, 12), jnp.float32).at[gid].add(
            pg, indices_are_sorted=True)
    timeit('pair v1 .at[].add indices_are_sorted', p1, pg, gid)

    # window-transpose: inverse perm gather + dense reshape reduce
    R2 = 64
    pos = jnp.asarray(rng.permutation(NG * R2)[:P] if NG * R2 >= P
                      else np.arange(P) % (NG * R2), jnp.int32)

    @jax.jit
    def p2(pg, pos):
        slots = jnp.arange(P, dtype=jnp.int32)
        inv = jnp.zeros((NG * R2,), jnp.int32).at[pos].set(
            slots, mode='drop', unique_indices=True)
        w = pg[inv]                          # (NG*R2, 12)
        return w.reshape(NG, R2, 12).sum(axis=1)
    timeit('pair v2 unique-inv scatter + gather + reduce', p2, pg, pos)


if __name__ == '__main__':
    main()
