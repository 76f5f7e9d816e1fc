#!/usr/bin/env python
"""Scatter-add strategies, with CHAINED iterations (the axon runtime
memoizes identical executions, so unchained timing loops measure nothing)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gsavatar.utils.jax_cache import setup_cache
setup_cache()


_RT = None


def _fetch(x):
    """Force real completion: pull a scalar VALUE to host (axon's
    block_until_ready does not wait for computation)."""
    return float(jnp.asarray(x).ravel()[0])


def timeit_chained(label, fn, carry, *args, iters=20):
    """fn(carry, *args) -> new carry. Chains the carry so every execution is
    distinct; a final value fetch forces completion; the measured fetch
    round-trip is subtracted."""
    global _RT
    carry = fn(carry, *args)
    _fetch(carry)
    if _RT is None:
        t0 = time.time()
        for _ in range(3):
            _fetch(carry)
        _RT = (time.time() - t0) / 3
    t0 = time.time()
    for _ in range(iters):
        carry = fn(carry, *args)
    _fetch(carry)
    dt = (time.time() - t0 - _RT) / iters * 1000
    print(f"{label:<56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    L, N, C, T = 16, 32768, 8, 1 << 16
    idx = jnp.asarray(rng.integers(0, T, (L, N * C)), jnp.int32)
    val = jnp.asarray(rng.random((L, N * C, 2)), jnp.float32)
    carry0 = jnp.zeros((L * T, 2), jnp.float32)

    @jax.jit
    def h0(carry, idx, val):
        flat = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
        v = val.reshape(-1, 2) + carry[0, 0]
        out = jnp.zeros((L * T, 2), jnp.float32)
        return out.at[flat].add(v) * 0.5 + carry * 0.5
    timeit_chained('hash v0 flat .at[].add 4.2M->(2^20,2)', h0, carry0,
                   idx, val)

    @jax.jit
    def h1(carry, idx, val):
        flat = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
        v = val.reshape(-1, 2) + carry[0, 0]
        si, sv0, sv1 = jax.lax.sort((flat, v[:, 0], v[:, 1]), num_keys=1)
        out = jnp.zeros((L * T, 2), jnp.float32)
        sv = jnp.stack([sv0, sv1], 1)
        return out.at[si].add(sv, indices_are_sorted=True) * 0.5 + carry * 0.5
    timeit_chained('hash v1 sort + sorted scatter-add', h1, carry0, idx, val)

    @jax.jit
    def h2(carry, idx, val):
        # sort, cumsum, segment totals via cumsum-diff, ONE unique scatter
        flat = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
        v = val.reshape(-1, 2) + carry[0, 0]
        si, sv0, sv1 = jax.lax.sort((flat, v[:, 0], v[:, 1]), num_keys=1)
        c = jnp.cumsum(jnp.stack([sv0, sv1], 1), axis=0)     # (M, 2)
        M = si.shape[0]
        last = jnp.concatenate([si[:-1] != si[1:], jnp.ones((1,), bool)])
        # exclusive total before this segment = c at previous segment's last
        run_end_prefix = jnp.where(last[:, None], c, 0.0)
        prev = jax.lax.associative_scan(
            jnp.maximum, jnp.where(last[:, None], c, -jnp.inf),
            axis=0)  # inclusive max fill of segment-end cumsums
        prev = jnp.concatenate([jnp.zeros((1, 2)), prev[:-1]], axis=0)
        prev = jnp.where(jnp.isfinite(prev), prev, 0.0)
        seg_total = c - prev
        row = jnp.where(last, si, L * T)
        out = jnp.zeros((L * T + 1, 2), jnp.float32)
        out = out.at[row].set(jnp.where(last[:, None], seg_total, 0.0),
                              mode='drop', unique_indices=True)
        return out[:-1] * 0.5 + carry * 0.5
    timeit_chained('hash v2 sort+cumsum-diff+unique set', h2, carry0,
                   idx, val)

    # pair grads
    P, NG = 1 << 21, 32768
    pg = jnp.asarray(rng.random((P, 12)), jnp.float32)
    gid_r = jnp.asarray(rng.integers(0, NG, P), jnp.int32)
    carryp = jnp.zeros((NG, 12), jnp.float32)

    @jax.jit
    def p0(carry, pg, gid):
        v = pg + carry[0, 0]
        return jnp.zeros((NG, 12), jnp.float32).at[gid].add(v) * 0.5 \
            + carry * 0.5
    timeit_chained('pair v0 .at[].add random gid 2Mx12', p0, carryp, pg,
                   gid_r)

    R2 = 64
    pos = jnp.asarray(rng.permutation(NG * R2), jnp.int32)[:P]

    @jax.jit
    def p2(carry, pg, pos):
        v = pg + carry[0, 0]
        slots = jnp.arange(P, dtype=jnp.int32)
        inv = jnp.full((NG * R2,), P, jnp.int32).at[pos].set(
            slots, mode='drop', unique_indices=True)
        vpad = jnp.concatenate([v, jnp.zeros((1, 12))], axis=0)
        w = vpad[jnp.minimum(inv, P)]
        return w.reshape(NG, R2, 12).sum(axis=1) * 0.5 + carry * 0.5
    timeit_chained('pair v2 unique-inv + gather + reduce', p2, carryp, pg,
                   pos)

    # re-validate sort and gather with chaining
    key = jnp.asarray(rng.integers(0, 2 ** 30, P), jnp.int32)
    carry_s = jnp.zeros((P,), jnp.int32)

    @jax.jit
    def s0(carry, key):
        k = key ^ carry[0]
        sk, sv = jax.lax.sort((k, k), num_keys=1)
        return sk
    timeit_chained('sort 2M (key,val) chained', s0, carry_s, key)

    src = jnp.asarray(rng.random((NG, 12)), jnp.float32)
    carry_g = jnp.zeros((P, 12), jnp.float32)

    @jax.jit
    def g0(carry, src, gid):
        return src[gid] * 0.5 + carry * 0.5
    timeit_chained('gather 2Mx12 chained', g0, carry_g, src, gid_r)


if __name__ == '__main__':
    main()
