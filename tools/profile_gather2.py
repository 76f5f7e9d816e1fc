#!/usr/bin/env python
"""Paired-corner gather experiment: does a slice_sizes=(2,F) lax.gather of
M/2 indices beat the single-row gather of M indices at the hash-grid
forward shape? Also: the matching backward (half-size sort with doubled
value columns)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gsavatar.utils.jax_cache import setup_cache
setup_cache()

M = 7340032          # hash lookups: 57344 * 16 * 8
T = 1 << 20          # 16 levels * 2^16
F = 2


def bench(name, fn, *args, iters=20):
    def run():
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))
    run()
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{ms:8.2f} ms  {name}")
    return ms


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, F), jnp.float32)
    tb16 = table.astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, T, jnp.int32)
    idx2 = jax.random.randint(jax.random.PRNGKey(2), (M // 2,), 0, T - 1,
                              jnp.int32)

    @jax.jit
    def single(tb, ix):
        return tb[ix].astype(jnp.float32)

    def paired_impl(tb, ix):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))
        out = jax.lax.gather(
            tb, ix[:, None], dn, slice_sizes=(2, F),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return out.astype(jnp.float32)

    paired = jax.jit(paired_impl)

    @jax.jit
    def paired_wide(tb, ix):
        # view table as (T//2, 2F) rows; only even idx -- layout probe for
        # the best case where a "pair" is one ordinary row gather
        tbw = tb.reshape(T // 2, 2 * F)
        return tbw[ix % (T // 2)].astype(jnp.float32)

    bench('single-row gather bf16 (M=7.34M, F=2)   [current]',
          single, tb16, idx)
    bench('slice(2,F) gather bf16 (M=3.67M)        [paired]',
          paired, tb16, idx2)
    bench('row gather bf16 (T/2, 2F) (M=3.67M)     [wide-row bound]',
          paired_wide, tb16, idx2)
    bench('slice(2,F) gather f32  (M=3.67M)',
          jax.jit(paired_impl), table, idx2)

    # backward shapes: sort cost halves?
    L, Mp = 16, M // 16
    ids = jax.random.randint(jax.random.PRNGKey(3), (L, Mp), 0, 1 << 16,
                             jnp.int32)
    v2 = jax.random.normal(key, (2, L, Mp), jnp.float32)
    v4 = jax.random.normal(key, (4, L, Mp // 2), jnp.float32)
    ids_h = ids[:, ::2]

    @jax.jit
    def sort2(i, v):
        return jax.lax.sort((i, v[0], v[1]), num_keys=1, is_stable=False)

    @jax.jit
    def sort4(i, v):
        return jax.lax.sort((i, v[0], v[1], v[2], v[3]), num_keys=1,
                            is_stable=False)

    bench('batched sort L=16, Mp=459k, 2 vals      [current bwd]',
          sort2, ids, v2)
    bench('batched sort L=16, Mp=229k, 4 vals      [paired bwd]',
          sort4, ids_h, v4)


if __name__ == '__main__':
    main()
