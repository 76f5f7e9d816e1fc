#!/usr/bin/env python
"""Micro-benchmark gather + sort variants at the hash-grid/pair shapes to
pick the round-3 optimization targets (PERF.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gsavatar.utils.jax_cache import setup_cache
setup_cache()

M = 7340032          # hash lookups: 57344 * 16 * 8
T = 1 << 20          # 16 levels * 2^16
F = 2
MP = 2097152         # pairs


def bench(name, fn, *args, iters=20):
    # forcing a host readback is the only reliable sync on the tunneled
    # axon platform (block_until_ready returns early there)
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
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    table = jax.random.normal(key, (T, F), jnp.float32)
    table_bf = table.astype(jnp.bfloat16)
    flat = table.reshape(-1)
    idx2 = jnp.stack([idx * 2, idx * 2 + 1], 1).reshape(-1)
    table_t = table.T
    tw = jax.random.normal(key, (T, 128), jnp.float32)
    ptab = jax.random.normal(key, (57344, 12), jnp.float32)
    pidx = jax.random.randint(key, (MP,), 0, 57344, jnp.int32)
    v0 = jax.random.normal(key, (M,), jnp.float32)
    v1 = jax.random.normal(key, (M,), jnp.float32)
    vp = [jax.random.normal(jax.random.fold_in(key, i), (MP,), jnp.float32)
          for i in range(12)]
    pidx_l = jax.random.randint(key, (16, M // 16), 0, 1 << 16, jnp.int32)
    v0_l = v0.reshape(16, -1)
    v1_l = v1.reshape(16, -1)

    bench('A0 baseline sync cost (sum of (T,2))',
          jax.jit(lambda t: t * 1.0001), table)
    bench('A1 take rows (T,2) idx 7.34M',
          jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table, idx)
    bench('A2 flat scalar idx 14.7M',
          jax.jit(lambda t, i: jnp.take(t, i)), flat, idx2)
    bench('A3 rows bf16 (T,2)',
          jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table_bf, idx)
    bench('A4 cols (2,T) take axis=1',
          jax.jit(lambda t, i: jnp.take(t, i, axis=1)), table_t, idx)
    bench('A5 wide rows (T,128) idx 7.34M [bw probe]',
          jax.jit(lambda t, i: jnp.take(t, i, axis=0)), tw, idx)
    bench('A6 pair gather (57344,12) idx 2M',
          jax.jit(lambda t, i: jnp.take(t, i, axis=0)), ptab, pidx)

    def slice2(t, i):
        # gather 2 consecutive rows per index (z-pair trick probe)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))
        return jax.lax.gather(t, i[: M // 2, None], dn, (2, F),
                              mode='clip')
    bench('A7 slice(2,2) x 3.67M idx', jax.jit(slice2), table, idx)

    print('--- sorts ---')
    bench('S1 sort 7.34M 3ops stable',
          jax.jit(lambda i, a, b: jax.lax.sort((i, a, b), num_keys=1)),
          idx, v0, v1)
    bench('S2 sort 7.34M 3ops UNstable',
          jax.jit(lambda i, a, b: jax.lax.sort((i, a, b), num_keys=1,
                                               is_stable=False)),
          idx, v0, v1)
    bench('S3 sort 7.34M 2ops unstable',
          jax.jit(lambda i, a: jax.lax.sort((i, a), num_keys=1,
                                            is_stable=False)),
          idx, jnp.arange(M, dtype=jnp.int32))
    bench('S4 per-level (16,458k) 3ops unstable',
          jax.jit(lambda i, a, b: jax.lax.sort((i, a, b), num_keys=1,
                                               is_stable=False)),
          pidx_l, v0_l, v1_l)
    bench('S5 pair sort 2M 13ops stable',
          jax.jit(lambda i, *v: jax.lax.sort((i, *v), num_keys=1)),
          pidx, *vp)
    bench('S6 pair sort 2M 2ops unstable',
          jax.jit(lambda i, a: jax.lax.sort((i, a), num_keys=1,
                                            is_stable=False)),
          pidx, jnp.arange(MP, dtype=jnp.int32))
    bench('S7 build sort 3.67M 2ops unstable',
          jax.jit(lambda i, a: jax.lax.sort((i, a), num_keys=1,
                                            is_stable=False)),
          jnp.concatenate([pidx, pidx]),
          jnp.arange(2 * MP, dtype=jnp.int32))


if __name__ == '__main__':
    main()
