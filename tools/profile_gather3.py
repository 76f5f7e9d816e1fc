#!/usr/bin/env python
"""Hash-grid forward gather variants, round 3b: can per-level gathers from
small (256KB, VMEM-stageable) sources or packed 1-D gathers beat the one
big (2^20, F) row gather?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gsavatar.utils.jax_cache import setup_cache
setup_cache()

L = 16
T = 1 << 16
F = 2
N8 = 458752          # 57344 * 8 corners per level
M = L * N8


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
    table = jax.random.normal(key, (L, T, F), jnp.float32)
    tb16 = table.astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (L, N8), 0, T, jnp.int32)

    @jax.jit
    def big(tb, ix):
        offs = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
        flat = (ix + offs).reshape(-1)
        return tb.reshape(L * T, F)[flat].astype(jnp.float32)

    @jax.jit
    def per_level(tb, ix):
        outs = [tb[l][ix[l]] for l in range(L)]
        return jnp.stack(outs).astype(jnp.float32)

    @jax.jit
    def batched_tal(tb, ix):
        # take_along_axis with a batch dim -> XLA batched gather
        return jnp.take_along_axis(
            tb, ix[:, :, None], axis=1).astype(jnp.float32)

    @jax.jit
    def packed_1d(tb, ix):
        # pack F=2 bf16 into one int32 per row; 1-D gather; bitcast back
        tbi = jax.lax.bitcast_convert_type(
            tb.reshape(L * T, F), jnp.int32).reshape(L * T)
        offs = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
        flat = (ix + offs).reshape(-1)
        g = tbi[flat]
        return jax.lax.bitcast_convert_type(
            g[:, None], jnp.bfloat16).reshape(-1, F).astype(jnp.float32)

    @jax.jit
    def packed_1d_per_level(tb, ix):
        tbi = jax.lax.bitcast_convert_type(tb, jnp.int32)  # (L, T)
        outs = [tbi[l][ix[l]] for l in range(L)]
        g = jnp.stack(outs)
        return jax.lax.bitcast_convert_type(
            g[:, :, None], jnp.bfloat16).astype(jnp.float32)

    bench('one big row gather bf16 (L*T rows)      [current]', big, tb16, idx)
    bench('16 per-level row gathers bf16 (256KB src)', per_level, tb16, idx)
    bench('batched take_along_axis bf16 (L,T,F)', batched_tal, tb16, idx)
    bench('packed int32 1-D gather (L*T,)', packed_1d, tb16, idx)
    bench('packed int32 1-D per-level gathers', packed_1d_per_level,
          tb16, idx)


if __name__ == '__main__':
    main()
