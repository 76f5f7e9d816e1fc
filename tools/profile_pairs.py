#!/usr/bin/env python
"""Stage-by-stage timing of pairs.build_pairs internals on the TPU."""
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
    print(f"{label:<48s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    N = 32768
    MAX_PAIRS = 1 << 20
    grid_x = grid_y = 34
    num_tiles = grid_x * grid_y
    rng = np.random.default_rng(0)

    counts = jnp.asarray(rng.integers(0, 9, N), jnp.int32)
    rect_min = jnp.asarray(
        np.stack([rng.integers(0, 30, N), rng.integers(0, 30, N)], 1),
        jnp.int32)
    wh = jnp.asarray(np.stack([rng.integers(1, 4, N),
                               rng.integers(1, 4, N)], 1), jnp.int32)
    depths = jnp.asarray(rng.random(N) * 5 + 1, jnp.float32)

    # stage 1: run expansion (scatter-max + cummax)
    @jax.jit
    def s1(counts):
        offsets = jnp.cumsum(counts)
        excl = offsets - counts
        gidx = jnp.arange(N, dtype=jnp.int32)
        write_pos = jnp.where(counts > 0, excl, MAX_PAIRS)
        seg = jnp.full((MAX_PAIRS,), -1, jnp.int32)
        seg = seg.at[write_pos].max(gidx, mode='drop')
        g = jax.lax.associative_scan(jnp.maximum, seg)
        return g
    timeit('s1 run expansion (scatter + cummax 1M)', s1, counts)

    # stage 1a: just the scatter
    @jax.jit
    def s1a(counts):
        offsets = jnp.cumsum(counts)
        excl = offsets - counts
        gidx = jnp.arange(N, dtype=jnp.int32)
        write_pos = jnp.where(counts > 0, excl, MAX_PAIRS)
        seg = jnp.full((MAX_PAIRS,), -1, jnp.int32)
        return seg.at[write_pos].max(gidx, mode='drop')
    timeit('s1a scatter-max only', s1a, counts)

    # stage 1b: just the cummax over 1M
    seg0 = jax.block_until_ready(s1a(counts))

    @jax.jit
    def s1b(seg):
        return jax.lax.associative_scan(jnp.maximum, seg)
    timeit('s1b associative_scan max 1M', s1b, seg0)

    g0 = jax.block_until_ready(s1b(seg0))

    # stage 2: tile id via integer div/mod by traced vector
    @jax.jit
    def s2(g, counts):
        offsets = jnp.cumsum(counts)
        excl = offsets - counts
        slots = jnp.arange(MAX_PAIRS, dtype=jnp.int32)
        gs = jnp.clip(g, 0, N - 1)
        local = slots - excl[gs]
        x0 = rect_min[gs, 0]
        y0 = rect_min[gs, 1]
        wg = jnp.maximum(wh[gs, 0], 1)
        tile = (y0 + local // wg) * grid_x + (x0 + local % wg)
        return tile
    timeit('s2 tile ids (gathers + int div/mod 1M)', s2, g0, counts)

    # stage 2b: same with float-reciprocal division
    @jax.jit
    def s2b(g, counts):
        offsets = jnp.cumsum(counts)
        excl = offsets - counts
        slots = jnp.arange(MAX_PAIRS, dtype=jnp.int32)
        gs = jnp.clip(g, 0, N - 1)
        local = slots - excl[gs]
        x0 = rect_min[gs, 0]
        y0 = rect_min[gs, 1]
        wg = jnp.maximum(wh[gs, 0], 1)
        lf = local.astype(jnp.float32)
        q = jnp.floor(lf / wg.astype(jnp.float32)).astype(jnp.int32)
        # one fixup step for boundary rounding
        q = jnp.where(q * wg > local, q - 1, q)
        q = jnp.where((q + 1) * wg <= local, q + 1, q)
        r = local - q * wg
        tile = (y0 + q) * grid_x + (x0 + r)
        return tile
    timeit('s2b tile ids (float-recip div)', s2b, g0, counts)

    tile0 = jax.block_until_ready(s2(g0, counts))

    # stage 3: key pack + sort
    @jax.jit
    def s3(tile, g):
        dq = jnp.clip((depths[jnp.clip(g, 0, N - 1)] * 1000).astype(jnp.int32),
                      0, (1 << 20) - 1)
        key = (tile << 20) | dq
        sk, sg = jax.lax.sort((key, g), num_keys=1)
        return sk, sg
    timeit('s3 key pack + sort 1M', s3, tile0, g0)

    sk, sg = jax.block_until_ready(s3(tile0, g0))

    # stage 4: tile_start scatter-min + reverse cummin
    @jax.jit
    def s4(sk):
        st = sk >> 20
        slots = jnp.arange(MAX_PAIRS, dtype=jnp.int32)
        first = jnp.full((num_tiles + 1,), MAX_PAIRS, jnp.int32)
        first = first.at[st].min(slots, mode='drop')
        return jax.lax.associative_scan(jnp.minimum, first, reverse=True)
    timeit('s4 tile_start (scatter-min 1M -> 1k)', s4, sk)

    # stage 5: fused data gather (1M x 12 from N x 12)
    src = jnp.asarray(rng.random((N, 12)), jnp.float32)

    @jax.jit
    def s5(sg, src):
        return src[jnp.clip(sg, 0, N - 1)]
    timeit('s5 pair_data gather 1Mx12', s5, sg, src)

    # stage 6: pad to 128 lanes
    pd = jax.block_until_ready(s5(sg, src))

    @jax.jit
    def s6(pd):
        return jnp.pad(pd, ((0, 64), (0, 116)))
    timeit('s6 pad (1M,12)->(1M,128)', s6, pd)


if __name__ == '__main__':
    main()
