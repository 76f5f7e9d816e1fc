#!/usr/bin/env python
"""Incremental timing of the REAL build_pairs on the real projection data:
each jitted function runs the pipeline one stage further; deltas attribute
the cost."""
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
    H = W = 540
    MAX_PAIRS = 1 << 20
    rng = np.random.default_rng(0)

    from gsavatar.camera.camera import make_camera
    from gsavatar.ops.rasterizer import project as proj_mod
    from gsavatar.ops.rasterizer import pairs as pairs_mod
    from gsavatar.utils.transforms import covariance_from_scaling_rotation

    means = jnp.asarray(rng.uniform(-0.6, 0.6, (N, 3)), jnp.float32)
    colors = jnp.asarray(rng.random((N, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.9, (N, 1)), jnp.float32)
    s = jnp.asarray(0.01 * (0.5 + rng.random((N, 3))), jnp.float32)
    q = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    cov = covariance_from_scaling_rotation(s, 1.0, q)
    cam = make_camera(R=np.eye(3), T=np.array([0., 0., 3.]), fovx=0.8,
                      fovy=0.8, image=np.zeros((H, W, 3), np.float32),
                      mask=np.zeros((H, W), np.float32),
                      rots=np.zeros((1, 24, 9)), Jtrs=np.zeros((1, 24, 3)),
                      bone_transforms=np.tile(np.eye(4), (24, 1, 1)))
    vm = jnp.asarray(cam.world_view_transform)
    pm = jnp.asarray(cam.full_proj_transform)
    grid_x = grid_y = (W + 15) // 16
    num_tiles = grid_x * grid_y

    def get_proj(m, c):
        return proj_mod.project(m, c, vm, pm, cam.tanfovx, cam.tanfovy, W, H)

    proj = jax.jit(get_proj)(means, cov)
    proj = jax.block_until_ready(proj)

    # a) expansion only
    @jax.jit
    def a(proj):
        g_safe, tile_id, valid, total = pairs_mod.expand_pairs(
            proj, grid_x, grid_y, MAX_PAIRS)
        return g_safe.sum() + tile_id.sum()
    timeit('a expand_pairs', a, proj)

    # b) + key + sort
    @jax.jit
    def b(proj):
        g_safe, tile_id, valid, total = pairs_mod.expand_pairs(
            proj, grid_x, grid_y, MAX_PAIRS)
        depth = proj.depths[g_safe]
        dq = jnp.clip(((depth - 0.2) / 99.8 * pairs_mod.DEPTH_LEVELS)
                      .astype(jnp.int32), 0, pairs_mod.DEPTH_LEVELS)
        key = (tile_id << pairs_mod.DEPTH_BITS) \
            | jnp.where(valid, dq, pairs_mod.DEPTH_LEVELS)
        g_payload = jnp.where(valid, g_safe, N)
        sk, sg = jax.lax.sort((key, g_payload), num_keys=1)
        return sk[-1] + sg[-1]
    timeit('b + key+sort', b, proj)

    # c) + tile_start
    @jax.jit
    def c(proj):
        g_safe, tile_id, valid, total = pairs_mod.expand_pairs(
            proj, grid_x, grid_y, MAX_PAIRS)
        depth = proj.depths[g_safe]
        dq = jnp.clip(((depth - 0.2) / 99.8 * pairs_mod.DEPTH_LEVELS)
                      .astype(jnp.int32), 0, pairs_mod.DEPTH_LEVELS)
        key = (tile_id << pairs_mod.DEPTH_BITS) \
            | jnp.where(valid, dq, pairs_mod.DEPTH_LEVELS)
        g_payload = jnp.where(valid, g_safe, N)
        sk, sg = jax.lax.sort((key, g_payload), num_keys=1)
        st = sk >> pairs_mod.DEPTH_BITS
        slots = jnp.arange(MAX_PAIRS, dtype=jnp.int32)
        first = jnp.full((num_tiles + 1,), MAX_PAIRS, jnp.int32)
        first = first.at[st].min(slots, mode='drop')
        ts = jax.lax.associative_scan(jnp.minimum, first, reverse=True)
        return ts.sum() + sg[-1]
    timeit('c + tile_start', c, proj)

    # d) full build_pairs
    @jax.jit
    def d(proj, col, op):
        pa = pairs_mod.build_pairs(proj, col, op, grid_x, grid_y, MAX_PAIRS)
        return pa.pair_data[-1, 0] + pa.tile_start.sum()
    timeit('d full build_pairs', d, proj, colors, opac)

    # e) full at max_pairs = 2^18
    @jax.jit
    def e(proj, col, op):
        pa = pairs_mod.build_pairs(proj, col, op, grid_x, grid_y, 1 << 18)
        return pa.pair_data[-1, 0] + pa.tile_start.sum()
    timeit('e full build_pairs @ 2^18', e, proj, colors, opac)


if __name__ == '__main__':
    main()
