#!/usr/bin/env python
"""Micro-bench of rasterizer stages on the real TPU: project, pair build,
sort, gather, compositor kernels — fwd and fwd+bwd."""
import argparse
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
    print(f"{label:<44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=32768)
    ap.add_argument('--hw', type=int, default=540)
    ap.add_argument('--pairs', type=int, default=1048576)
    args = ap.parse_args()

    from gsavatar.camera.camera import make_camera
    from gsavatar.ops.rasterizer import RasterizeConfig, rasterize
    from gsavatar.ops.rasterizer import project as proj_mod
    from gsavatar.ops.rasterizer import pairs as pairs_mod
    from gsavatar.ops.rasterizer import pallas_composite as pc
    from gsavatar.utils.transforms import covariance_from_scaling_rotation

    H = W = args.hw
    N = args.n
    rng = np.random.default_rng(0)
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
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(width=W, height=H, max_pairs=args.pairs,
                          per_tile_capacity=384, chunk=64, backend='pallas')

    # stage: project
    @jax.jit
    def f_proj(m, c):
        p = proj_mod.project(m, c, vm, pm, cam.tanfovx, cam.tanfovy, W, H)
        return p.means2d.sum() + p.conics.sum() + p.depths.sum()
    timeit('project fwd', f_proj, means, cov)

    @jax.jit
    def f_proj_grad(m, c):
        return jax.grad(lambda a, b: f_proj(a, b))(m, c)[0].sum()
    timeit('project fwd+bwd', f_proj_grad, means, cov)

    proj = jax.jit(lambda m, c: proj_mod.project(
        m, c, vm, pm, cam.tanfovx, cam.tanfovy, W, H))(means, cov)
    n_pairs = int(jnp.sum(proj.tiles_touched))
    print(f"  (real pairs: {n_pairs})", flush=True)

    # stage: build_pairs fwd
    @jax.jit
    def f_pairs(m, c, col, op):
        p = proj_mod.project(m, c, vm, pm, cam.tanfovx, cam.tanfovy, W, H)
        pa = pairs_mod.build_pairs(p, col, op, cfg.grid_x, cfg.grid_y,
                                   cfg.max_pairs)
        return pa.pair_data.sum()
    timeit('project+build_pairs fwd', f_pairs, means, cov, colors, opac)

    @jax.jit
    def f_pairs_grad(m, c, col, op):
        return jax.grad(f_pairs, argnums=(0, 2))(m, c, col, op)[0].sum()
    timeit('project+build_pairs fwd+bwd', f_pairs_grad, means, cov, colors,
           opac)

    # sort alone at max_pairs
    key = jnp.asarray(rng.integers(0, 2 ** 30, args.pairs), jnp.int32)
    val = jnp.asarray(rng.integers(0, N, args.pairs), jnp.int32)

    @jax.jit
    def f_sort(k, v):
        sk, sv = jax.lax.sort((k, v), num_keys=1)
        return sk[-1] + sv[-1]
    timeit(f'lax.sort {args.pairs} (key,val)', f_sort, key, val)

    # scatter_pair_grads alone
    pg = jnp.asarray(rng.random((args.pairs, 12)), jnp.float32)

    @jax.jit
    def f_scatter(g, ix):
        return pairs_mod.scatter_pair_grads(g, ix, N).sum()
    timeit(f'scatter_pair_grads {args.pairs}x12', f_scatter, pg, val)

    # gather (pair_data build) alone
    src = jnp.asarray(rng.random((N, 12)), jnp.float32)

    @jax.jit
    def f_gather(s_, ix):
        return s_[ix].sum()
    timeit(f'gather {args.pairs}x12', f_gather, src, val)

    # full rasterize fwd / fwd+bwd, both backends
    for backend in ('pallas', 'xla'):
        c2 = cfg.replace(backend=backend)

        def make_loss(c2):
            def loss(m, col, op, c):
                res = rasterize(m, col, op, c, viewmatrix=vm,
                                full_projmatrix=pm, tanfovx=cam.tanfovx,
                                tanfovy=cam.tanfovy, background=bg,
                                config=c2)
                return res.image.sum() + res.alpha.sum()
            return loss
        loss = make_loss(c2)
        timeit(f'rasterize[{backend}] fwd', jax.jit(loss), means, colors,
               opac, cov)
        timeit(f'rasterize[{backend}] fwd+bwd',
               jax.jit(lambda m, col, op, c: jax.grad(loss, argnums=(0, 1, 2, 3))(
                   m, col, op, c)[0].sum()), means, colors, opac, cov)


if __name__ == '__main__':
    main()
