#!/usr/bin/env python
"""Micro-bench of avatar-converter stages on the real TPU: full converter,
non-rigid (hashgrid+MLP), rigid LBS, texture MLP, pose encoder, plus the
losses (ssim, lpips, aiap math)."""
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
    ap.add_argument('--cap', type=int, default=65536)
    args = ap.parse_args()

    from gsavatar.config import load_config
    from gsavatar.scene import Scene
    from gsavatar.core import gaussians as G

    cfg = load_config(overrides=[
        "dataset=synthetic", "dataset.img_hw=[540,540]",
        "dataset.n_verts=4096", f"dataset.n_points={args.n}",
        f"dataset.n_target_gaussians={args.n}",
        "dataset.train_frames=[0,4,1]",
        f"model.gaussian.capacity={args.cap}",
        "opt.skinning_pool_size=16384",
    ])
    scene = Scene(cfg, seed=0)
    state = scene.init_state()
    camera = scene.train_dataset[0]
    bucket = args.n
    sl = lambda t: jax.tree.map(lambda x: x[:bucket], t)
    params_b = sl(state.gauss_params)
    alive_b = state.gauss_aux.alive[:bucket]
    nn_ix_b = state.gauss_aux.nn_ix[:bucket]
    conv = scene.converter
    cp = state.conv_params
    key = jax.random.PRNGKey(0)

    def gview(p):
        return G.Gaussians(params=p, alive=alive_b, active_sh_degree=0,
                           max_sh_degree=scene.max_sh_degree,
                           use_sh=scene.use_sh)

    # full converter fwd
    @jax.jit
    def f_conv(cp, p):
        d, reg, col = conv.apply(cp, gview(p), camera, jnp.int32(1000),
                                 train=True, rng=key)
        return d.get_xyz.sum() + col.sum() + sum(reg.values())
    timeit('converter fwd', f_conv, cp, params_b)

    @jax.jit
    def f_conv_grad(cp, p):
        g = jax.grad(f_conv, argnums=(0, 1))(cp, p)
        return g[1].xyz.sum()
    timeit('converter fwd+bwd', f_conv_grad, cp, params_b)

    # losses on a rendered-size image
    from gsavatar.ops.ssim import ssim
    from gsavatar.ops import lpips as lpips_mod
    img = jnp.asarray(np.random.default_rng(0).random((540, 540, 3)),
                      jnp.float32)
    gt = jnp.asarray(np.random.default_rng(1).random((540, 540, 3)),
                     jnp.float32)

    @jax.jit
    def f_ssim(a, b):
        return ssim(a, b)
    timeit('ssim fwd', f_ssim, img, gt)
    timeit('ssim fwd+bwd', jax.jit(jax.grad(lambda a, b: ssim(a, b))),
           img, gt)

    if lpips_mod.available():
        crop = img[:256, :256], gt[:256, :256]

        @jax.jit
        def f_lp(a, b):
            return lpips_mod.lpips(a, b)
        timeit('lpips 256x256 fwd', f_lp, *crop)
        timeit('lpips 256x256 fwd+bwd',
               jax.jit(jax.grad(lambda a, b: lpips_mod.lpips(a, b))), *crop)

    # aiap math with cached indices
    from gsavatar import losses as L

    @jax.jit
    def f_aiap(p):
        gv = gview(p)
        lx, lc = L.full_aiap_loss(gv, gv, nn_ix=nn_ix_b)
        return lx + lc
    timeit('aiap (cached nn) fwd', f_aiap, params_b)
    timeit('aiap (cached nn) fwd+bwd',
           jax.jit(lambda p: jax.grad(f_aiap)(p).xyz.sum()), params_b)

    # knn_self at bucket (the refresh cost, off the hot path)
    from gsavatar.ops import knn
    xyz = params_b.xyz

    @jax.jit
    def f_knn(x):
        return knn.knn_self(x, 5, mask=alive_b).sum()
    timeit(f'knn_self {bucket} (refresh, off-path)', f_knn, xyz, iters=3)


if __name__ == '__main__':
    main()
