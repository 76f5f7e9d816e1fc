#!/usr/bin/env python
"""Benchmark: full avatar train step (fwd+bwd+optimizers) at the reference
workload shape — 50k initial gaussians (dataset/zjumocap.py:412), 540x540
(ps_female_3), cycling frames — plus an inference-render FPS measurement
(paper claims ~50 FPS real-time rendering).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric = rendered pixels/sec/chip through the complete training
iteration (BASELINE.json north-star: "Rendered pixels/sec/chip fwd+bwd at
540x540"). The reference publishes no numbers (BASELINE.md); the anchor used
for vs_baseline is the upstream paper's ~30-minute / 15k-iteration training
claim on one consumer GPU -> ~8.3 it/s * 540^2 px ~= 2.43 Mpix/s fwd+bwd.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from gsavatar.utils.jax_cache import setup_cache
setup_cache()

BASELINE_PIX_PER_S = 15000 / (30 * 60) * 540 * 540  # ~2.43 Mpix/s
EVAL_FPS_TARGET = 50.0                              # paper's realtime claim


def main():
    from gsavatar.config import load_config
    from gsavatar.core import gaussians as G
    from gsavatar.renderer import render
    from gsavatar.scene import Scene
    from gsavatar.train import make_train_step, loss_weights

    cfg = load_config(overrides=[
        "dataset=synthetic",
        "dataset.img_hw=[540,540]",
        "dataset.n_verts=4096",
        "dataset.n_points=50000",          # reference initial point count
        "dataset.n_target_gaussians=50000",
        "dataset.train_frames=[0,4,1]",
        "model.gaussian.capacity=131072",
        "rasterizer.max_pairs=2097152",
        "opt.skinning_pool_size=16384",
    ])
    scene = Scene(cfg, seed=0)
    state = scene.init_state()
    train_step = make_train_step(scene)

    cameras = [scene.device_camera(i, 'train')
               for i in range(len(scene.train_dataset))]
    weights = loss_weights(cfg, 1000)
    weights['_in_densify_window'] = 1.0
    xyz_lr = float(scene.xyz_lr_fn(1000))
    n_alive = int(np.sum(np.asarray(state.gauss_aux.alive)))
    bucket = scene.bucket_for(n_alive)

    # warmup/compile
    state, metrics = train_step(state, cameras[0], jnp.int32(1000), weights,
                                xyz_lr, active_sh_degree=0, bucket=bucket)
    jax.block_until_ready(metrics['loss/total_loss'])
    overflow = (int(metrics['overflow/pairs']) + int(metrics['overflow/tile'])
                + int(metrics['overflow/rect']))

    iters = 20
    t0 = time.time()
    for i in range(iters):
        state, metrics = train_step(state, cameras[i % len(cameras)],
                                    jnp.int32(1000 + i), weights, xyz_lr,
                                    active_sh_degree=0, bucket=bucket)
    jax.block_until_ready(metrics['loss/total_loss'])
    dt = (time.time() - t0) / iters

    # ---- inference-render FPS (eval path, no grads) ----------------------
    @jax.jit
    def render_one(st, camera):
        gview = G.make_view(st.gauss_params, st.gauss_aux,
                            active_sh_degree=0,
                            max_sh_degree=scene.max_sh_degree,
                            use_sh=scene.use_sh, bucket=bucket)
        pkg = render(scene.converter, st.conv_params, gview, camera,
                     jnp.int32(10 ** 9), scene.raster_config,
                     scene.background)
        return pkg.render

    jax.block_until_ready(render_one(state, cameras[0]))
    t0 = time.time()
    for i in range(20):
        out = render_one(state, cameras[i % len(cameras)])
    jax.block_until_ready(out)
    eval_fps = 20 / (time.time() - t0)

    h, w = cfg.dataset.img_hw
    pix_per_s = h * w / dt
    print(json.dumps({
        "metric": "rendered_pixels_per_sec_per_chip_fwd_bwd_540x540",
        "value": round(pix_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pix_per_s / BASELINE_PIX_PER_S, 3),
        "train_ms_per_iter": round(dt * 1000, 1),
        "n_gaussians": n_alive,
        "bucket": bucket,
        "overflow": overflow,
        "eval_render_fps": round(eval_fps, 1),
        "eval_fps_vs_paper_50fps": round(eval_fps / EVAL_FPS_TARGET, 3),
    }))


if __name__ == "__main__":
    main()
