#!/usr/bin/env python
"""Benchmark: full avatar train step (fwd+bwd+optimizers) at 540x540.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric = rendered pixels/sec/chip through the complete training iteration
(BASELINE.json north-star: "Rendered pixels/sec/chip fwd+bwd at 540x540").
The reference publishes no numbers (BASELINE.md); the anchor used for
vs_baseline is the upstream paper's ~30-minute / 15k-iteration training
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

# Persistent compilation cache: the large train-step graph dominates bench
# wall-clock on first run; cached compiles make reruns near-instant.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

BASELINE_PIX_PER_S = 15000 / (30 * 60) * 540 * 540  # ~2.43 Mpix/s


def main():
    from gsavatar.config import load_config
    from gsavatar.scene import Scene
    from gsavatar.train import make_train_step, loss_weights

    cfg = load_config(overrides=[
        "dataset=synthetic",
        "dataset.img_hw=[540,540]",
        "dataset.n_verts=4096",
        "dataset.n_points=32768",
        "dataset.n_target_gaussians=16384",
        "dataset.train_frames=[0,4,1]",
        "model.gaussian.capacity=65536",
        "rasterizer.max_pairs=1048576",
        "rasterizer.per_tile_capacity=384",
        "opt.skinning_pool_size=16384",
    ])
    scene = Scene(cfg, seed=0)
    state = scene.init_state()
    train_step = make_train_step(scene)

    camera = scene.train_dataset[0]
    weights = loss_weights(cfg, 1000)
    weights['_in_densify_window'] = 1.0
    xyz_lr = float(scene.xyz_lr_fn(1000))
    n_alive = int(np.sum(np.asarray(state.gauss_aux.alive)))
    bucket = scene.bucket_for(n_alive)

    # warmup/compile
    state, metrics = train_step(state, camera, jnp.int32(1000), weights,
                                xyz_lr, active_sh_degree=0, bucket=bucket)
    jax.block_until_ready(metrics['loss/total_loss'])

    iters = 20
    t0 = time.time()
    for i in range(iters):
        state, metrics = train_step(state, camera, jnp.int32(1000 + i),
                                    weights, xyz_lr, active_sh_degree=0,
                                    bucket=bucket)
    jax.block_until_ready(metrics['loss/total_loss'])
    dt = (time.time() - t0) / iters

    h, w = cfg.dataset.img_hw
    pix_per_s = h * w / dt
    print(json.dumps({
        "metric": "rendered_pixels_per_sec_per_chip_fwd_bwd_540x540",
        "value": round(pix_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pix_per_s / BASELINE_PIX_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
