#!/usr/bin/env python
"""Ablation profiler for the train step: times the full step and then
re-times it with individual components stubbed out, to attribute the
per-iteration wall-clock. Run on the real TPU.

Usage: python tools/profile_step.py [--n 16384] [--cap 65536]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def build(n_target, capacity, max_pairs):
    from gsavatar.config import load_config
    from gsavatar.scene import Scene
    cfg = load_config(overrides=[
        "dataset=synthetic",
        "dataset.img_hw=[540,540]",
        "dataset.n_verts=4096",
        f"dataset.n_points={n_target}",
        f"dataset.n_target_gaussians={n_target}",
        "dataset.train_frames=[0,4,1]",
        f"model.gaussian.capacity={capacity}",
        f"rasterizer.max_pairs={max_pairs}",
        "rasterizer.per_tile_capacity=384",
        "opt.skinning_pool_size=16384",
    ])
    scene = Scene(cfg, seed=0)
    state = scene.init_state()
    return cfg, scene, state


def time_step(scene, state, label, iters=10, bucket=0):
    from gsavatar.train import make_train_step, loss_weights
    train_step = make_train_step(scene)
    camera = scene.device_camera(0, 'train')
    weights = loss_weights(scene.cfg, 1000)
    weights['_in_densify_window'] = 1.0
    xyz_lr = float(scene.xyz_lr_fn(1000))
    s = jax.tree.map(jnp.copy, state)  # train_step donates its input
    t_c0 = time.time()
    s, metrics = train_step(s, camera, jnp.int32(1000), weights, xyz_lr,
                            active_sh_degree=0, bucket=bucket)
    jax.block_until_ready(metrics['loss/total_loss'])
    compile_t = time.time() - t_c0
    t0 = time.time()
    for i in range(iters):
        s, metrics = train_step(s, camera, jnp.int32(1000 + i), weights,
                                xyz_lr, active_sh_degree=0, bucket=bucket)
    jax.block_until_ready(metrics['loss/total_loss'])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:<40s} {dt:8.1f} ms/it   (compile {compile_t:.0f}s)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=16384)
    ap.add_argument('--cap', type=int, default=65536)
    ap.add_argument('--pairs', type=int, default=1048576)
    ap.add_argument('--iters', type=int, default=10)
    args = ap.parse_args()

    import gsavatar.losses as L
    import gsavatar.ops.knn as knn_mod
    from gsavatar.ops.rasterizer import api as rast_api

    cfg, scene, state = build(args.n, args.cap, args.pairs)
    it = args.iters
    import numpy as np
    n_alive = int(np.sum(np.asarray(state.gauss_aux.alive)))
    bucket = scene.bucket_for(n_alive)
    print(f"n_alive={n_alive} bucket={bucket} capacity={scene.capacity}",
          flush=True)

    base_full = time_step(scene, state, "full step (capacity)", it, bucket=0)
    base = time_step(scene, state, f"full step (bucket={bucket})", it,
                     bucket=bucket)

    # --- ablate AIAP/KNN ---
    orig_aiap = L.full_aiap_loss
    L.full_aiap_loss = lambda gc, go, n_neighbors=5, nn_ix=None: (
        jnp.float32(0.), jnp.float32(0.))
    no_aiap = time_step(scene, state, "no AIAP (knn+aiap)", it, bucket=bucket)
    L.full_aiap_loss = orig_aiap

    # --- ablate only the knn inside aiap (keep the aiap math) ---
    orig_knn = knn_mod.knn_self
    knn_mod.knn_self = lambda x, k, chunk=1024, mask=None: jnp.zeros(
        (x.shape[0], k), jnp.int32)
    no_knn = time_step(scene, state, "no knn (aiap on idx0)", it, bucket=bucket)
    knn_mod.knn_self = orig_knn

    # --- ablate rasterize: return dummy image (keeps converter+losses) ---
    orig_rast = rast_api.rasterize
    def fake_rast(means3d, colors, opacities, cov3d, *, viewmatrix,
                  full_projmatrix, tanfovx, tanfovy, background, config,
                  active=None, means2d_offset=None):
        h, w = config.height, config.width
        img = jnp.ones((h, w, 3)) * (jnp.mean(means3d) + jnp.mean(colors)
                                     + jnp.mean(opacities) + jnp.mean(cov3d)
                                     + jnp.mean(means2d_offset))
        return rast_api.RasterizeResult(
            image=img, alpha=img[..., 0],
            radii=jnp.ones(means3d.shape[0], jnp.int32),
            n_pairs=jnp.int32(0), pair_overflow=jnp.int32(0),
            tile_overflow=jnp.int32(0))
    rast_api.rasterize = fake_rast
    import gsavatar.renderer as renderer_mod
    orig_r2 = renderer_mod.rasterize
    renderer_mod.rasterize = fake_rast
    no_rast = time_step(scene, state, "no rasterize (converter+losses)", it, bucket=bucket)
    rast_api.rasterize = orig_rast
    renderer_mod.rasterize = orig_r2

    # --- ablate converter: identity deform ---
    import gsavatar.renderer as R
    orig_render = R.render
    def fake_render(converter, conv_params, gaussians, camera, iteration,
                    raster_config, background, *, train=False, rng=None,
                    scaling_modifier=1.0, means2d_offset=None,
                    override_color=None):
        deformed = gaussians
        # touch conv_params so grads exist
        leaves = jax.tree.leaves(conv_params)
        bias = sum(jnp.sum(l) for l in leaves) * 0.0
        colors = jnp.ones((gaussians.get_xyz.shape[0], 3)) * 0.5 + bias
        cov3d = deformed.get_covariance(scaling_modifier)
        opacity = deformed.get_opacity
        if means2d_offset is None:
            means2d_offset = jnp.zeros_like(deformed.get_xyz[:, :2])
        res = rast_api.rasterize(
            deformed.get_xyz, colors, opacity, cov3d,
            viewmatrix=camera.world_view_transform,
            full_projmatrix=camera.full_proj_transform,
            tanfovx=camera.tanfovx, tanfovy=camera.tanfovy,
            background=background, config=raster_config,
            active=deformed.alive, means2d_offset=means2d_offset)
        return R.RenderPackage(
            render=res.image, opacity_render=res.alpha,
            viewspace_grad_hook=means2d_offset,
            visibility_filter=res.radii > 0, radii=res.radii,
            loss_reg={}, deformed_gaussians=deformed, colors=colors,
            pair_overflow=res.pair_overflow, tile_overflow=res.tile_overflow)
    import gsavatar.train as train_mod
    orig_render_t = train_mod.render
    train_mod.render = fake_render
    no_conv = time_step(scene, state, "no converter (raster+losses)", it, bucket=bucket)
    train_mod.render = orig_render_t

    print("\n--- attribution (ms) ---")
    print(f"full step:            {base:8.1f}")
    print(f"aiap total:           {base - no_aiap:8.1f}")
    print(f"  of which knn:       {base - no_knn:8.1f}")
    print(f"rasterize fwd+bwd:    {base - no_rast:8.1f}")
    print(f"converter fwd+bwd:    {base - no_conv:8.1f}")


if __name__ == '__main__':
    main()
