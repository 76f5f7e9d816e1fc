#!/usr/bin/env python
"""Measure the perceptual-loss delta between the reference's exact
foreground-bbox crop (train.py:129-136, dynamic shape) and our static
centroid-centered window (losses.foreground_crop) on synthetic frames —
VERDICT r2 weak #6. Runs on CPU; result documented in COMPONENTS.md."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from gsavatar.config import load_config
    from gsavatar.scene import Scene
    from gsavatar import losses as L
    from gsavatar.ops import lpips as lpips_mod
    from gsavatar.renderer import render
    from gsavatar.core import gaussians as G

    cfg = load_config(overrides=[
        "dataset=synthetic", "dataset.img_hw=[256,256]",
        "dataset.n_verts=512", "dataset.n_points=2048",
        "dataset.n_target_gaussians=2048",
        "dataset.train_frames=[0,3,1]", "dataset.train_views=['0']",
        "model.gaussian.capacity=2048", "rasterizer.max_pairs=262144",
        "rasterizer.per_tile_capacity=512", "rasterizer.chunk=32",
        "opt.skinning_pool_size=2048",
    ])
    scene = Scene(cfg, seed=0)
    state = scene.init_state()
    crop_hw = (128, 128)  # ~ the 256/540 scaling of the default 256 window

    rows = []
    for idx in range(len(scene.train_dataset)):
        cam = scene.train_dataset[idx]
        gview = G.make_view(state.gauss_params, state.gauss_aux,
                            active_sh_degree=0,
                            max_sh_degree=scene.max_sh_degree,
                            use_sh=scene.use_sh)
        pkg = render(scene.converter, state.conv_params, gview, cam,
                     jnp.int32(1000), scene.raster_config, scene.background)
        img = jnp.clip(pkg.render, 0, 1)
        gt = jnp.asarray(cam.image)
        mask = np.asarray(cam.mask)

        # ours: static centroid window
        fr, fg = L.foreground_crop(img, gt, jnp.asarray(mask), crop_hw)
        lp_window = float(lpips_mod.lpips(fr, fg))

        # reference: exact foreground bbox (dynamic shape, host side)
        ys, xs = np.where(mask > 0)
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        lp_exact = float(lpips_mod.lpips(img[y0:y1, x0:x1],
                                         gt[y0:y1, x0:x1]))
        rows.append((idx, lp_window, lp_exact,
                     (y1 - y0, x1 - x0)))
        print(f"frame {idx}: window({crop_hw[0]}x{crop_hw[1]})="
              f"{lp_window:.5f}  exact-bbox({y1-y0}x{x1-x0})="
              f"{lp_exact:.5f}  ratio={lp_window/max(lp_exact,1e-9):.3f}")

    w = np.array([r[1] for r in rows])
    e = np.array([r[2] for r in rows])
    print(f"mean window={w.mean():.5f} exact={e.mean():.5f} "
          f"mean ratio={np.mean(w/np.maximum(e,1e-9)):.3f} "
          f"corr={np.corrcoef(w, e)[0,1]:.4f}")


if __name__ == "__main__":
    main()
