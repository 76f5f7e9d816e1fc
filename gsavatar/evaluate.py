"""Evaluation / prediction driver.

Parity: render.py of the reference — build the Scene in eval mode, load a
checkpoint, render every test camera, accumulate PSNR/SSIM/LPIPS through the
dataset-appropriate metric bundle (Evaluator for ZJU with mask-bbox SSIM,
PSEvaluator for PeopleSnapshot — utils/general_utils.py:221-312), per-frame
render time (first frame excluded), save frames + composites-over-original
(render.py:73-79) and a results.npz (render.py:45-117). Modes: test
(test-view / test-pose) and predict (OOD sequences, no metrics) with the
same suffix logic (render.py:149-167)."""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsavatar.core import gaussians as G
from gsavatar.metrics import get_evaluator
from gsavatar.renderer import render
from gsavatar.scene import Scene, TrainState


def composite_over_original(img: np.ndarray, original: np.ndarray,
                            threshold: float = 0.0) -> np.ndarray:
    """Overlay the render on the source frame where the render is non-black
    (render.py:73-79: `mask = rendering.sum(-1) == 0` -> original)."""
    mask = img.sum(axis=-1) > threshold
    return np.where(mask[..., None], img, original)


def evaluate(cfg, scene: Scene, state: TrainState, iteration: int,
             out_dir: Optional[str] = None, save_images: bool = True,
             max_frames: Optional[int] = None, compute_metrics: bool = True,
             save_composite: bool = False):
    """Render the scene's test dataset. Returns dict of metric means."""
    out_dir = out_dir or os.path.join(
        cfg.get('exp_dir') or 'exp', f'eval_{cfg.dataset.get("test_mode", "view")}')
    if save_images:
        os.makedirs(out_dir, exist_ok=True)

    deg = scene.active_sh_degree(iteration)
    evaluator = get_evaluator(str(cfg.dataset.name)) if compute_metrics \
        else None
    alive_np = np.asarray(state.gauss_aux.alive)
    n_alive = int(alive_np.sum())
    # bucketing needs the alive-prefix invariant (densify compaction);
    # checkpoints written before compaction existed may violate it
    bucket = scene.bucket_for(n_alive) if alive_np[:n_alive].all() \
        else 0

    # canonical positions are frozen during eval: precompute the hash-grid
    # encoding once and skip the per-frame table gathers (PERF.md)
    from gsavatar.models.converter import compute_nr_cache
    gview0 = G.make_view(state.gauss_params, state.gauss_aux,
                         active_sh_degree=deg,
                         max_sh_degree=scene.max_sh_degree,
                         use_sh=scene.use_sh, bucket=bucket)
    nr_cache = compute_nr_cache(scene.converter, state.conv_params, gview0)

    @jax.jit
    def render_one(st, camera):
        gview = G.make_view(st.gauss_params, st.gauss_aux,
                            active_sh_degree=deg,
                            max_sh_degree=scene.max_sh_degree,
                            use_sh=scene.use_sh, bucket=bucket)
        pkg = render(scene.converter, st.conv_params, gview, camera,
                     iteration, scene.raster_config, scene.background,
                     nr_cache=nr_cache)
        return jnp.clip(pkg.render, 0.0, 1.0), pkg.opacity_render

    times = []
    frame_metrics: dict = {}
    n = len(scene.test_dataset)
    if max_frames:
        n = min(n, max_frames)
    for idx in range(n):
        camera = scene.test_dataset[idx]
        dev_cam = scene.device_camera(idx, 'test')
        t0 = time.time()
        img, alpha = jax.block_until_ready(render_one(state, dev_cam))
        times.append((time.time() - t0) * 1000.0)
        img_np = np.asarray(img)

        if evaluator is not None:
            gt = np.clip(np.asarray(camera.image), 0.0, 1.0)
            mask = np.asarray(camera.mask) if camera.mask is not None else None
            for k, v in evaluator(img_np, gt, valid_mask=mask).items():
                if v is not None:
                    frame_metrics.setdefault(k, []).append(v)
        if save_images:
            from PIL import Image
            arr = (img_np * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(out_dir, f"{camera.image_name}.png"))
            if save_composite and camera.image is not None:
                orig = (np.clip(np.asarray(camera.image), 0, 1)
                        * 255).astype(np.uint8)
                Image.fromarray(composite_over_original(arr, orig)).save(
                    os.path.join(out_dir,
                                 f"{camera.image_name}_composite.png"))

    results = {k: float(np.mean(v)) for k, v in frame_metrics.items() if v}
    # mean time excluding the first (compile) frame (render.py:99)
    results['time_ms'] = float(np.mean(times[1:])) if len(times) > 1 \
        else float(times[0]) if times else 0.0
    if save_images or compute_metrics:
        np.savez(os.path.join(out_dir, 'results.npz'),
                 **{f'metrics/{k}': v for k, v in results.items()})
    return results


def predict(cfg):
    """Checkpoint-driven eval entry (render.py:120-138)."""
    scene = Scene(cfg)
    it = int(cfg.opt.iterations)
    ckpt = cfg.get('load_ckpt') or os.path.join(
        cfg.get('exp_dir') or os.path.join('exp', str(cfg.name)), f'ckpt{it}')
    state, iteration = scene.load_checkpoint(ckpt)
    compute_metrics = cfg.mode != 'predict'
    return evaluate(cfg, scene, state, iteration,
                    compute_metrics=compute_metrics)


def main(argv=None):
    """CLI parity with the reference's render.py: `python -m
    gsavatar.evaluate mode=test dataset.test_mode=view ...`. Applies the
    suffix/override logic of render.py:149-175 (wandb off, no preload for
    predict sequences is handled by the loaders)."""
    import sys
    from gsavatar.config import load_config
    from gsavatar.utils.jax_cache import setup_cache
    setup_cache()
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = load_config(overrides=overrides)
    mode = cfg.get('mode', 'test')
    if mode == 'test':
        suffix = cfg.dataset.get('test_mode', 'view')
        cfg['suffix'] = f'test-{suffix}'
    elif mode == 'predict':
        seq = int(cfg.dataset.get('predict_seq', 0))
        if cfg.dataset.name == 'zjumocap':
            names = {0: 'dance0', 1: 'dance1', 2: 'flipping', 3: 'canonical'}
        else:
            names = {0: 'rotation', 1: 'dance2'}
        cfg['suffix'] = f'predict-{names.get(seq, str(seq))}'
    if cfg.dataset.get('freeview', False):
        cfg['suffix'] = str(cfg.get('suffix', '')) + '-freeview'
    cfg['exp_dir'] = cfg.get('exp_dir') or os.path.join('exp', str(cfg.name))
    results = predict(cfg)
    print(results)
    return results


if __name__ == '__main__':
    main()
