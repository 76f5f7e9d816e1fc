#!/usr/bin/env python
"""OOD motion-driven animation of a trained checkpoint (VERDICT r5 #6).

Parity target: the reference's flagship fork feature — driving a trained
avatar with an out-of-distribution motion sequence
(/root/reference/render.py:149-167 predict sequences,
/root/reference/1_render_series_recorded.py:39-68 MotionSeries playback).

Here: load the views4 15k checkpoint, synthesize an AIST++-style motion
npz whose pose track is OUTSIDE the training distribution (amplitudes
0.35-0.6 rad vs the train rig's 0.05-0.25, independent phases/freqs),
route it through motion/series.MotionSeries -> per-frame (rots, Jtrs,
bone_transforms) -> the predict-mode camera semantics (dummy GT,
in_frame_dict=0 so pose correction skips, latent fallback to the LAST
train frame — reference non_rigid.py:68-77) -> render on the chip with
fixed and orbiting freeview cameras. Writes frames + results.npz.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/run_predict_ood.py \
           --ckpt RUNS/r05_views4_15k/ckpt15000 --out RUNS/r05_predict_ood
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gsavatar.utils.jax_cache import setup_cache
setup_cache()

import jax
import jax.numpy as jnp


def synth_ood_motion(n_frames=32, seed=99):
    """AIST++-style npz arrays: pose (F,72), shape (F,10), global_t (F,3).
    Deliberately outside the training pose track (data/synthetic.py:82-91
    uses amp 0.05-0.25, freq 0.5-1.5, seed+1): bigger swings, faster
    frequencies, independent phases — a true OOD sequence."""
    rng = np.random.default_rng(seed)
    amp = rng.uniform(0.35, 0.6, size=(23, 3))
    phase = rng.uniform(0, 2 * np.pi, size=(23, 3))
    freq = rng.uniform(1.5, 3.0, size=(23, 3))
    poses = []
    for f in range(n_frames):
        t = f / max(n_frames, 1) * 2 * np.pi
        body = amp * np.sin(freq * t + phase)
        poses.append(np.concatenate([np.zeros(3), body.reshape(-1)]))
    return {
        'pose': np.asarray(poses, np.float32),
        'shape': np.zeros((n_frames, 10), np.float32),
        'global_t': np.zeros((n_frames, 3), np.float32),
        'focal_l': np.float32(1000.0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', default='RUNS/r05_views4_15k/ckpt15000')
    ap.add_argument('--out', default='RUNS/r05_predict_ood')
    ap.add_argument('--frames', type=int, default=32)
    ap.add_argument('--hw', type=int, default=540)
    args = ap.parse_args()

    from gsavatar.config import load_config
    from gsavatar.scene import Scene
    from gsavatar.core import gaussians as G
    from gsavatar.motion.series import MotionSeries
    from gsavatar.renderer import render as render_fn
    from gsavatar.models.converter import compute_nr_cache
    from gsavatar.camera.camera import make_camera

    # the training run's config (RUNS/r05_views4_15k launch command)
    cfg = load_config(overrides=[
        "dataset=synthetic", f"dataset.img_hw=[{args.hw},{args.hw}]",
        "dataset.n_points=50000", "dataset.n_target_gaussians=50000",
        "dataset.n_verts=4096",
        "dataset.train_views=['0','1','3','4']",
        "option=iter15k", "seed=0",
    ])
    scene = Scene(cfg, seed=0)
    state, iteration = scene.load_checkpoint(args.ckpt)
    print(f"checkpoint {args.ckpt} @ iter {iteration}", flush=True)

    # OOD motion npz -> MotionSeries (the 1_render_series_recorded.py path)
    motion = synth_ood_motion(args.frames)
    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, 'motion_ood.npz'), **motion)
    series = MotionSeries(motion, assets=scene.assets)

    # predict-camera semantics (reference zjumocap.py:104-129): dummy GT,
    # negative frame ids -> in_frame_dict=0 (pose correction skips),
    # per-frame latent falls back to the LAST train frame
    n_train_frames = len(scene.metadata['frame_dict'])
    last_latent = n_train_frames - 1
    h = w = args.hw
    dummy = np.zeros((h, w, 3), np.float32)

    ds = scene.train_dataset
    view0 = ds._views[sorted(ds._views)[0]]

    alive_np = np.asarray(state.gauss_aux.alive)
    n_alive = int(alive_np.sum())
    bucket = scene.bucket_for(n_alive) if alive_np[:n_alive].all() else 0
    deg = scene.active_sh_degree(iteration)
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
        pkg = render_fn(scene.converter, st.conv_params, gview, camera,
                        jnp.int32(iteration), scene.raster_config,
                        scene.background, nr_cache=nr_cache)
        return jnp.clip(pkg.render, 0.0, 1.0)

    from PIL import Image
    times, coverage = [], []
    for i in range(args.frames):
        rots, Jtrs, bt = series.camera_pose_fields(i, scene.metadata)
        # fixed view for frames, orbiting freeview every 4th (render.py
        # -freeview suffix semantics)
        if i % 4 == 0:
            angle = 2 * np.pi * i / args.frames
            center = np.array([0.0, -0.1, 0.0])
            cam_pos = center + 2.5 * np.array(
                [np.sin(angle), 0.15, np.cos(angle)])
            fwd = center - cam_pos
            fwd /= np.linalg.norm(fwd)
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            up2 = np.cross(fwd, right)
            Rcw = np.stack([right, up2, fwd], axis=0)
            R, T = Rcw.T, -Rcw @ cam_pos
        else:
            R, T = view0['R'], view0['T']
        cam = make_camera(
            R=R, T=T, fovx=0.8, fovy=0.8, image=dummy,
            mask=np.zeros((h, w), np.float32), rots=rots, Jtrs=Jtrs,
            bone_transforms=bt, frame_id=-(i + 1),
            image_name=f"ood_{i:04d}", latent_idx=last_latent,
            pose_idx=last_latent, in_frame_dict=0.0)
        cam = cam.replace(frame_id=0, cam_id=0, image_name='', K=None)
        dev = jax.device_put(jax.tree.map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            cam))
        t0 = time.time()
        img = jax.block_until_ready(render_one(state, dev))
        times.append((time.time() - t0) * 1000.0)
        arr = (np.asarray(img) * 255).astype(np.uint8)
        coverage.append(float((arr.sum(-1) > 8).mean()))
        Image.fromarray(arr).save(os.path.join(args.out, f"ood_{i:04d}.png"))
        if i % 8 == 0:
            print(f"frame {i}: {times[-1]:.0f} ms cover={coverage[-1]:.3f}",
                  flush=True)

    mean_t = float(np.mean(times[1:]))
    res = {'time_ms': mean_t, 'fps': 1000.0 / mean_t,
           'frames': args.frames, 'mean_coverage': float(np.mean(coverage)),
           'iteration': iteration}
    np.savez(os.path.join(args.out, 'results.npz'),
             **{f'metrics/{k}': v for k, v in res.items()})
    with open(os.path.join(args.out, 'summary.json'), 'w') as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == '__main__':
    main()
