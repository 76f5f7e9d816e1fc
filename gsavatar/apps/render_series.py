"""Offline motion playback: render a trained avatar driven by a motion npz
with orbiting freeview cameras.

Parity: 1_render_series_recorded.py of the reference (motion npz ->
MotionSeries -> per-frame freeview camera -> render -> video)."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from gsavatar.camera.live import live_camera
from gsavatar.inference import InferenceScene
from gsavatar.motion.series import MotionSeries


def render_series(scene: InferenceScene, series: MotionSeries, *,
                  out_dir: str, width: int = 512, height: int = 512,
                  orbit: bool = True, radius: float = 2.5,
                  max_frames: Optional[int] = None, save_video: bool = True):
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    n = min(len(series), max_frames) if max_frames else len(series)
    for i in range(n):
        rots, Jtrs, bt = series.camera_pose_fields(i, scene.metadata)
        angle = 2 * np.pi * i / max(n, 1) if orbit else 0.0
        Rcw = np.array([
            [np.cos(angle), 0, -np.sin(angle)],
            [0, 1, 0],
            [np.sin(angle), 0, np.cos(angle)]], np.float32)
        T = np.array([0.0, 0.0, radius], np.float32)
        cam = live_camera(Rcw, T, width=width, height=height,
                          rots=rots, Jtrs=Jtrs, bone_transforms=bt,
                          frame_id=i)
        pkg = scene.render_frame(cam)
        img = (np.clip(np.asarray(pkg.render), 0, 1) * 255).astype(np.uint8)
        frames.append(img)
        from PIL import Image
        Image.fromarray(img).save(os.path.join(out_dir, f"{i:06d}.png"))
    if save_video and frames:
        from gsavatar.motion.streams import save_video_from_frames
        save_video_from_frames(frames, os.path.join(out_dir, "series.mp4"))
    return frames
