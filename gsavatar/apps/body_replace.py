"""Video body replacement: render the avatar with CLIFF-estimated poses and
composite it over the source video where the render is non-black.

Parity: 2_body_replace.py of the reference (render==0 -> keep source pixel;
we use the rasterizer's alpha channel, which the reference approximates by
thresholding the render — a strictly better matte from the same pass)."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from gsavatar.camera.live import live_camera
from gsavatar.inference import InferenceScene
from gsavatar.motion.series import MotionSeries


def body_replace(scene: InferenceScene, series: MotionSeries, video_frames, *,
                 out_dir: str, max_frames: Optional[int] = None,
                 save_video: bool = True):
    os.makedirs(out_dir, exist_ok=True)
    out = []
    for i, frame in enumerate(video_frames):
        if max_frames and i >= max_frames:
            break
        if i >= len(series):
            break
        h, w = frame.shape[:2]
        rots, Jtrs, bt = series.camera_pose_fields(i, scene.metadata)
        cam = live_camera(np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32), K=series_K(series, w, h),
                          width=scene.raster_config.width,
                          height=scene.raster_config.height,
                          rots=rots, Jtrs=Jtrs, bone_transforms=bt,
                          frame_id=i)
        pkg = scene.render_frame(cam)
        render = np.clip(np.asarray(pkg.render), 0, 1)
        alpha = np.asarray(pkg.opacity_render)[..., None]
        import cv2
        render = cv2.resize(render, (w, h))
        alpha = cv2.resize(alpha, (w, h))[..., None]
        composite = (alpha * render * 255
                     + (1 - alpha) * frame.astype(np.float32))
        img = composite.astype(np.uint8)
        out.append(img)
        from PIL import Image
        Image.fromarray(img).save(os.path.join(out_dir, f"{i:06d}.png"))
    if save_video and out:
        from gsavatar.motion.streams import save_video_from_frames
        save_video_from_frames(out, os.path.join(out_dir, "composite.mp4"))
    return out


def series_K(series: MotionSeries, w: int, h: int) -> np.ndarray:
    f = float(np.atleast_1d(series.focal_l)[0])
    return np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
