"""Synthetic-dataset capture: render a ZJU-format dataset (images / masks /
model npzs) from a trained avatar driven by a motion sequence.

Parity: 4_capture_and_record.py of the reference — the output directory
layout matches what the ZJU loader consumes, closing the loop
motion -> render -> retrainable dataset."""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from gsavatar.camera.live import live_camera
from gsavatar.inference import InferenceScene
from gsavatar.motion.series import MotionSeries


def capture_and_record(scene: InferenceScene, series: MotionSeries, *,
                       out_dir: str, cam_name: str = "1",
                       width: int = 512, height: int = 512,
                       radius: float = 2.5,
                       max_frames: Optional[int] = None):
    img_dir = os.path.join(out_dir, cam_name)
    model_dir = os.path.join(out_dir, "models")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(model_dir, exist_ok=True)

    Rcw = np.eye(3, dtype=np.float32)
    T = np.array([0.0, 0.0, radius], np.float32)
    K = None

    n = min(len(series), max_frames) if max_frames else len(series)
    for i in range(n):
        params = series.parse(i)
        rots, Jtrs, bt = series.camera_pose_fields(i, scene.metadata)
        cam = live_camera(Rcw, T, width=width, height=height,
                          rots=rots, Jtrs=Jtrs, bone_transforms=bt,
                          frame_id=i)
        K = cam.K
        pkg = scene.render_frame(cam)
        img = (np.clip(np.asarray(pkg.render), 0, 1) * 255).astype(np.uint8)
        mask = (np.asarray(pkg.opacity_render) > 0.5).astype(np.uint8) * 255
        import cv2
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.png"), mask)

        payload = params.export()
        payload['minimal_shape'] = scene.metadata['minimal_shape']
        np.savez(os.path.join(model_dir, f"{i:06d}.npz"), **payload)

    cam_params = {cam_name: {
        'K': K.tolist(), 'D': [0, 0, 0, 0, 0],
        'R': Rcw.T.tolist(), 'T': T[:, None].tolist(),
    }, 'all_cam_names': [cam_name]}
    with open(os.path.join(out_dir, 'cam_params.json'), 'w') as f:
        json.dump(cam_params, f)
    return out_dir
