"""Live AR rendering: board-tracked camera + motion-driven avatar composited
over the webcam feed.

Parity: 3_ar_render.py of the reference. Requires a physical webcam and an
ArUco board — both absent in CI/TPU pods, so this module only wires the
pieces (ChArucoStream -> live_camera -> render -> composite) and raises
cleanly when no device exists. The per-frame math is identical to the
offline apps, which are fully tested."""
from __future__ import annotations

from typing import Optional

import numpy as np

from gsavatar.camera.live import live_camera
from gsavatar.inference import InferenceScene
from gsavatar.motion.series import MotionSeries
from gsavatar.motion.streams import CameraStream, ChArucoStream


def ar_render(scene: InferenceScene, series: MotionSeries, *,
              device: int = 0, t_scale: float = 4.0,
              max_frames: Optional[int] = None, display: bool = True):
    cam_stream = CameraStream(device=device)
    board = ChArucoStream(cam_stream, cam_stream.K)

    import cv2
    shown = 0
    for frame, pose in board:
        if pose is None:
            continue
        R, T = pose
        i = shown % len(series)
        rots, Jtrs, bt = series.camera_pose_fields(i, scene.metadata)
        cam = live_camera(R.T.astype(np.float32),
                          (t_scale * T).astype(np.float32), K=cam_stream.K,
                          width=scene.raster_config.width,
                          height=scene.raster_config.height,
                          rots=rots, Jtrs=Jtrs, bone_transforms=bt)
        pkg = scene.render_frame(cam)
        render = np.clip(np.asarray(pkg.render), 0, 1)
        alpha = np.asarray(pkg.opacity_render)[..., None]
        h, w = frame.shape[:2]
        render = cv2.resize(render, (w, h))
        alpha = cv2.resize(alpha[..., 0], (w, h))[..., None]
        composite = (alpha * render * 255
                     + (1 - alpha) * frame.astype(np.float32)).astype(np.uint8)
        if display:
            cv2.imshow('ar', cv2.cvtColor(composite, cv2.COLOR_RGB2BGR))
            if cv2.waitKey(1) == 27:
                break
        shown += 1
        if max_frames and shown >= max_frames:
            break
    cam_stream.release()
