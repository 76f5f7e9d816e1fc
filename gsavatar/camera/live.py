"""Live-demo camera built from raw (R, T, K) per frame.

Parity: scene/duck_camera.py of the reference — constructs the
world/view/projection stack directly from an extrinsic pair and an intrinsic
matrix (or an estimated focal sqrt(h^2+w^2), common/utils.py), with
update_pose() swapping the SMPL fields per frame. Note the reference
assembles W2V with the translation in the LAST ROW (duck_camera.py:59-63,
row-vector convention) — reproduced here."""
from __future__ import annotations

import math
from typing import Optional

import numpy as np

from gsavatar.camera import graphics
from gsavatar.camera.camera import Camera


def estimate_focal_length(h: int, w: int) -> float:
    """CLIFF focal heuristic (common/utils.py)."""
    return math.sqrt(h * h + w * w)


def live_camera(R: np.ndarray, T: np.ndarray, *, K: Optional[np.ndarray] = None,
                width: int = 1280, height: int = 720,
                znear: float = 0.01, zfar: float = 100.0,
                rots=None, Jtrs=None, bone_transforms=None,
                frame_id: int = 0) -> Camera:
    if K is None:
        f = estimate_focal_length(height, width)
        K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]],
                     np.float32)
    fovx = graphics.focal_to_fov(K[0, 0], width)
    fovy = graphics.focal_to_fov(K[1, 1], height)

    # duck_camera.py row layout: W2V^T rows = [R | 0], last row = [T | 1]
    w2v_t = np.zeros((4, 4), np.float32)
    w2v_t[:3, :3] = np.asarray(R, np.float32)
    w2v_t[3, :3] = np.asarray(T, np.float32).ravel()
    w2v_t[3, 3] = 1.0
    proj_t = graphics.projection_matrix(znear, zfar, fovx, fovy).T
    full = (w2v_t @ proj_t).astype(np.float32)
    cam_center = np.linalg.inv(w2v_t)[3, :3].astype(np.float32)

    eye24 = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
    return Camera(
        world_view_transform=w2v_t, full_proj_transform=full,
        camera_center=cam_center,
        rots=np.zeros((1, 24, 9), np.float32) if rots is None else rots,
        Jtrs=np.zeros((1, 24, 3), np.float32) if Jtrs is None else Jtrs,
        bone_transforms=eye24 if bone_transforms is None else bone_transforms,
        image=np.zeros((height, width, 3), np.float32),
        mask=np.zeros((height, width), np.float32),
        latent_idx=np.int32(0), pose_idx=np.int32(0),
        in_frame_dict=np.float32(0.0),
        fovx=float(fovx), fovy=float(fovy), width=int(width),
        height=int(height), znear=znear, zfar=zfar, frame_id=frame_id, K=K)
