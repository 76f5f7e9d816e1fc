"""Shared machinery for ZJU-format datasets (ZJU-MoCap / custom videos /
PeopleSnapshot): principal-point recentering, undistortion, resize, mask
compositing, K rescaling, and SMPL-npz -> Camera assembly.

Parity: dataset/zjumocap.py:273-407 and dataset/people_snapshot.py:255-371
of the reference (the two share this recipe verbatim)."""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from gsavatar.camera import graphics
from gsavatar.camera.camera import Camera, make_camera
from . import base


def load_image_mask(img_file: str, mask_file: str, K, dist, hw_out, hw_raw,
                    white_bg: bool, lanczos: bool = False,
                    use_native: bool = True):
    """Undistort -> resize (linear/lanczos image, nearest mask) -> zero/white
    background outside mask -> [0,1] floats (zjumocap.py:304-328).

    Dispatches to the native C++ loader (gsavatar/native, same OpenCV calls,
    bit-identical — tests/test_native_loader.py) when built; this Python
    body is the reference implementation and fallback."""
    if use_native:
        from gsavatar import native
        if native.available():
            return native.decode_frame(img_file, mask_file, K, dist, hw_out,
                                       white_bg, lanczos)
    import cv2
    image = cv2.cvtColor(cv2.imread(img_file), cv2.COLOR_BGR2RGB)
    mask = cv2.imread(mask_file, cv2.IMREAD_GRAYSCALE)
    image = cv2.undistort(image, K, dist, None)
    mask = cv2.undistort(mask, K, dist, None)
    interp = cv2.INTER_LANCZOS4 if lanczos else cv2.INTER_LINEAR
    h, w = hw_out
    image = cv2.resize(image, (w, h), interpolation=interp)
    mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
    mask = mask != 0
    image[~mask] = 255.0 if white_bg else 0.0
    image = (image / 255.0).astype(np.float32)
    return image, mask.astype(np.float32)


def recenter_extrinsics(K, R, T, W: int, H: int):
    """Fold the principal-point offset into the extrinsics via the shim M
    (zjumocap.py:292-299); returns updated (K, R, T) with centered pp."""
    K = K.copy()
    M = np.eye(3)
    M[0, 2] = (K[0, 2] - W / 2) / K[0, 0]
    M[1, 2] = (K[1, 2] - H / 2) / K[1, 1]
    K[0, 2] = W / 2
    K[1, 2] = H / 2
    R = M @ R
    T = M @ T
    return K, R, T


def build_camera(*, K, dist, R, T, img_file, mask_file, model_dict,
                 metadata, hw_out, hw_raw, white_bg, lanczos,
                 frame_idx, cam_name, frame_dict) -> Camera:
    """Full per-item pipeline producing a Camera record."""
    W_raw, H_raw = hw_raw[1], hw_raw[0]
    K, R, T = recenter_extrinsics(K, R, T, W_raw, H_raw)
    R = np.transpose(R)
    T = T[:, 0] if T.ndim == 2 else T

    image, mask = load_image_mask(img_file, mask_file, K, dist, hw_out,
                                  hw_raw, white_bg, lanczos)
    h, w = hw_out
    K = K.copy()
    K[0, :] *= w / W_raw
    K[1, :] *= h / H_raw
    fovx = graphics.focal_to_fov(K[0, 0], w)
    fovy = graphics.focal_to_fov(K[1, 1], h)

    trans = model_dict['trans'].astype(np.float32)
    bone_transforms = model_dict['bone_transforms'].astype(np.float32)
    rots = base.pose_to_rots(model_dict['root_orient'].astype(np.float32),
                             model_dict['pose_body'].astype(np.float32),
                             model_dict['pose_hand'].astype(np.float32))
    Jtr_norm = base.normalize_Jtr(metadata['Jtr'], metadata['minimal_shape'])
    bt = base.compose_bone_transforms(
        bone_transforms, metadata['bone_transforms_02v'], trans)

    in_dict = frame_idx in (frame_dict or {})
    li = (frame_dict or {}).get(frame_idx, max(len(frame_dict or {}) - 1, 0))
    fname = frame_idx if frame_idx >= 0 else -frame_idx - 1
    return make_camera(
        R=R, T=T, fovx=fovx, fovy=fovy, image=image, mask=mask,
        rots=rots[None], Jtrs=Jtr_norm[None], bone_transforms=bt,
        frame_id=frame_idx, cam_id=int(cam_name),
        image_name=f"c{int(cam_name):02d}_f{fname:06d}", K=K,
        latent_idx=li, pose_idx=li, in_frame_dict=float(in_dict))


def load_pose_ground_truth(frames, model_files):
    """Stacked SMPL GT for pose correction (zjumocap.py:244-259)."""
    ret = {'frames': list(frames), 'root_orient': [], 'pose_body': [],
           'pose_hand': [], 'trans': []}
    for idx, model_file in enumerate(model_files):
        md = np.load(model_file)
        if idx == 0:
            ret['betas'] = md['betas'].astype(np.float32)
        ret['root_orient'].append(md['root_orient'].astype(np.float32))
        ret['pose_body'].append(md['pose_body'].astype(np.float32))
        ret['pose_hand'].append(md['pose_hand'].astype(np.float32))
        ret['trans'].append(md['trans'].astype(np.float32))
    return ret
