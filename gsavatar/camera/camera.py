"""Camera record — a jit-able pytree carrying one frame's render inputs.

Parity: scene/cameras.py:17-61 of the reference (the dict-backed Camera).
Differences by design:
  * immutable flax.struct dataclass (functional updates via .replace);
  * image/mask are HWC float arrays (the reference uses CHW torch tensors);
  * avatar pose fields (rots/Jtrs/bone_transforms) ride along as array leaves;
  * `latent_idx` / `pose_idx` / `in_frame_dict` are precomputed host-side so
    the per-frame latent lookup and the "frame not in frame_dict" fallbacks
    (ref non_rigid.py:68-77, pose_correction.py:190-194) are traced-friendly.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np
from flax import struct

from . import graphics


@struct.dataclass
class Camera:
    # render geometry (row-vector convention: p_h @ M)
    world_view_transform: Any   # (4,4) = W2V^T
    full_proj_transform: Any    # (4,4) = W2V^T @ P^T
    camera_center: Any          # (3,)
    # avatar pose
    rots: Any                   # (1,24,9) flattened rotmats, root=I
    Jtrs: Any                   # (1,24,3) normalized joints
    bone_transforms: Any        # (24,4,4) cano(Vitruvian)->posed (+trans)
    # supervision
    image: Any                  # (H,W,3) float in [0,1] or zeros (predict)
    mask: Any                   # (H,W) float {0,1}
    # per-frame indices for latents / pose correction (int32 scalars)
    latent_idx: Any             # clamped index into frame_dict embeddings
    pose_idx: Any               # index into pose-correction embeddings
    in_frame_dict: Any          # float 1.0/0.0
    # static metadata (not traced)
    fovx: float = struct.field(pytree_node=False, default=0.0)
    fovy: float = struct.field(pytree_node=False, default=0.0)
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)
    frame_id: int = struct.field(pytree_node=False, default=0)
    cam_id: int = struct.field(pytree_node=False, default=0)
    image_name: str = struct.field(pytree_node=False, default="")
    K: Optional[np.ndarray] = struct.field(pytree_node=False, default=None)

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    def update_pose(self, rots, Jtrs, bone_transforms) -> "Camera":
        return self.replace(rots=rots, Jtrs=Jtrs, bone_transforms=bone_transforms)


def make_camera(*, R, T, fovx, fovy, image, mask, rots, Jtrs, bone_transforms,
                frame_id=0, cam_id=0, image_name="", K=None,
                latent_idx=0, pose_idx=0, in_frame_dict=1.0,
                znear=0.01, zfar=100.0, trans=np.array([0.0, 0.0, 0.0]),
                scale=1.0) -> Camera:
    """Host-side constructor computing the derived transforms exactly as
    scene/cameras.py:35-40 (transposed storage, row-vector products)."""
    w2v = graphics.world_to_view(R, T, trans, scale).T            # (4,4)^T
    proj = graphics.projection_matrix(znear, zfar, fovx, fovy).T  # (4,4)^T
    full = (w2v @ proj).astype(np.float32)
    cam_center = np.linalg.inv(w2v)[3, :3].astype(np.float32)
    image = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
    mask = np.asarray(mask, np.float32)
    h, w = image.shape[0], image.shape[1]
    return Camera(
        world_view_transform=w2v.astype(np.float32),
        full_proj_transform=full,
        camera_center=cam_center,
        rots=np.asarray(rots, np.float32),
        Jtrs=np.asarray(Jtrs, np.float32),
        bone_transforms=np.asarray(bone_transforms, np.float32),
        image=image, mask=mask,
        latent_idx=np.int32(latent_idx), pose_idx=np.int32(pose_idx),
        in_frame_dict=np.float32(in_frame_dict),
        fovx=float(fovx), fovy=float(fovy), width=int(w), height=int(h),
        znear=float(znear), zfar=float(zfar),
        frame_id=int(frame_id), cam_id=int(cam_id), image_name=image_name, K=K)
