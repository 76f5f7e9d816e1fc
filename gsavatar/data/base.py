"""Shared dataset helpers: canonicalization and camera-record assembly.

Parity: the per-dataset recipes in dataset/zjumocap.py of the reference —
get_cano_smpl_verts (zjumocap.py:215-242), the Jtr normalization and
bone-transform composition in _get_camera (zjumocap.py:360-407)."""
from __future__ import annotations

from typing import Dict, List

import numpy as np
from scipy.spatial.transform import Rotation

from gsavatar.camera.camera import Camera, make_camera
from gsavatar.smpl.body_model import SMPLAssets
from gsavatar.smpl.vitruvian import get_02v_bone_transforms
from gsavatar.utils.aabb import AABB

# hardcoded in the reference for ZJU-MoCap (zjumocap.py:204): scales the
# densification thresholds and xyz LR
ZJU_CAMERAS_EXTENT = 3.469298553466797


def fix_symmetry(arr: np.ndarray, rng=None) -> np.ndarray:
    """Break symmetry of float16 canonical shapes (zjumocap.py:38-42)."""
    if arr.dtype == np.float16:
        rng = rng or np.random.default_rng(0)
        return arr.astype(np.float32) + 1e-4 * rng.standard_normal(arr.shape)
    return arr.astype(np.float32)


def padding_ratio(cfg):
    """AABB padding from config: a scalar or a per-axis [px, py, pz] list
    (reference dummy_dataset.py:138-142 np.array's the value; the
    zjumocap_387 config sets a 3-list)."""
    p = cfg.get('padding', 0.1)
    try:
        return np.asarray([float(v) for v in p], dtype=np.float32)
    except TypeError:
        return float(p)


def canonicalize(minimal_shape: np.ndarray, assets: SMPLAssets,
                 padding: float = 0.1) -> dict:
    """Star-pose (Vitruvian) canonicalization of a minimally-clothed shape.
    Returns the metadata dict the whole model stack consumes."""
    Jtr = assets.J_regressor @ minimal_shape
    skinning_weights = assets.skinning_weights
    tf_02v = get_02v_bone_transforms(Jtr)
    T = (skinning_weights @ tf_02v.reshape(-1, 16)).reshape(-1, 4, 4)
    verts = (T[:, :3, :3] @ minimal_shape[..., None])[..., 0] + T[:, :3, 3]
    verts = verts.astype(np.float32)
    aabb = AABB.from_points(verts, padding=padding)
    return {
        'gender': assets.gender,
        'smpl_verts': verts,
        'minimal_shape': minimal_shape,
        'Jtr': Jtr,
        'skinning_weights': skinning_weights.astype(np.float32),
        'bone_transforms_02v': tf_02v,
        'faces': assets.faces,
        'coord_min': np.asarray(aabb.coord_min),
        'coord_max': np.asarray(aabb.coord_max),
        'aabb': aabb,
    }


def normalize_Jtr(Jtr: np.ndarray, minimal_shape: np.ndarray) -> np.ndarray:
    """Joint normalization recipe (zjumocap.py:367-381)."""
    center = np.mean(minimal_shape, axis=0)
    centered = minimal_shape - center
    cano_max = centered.max()
    cano_min = centered.min()
    padding = (cano_max - cano_min) * 0.05
    Jn = Jtr - center
    Jn = (Jn - cano_min + padding) / (cano_max - cano_min) / 1.1
    Jn -= 0.5
    Jn *= 2.0
    return Jn.astype(np.float32)


def pose_to_rots(root_orient, pose_body, pose_hand) -> np.ndarray:
    """(24, 9) flattened rotation matrices with the root set to identity
    (zjumocap.py:353-359)."""
    pose = np.concatenate([root_orient, pose_body, pose_hand], axis=-1)
    mats = Rotation.from_rotvec(pose.reshape(-1, 3)).as_matrix()
    rots = np.concatenate([np.eye(3)[None], mats[1:]], axis=0)
    return rots.reshape(-1, 9).astype(np.float32)


def compose_bone_transforms(bone_transforms: np.ndarray, tf_02v: np.ndarray,
                            trans: np.ndarray) -> np.ndarray:
    """Final cano(Vitruvian)->posed transforms (zjumocap.py:384-389)."""
    bt = bone_transforms @ np.linalg.inv(tf_02v)
    bt = bt.astype(np.float32)
    bt[:, :3, 3] += trans
    return bt


class BaseDataset:
    """Indexable camera-record dataset with optional preload."""

    def __init__(self, cfg, split: str):
        self.cfg = cfg
        self.split = split
        self._cache: Dict[int, Camera] = {}

    def __len__(self) -> int:
        raise NotImplementedError

    def _get_camera(self, idx: int) -> Camera:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Camera:
        if self.cfg.get('preload', True):
            if idx not in self._cache:
                self._cache[idx] = self._get_camera(idx)
            return self._cache[idx]
        return self._get_camera(idx)


def frame_slice(frames_cfg: List[int], n_total: int):
    start, end, step = frames_cfg
    if end == 0:
        end = n_total
    return slice(start, end, step)
