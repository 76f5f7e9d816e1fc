"""Motion-series playback: drive the avatar with an estimated SMPL sequence.

Parity: motion_display/motion_series.py of the reference (the fork's
real-time layer): iterate a CLIFF-style npz (pose (F,72), shape (F,10),
global_t (F,3), focal_l), optionally overriding/accumulating root orientation
and translation, and produce per-frame (rots, Jtrs, bone_transforms) ready
for Camera.update_pose — here via our own SMPL LBS instead of a torch
BodyModel, and with the Vitruvian-relative transform computed from the
subject metadata instead of a hard-coded .npy."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from gsavatar.data import base as data_base
from gsavatar.smpl import lbs as smpl_lbs
from gsavatar.smpl.body_model import SMPLAssets
from gsavatar.smpl.vitruvian import get_02v_bone_transforms


@dataclass
class SMPLParameters:
    """One frame of SMPL state (motion_series.py:24-41)."""
    root_orient: np.ndarray  # (3,)
    pose_body: np.ndarray    # (63,)
    pose_hand: np.ndarray    # (6,)
    trans: np.ndarray        # (3,)
    betas: np.ndarray        # (10,)
    bone_transforms: np.ndarray  # (24, 4, 4) raw (not 02v-relative)
    verts: Optional[np.ndarray] = None
    joints: Optional[np.ndarray] = None

    def export(self) -> dict:
        """ZJU-format npz payload (motion_series.py:24-41)."""
        return {
            'root_orient': self.root_orient, 'pose_body': self.pose_body,
            'pose_hand': self.pose_hand, 'trans': self.trans,
            'betas': self.betas.reshape(1, -1),
            'bone_transforms': self.bone_transforms,
        }


class MotionSeries:
    """Iterate SMPL parameters from a motion npz.

    npz keys (CLIFF export): pose (F, 72), shape (F, 10), global_t (F, 3),
    focal_l (scalar or (F,)). Overrides mirror motion_series.py:127-158:
    fixed root_orient/trans, or accumulate mode adding a per-frame delta."""

    def __init__(self, path_or_arrays, assets: SMPLAssets, *,
                 root_orient=None, trans=None, accumulate: bool = False,
                 trans_delta=None):
        if isinstance(path_or_arrays, (str,)):
            data = dict(np.load(path_or_arrays))
        else:
            data = dict(path_or_arrays)
        self.pose = np.asarray(data['pose'], np.float32)
        self.shape = np.asarray(data.get('shape',
                                         np.zeros((len(self.pose), 10))),
                                np.float32)
        self.global_t = np.asarray(
            data.get('global_t', np.zeros((len(self.pose), 3))), np.float32)
        self.focal_l = np.asarray(data.get('focal_l', 1000.0), np.float32)
        self.assets = assets
        self.root_orient_override = root_orient
        self.trans_override = trans
        self.accumulate = accumulate
        self.trans_delta = trans_delta
        self._acc_trans = np.zeros(3, np.float32)

    def __len__(self):
        return len(self.pose)

    def parse(self, idx: int) -> SMPLParameters:
        pose = self.pose[idx].copy()
        trans = self.global_t[idx].copy()
        if self.root_orient_override is not None:
            pose[:3] = self.root_orient_override
        if self.trans_override is not None:
            trans = np.asarray(self.trans_override, np.float32).copy()
        if self.accumulate and self.trans_delta is not None:
            self._acc_trans += np.asarray(self.trans_delta, np.float32)
            trans = trans + self._acc_trans

        betas = self.shape[idx]
        a = self.assets
        res = smpl_lbs.lbs(
            jnp.asarray(betas)[None], jnp.asarray(pose)[None],
            jnp.asarray(a.v_template)[None], jnp.asarray(a.shapedirs),
            jnp.asarray(a.posedirs), jnp.asarray(a.J_regressor),
            a.parents, jnp.asarray(a.skinning_weights))
        verts, J_posed, _J, A, _, _, _, _ = res
        return SMPLParameters(
            root_orient=pose[:3], pose_body=pose[3:66], pose_hand=pose[66:72],
            trans=trans, betas=betas, bone_transforms=np.asarray(A[0]),
            verts=np.asarray(verts[0]), joints=np.asarray(J_posed[0]))

    def camera_pose_fields(self, idx: int, metadata: dict):
        """(rots, Jtrs, bone_transforms) for Camera.update_pose — the
        per-frame pipeline of motion_series.py:225-269 using the subject's
        canonical metadata."""
        p = self.parse(idx)
        rots = data_base.pose_to_rots(p.root_orient, p.pose_body, p.pose_hand)
        Jtr_norm = data_base.normalize_Jtr(metadata['Jtr'],
                                           metadata['minimal_shape'])
        bt = data_base.compose_bone_transforms(
            p.bone_transforms, metadata['bone_transforms_02v'], p.trans)
        return rots[None], Jtr_norm[None], bt

    def __iter__(self) -> Iterator[SMPLParameters]:
        for i in range(len(self)):
            yield self.parse(i)
