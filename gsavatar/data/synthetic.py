"""Synthetic avatar dataset — the framework's data-free fixture.

Stands in for ZJU-MoCap/PeopleSnapshot when no data is mounted (neither the
reference snapshot nor this image ships any): a deterministic synthetic
humanoid (gsavatar.smpl.body_model.synthetic_assets) is posed over F frames
with smooth random joint wiggles; ground-truth images are renders of a hidden
"target" Gaussian set rigidly skinned to the body — so a training run can
provably converge toward the target and every pipeline stage (LBS, camera
math, rasterizer, losses) is exercised with realistic structure.

The produced metadata/camera records are bit-compatible with what the real
loaders emit (same keys, shapes, and normalization recipes from
dataset/zjumocap.py of the reference)."""
from __future__ import annotations

import math
from typing import List

import numpy as np

import jax.numpy as jnp

from gsavatar.camera.camera import make_camera
from gsavatar.camera import graphics
from gsavatar.ops.rasterizer import RasterizeConfig, rasterize
from gsavatar.ops.sampling import sample_surface
from gsavatar.smpl import lbs as smpl_lbs
from gsavatar.smpl.body_model import synthetic_assets
from gsavatar.utils.transforms import covariance_from_scaling_rotation
from . import base
from .base import BaseDataset


import functools
import jax


@functools.partial(jax.jit, static_argnames=('tanfovx', 'tanfovy', 'cfgr'))
def _gt_render_jit(xyz_cano, weights, bt, scales, colors, opacity,
                   viewmatrix, full_proj, tanfovx, tanfovy, cfgr):
    T_fwd = (weights @ bt.reshape(-1, 16)).reshape(-1, 4, 4)
    xyz = (T_fwd[:, :3, :3] @ xyz_cano[..., None])[..., 0] + T_fwd[:, :3, 3]
    q = jnp.zeros((xyz.shape[0], 4)).at[:, 0].set(1.0)
    cov = covariance_from_scaling_rotation(scales, 1.0, q)
    res = rasterize(xyz, colors, opacity, cov, viewmatrix=viewmatrix,
                    full_projmatrix=full_proj, tanfovx=tanfovx,
                    tanfovy=tanfovy, background=jnp.zeros(3), config=cfgr)
    return res.image, res.alpha


class SyntheticDataset(BaseDataset):
    def __init__(self, cfg, split='train'):
        super().__init__(cfg, split)
        seed = cfg.get('seed', 0)
        self.rng = np.random.default_rng(seed)
        n_verts = cfg.get('n_verts', 2048)
        self.assets = synthetic_assets(n_verts=n_verts, seed=seed)
        self.h, self.w = cfg.img_hw

        minimal_shape = self.assets.v_template.copy()
        self.metadata = base.canonicalize(minimal_shape, self.assets,
                                          padding=base.padding_ratio(cfg))

        # frames & views for this split
        n_frames_total = cfg.train_frames[1]
        if split == 'train':
            views = [int(v) for v in cfg.train_views]
            fsl = base.frame_slice(list(cfg.train_frames), n_frames_total)
        elif split == 'val':
            views = [int(v) for v in cfg.val_views]
            fsl = base.frame_slice(list(cfg.val_frames), n_frames_total)
        elif split in ('test', 'predict'):
            views = [int(v) for v in cfg.get('val_views', ['2'])]
            tf = cfg.test_frames['view'] if split == 'test' \
                else cfg.predict_frames
            fsl = base.frame_slice(list(tf), n_frames_total)
        else:
            raise ValueError(split)
        frames = list(range(n_frames_total))[fsl]

        # deterministic smooth pose track (same for all splits)
        pose_rng = np.random.default_rng(seed + 1)
        amp = pose_rng.uniform(0.05, 0.25, size=(23, 3))
        phase = pose_rng.uniform(0, 2 * np.pi, size=(23, 3))
        freq = pose_rng.uniform(0.5, 1.5, size=(23, 3))
        self._poses = []
        for f in range(n_frames_total):
            t = f / max(n_frames_total, 1) * 2 * np.pi
            body = amp * np.sin(freq * t + phase)
            pose = np.concatenate([np.zeros(3), body.reshape(-1)])
            self._poses.append(pose.astype(np.float32))

        # cameras on a circle, radius ~2.5, looking at the body center
        self._views = {}
        all_views = sorted(set(views))
        for v in all_views:
            self._views[v] = self._make_view(v)

        self.frames = frames
        self.views = views
        self.data = [{'view': v, 'frame': f} for v in views for f in frames]

        frame_dict = {f: i for i, f in enumerate(frames)}
        self.metadata.update({
            'posedirs': self.assets.posedirs,
            'J_regressor': self.assets.J_regressor,
            'cameras_extent': base.ZJU_CAMERAS_EXTENT,
            'frame_dict': frame_dict,
        })
        if cfg.get('train_smpl', False) and split == 'train':
            self.metadata.update(self._pose_ground_truth(frames))

        # hidden target gaussians (GT generator)
        self._build_target(cfg)
        self.metadata['synthetic_target'] = self._target

    # ------------------------------------------------------------------
    def _make_view(self, v: int, n_around: int = 8):
        angle = 2 * np.pi * v / n_around
        center = np.array([0.0, -0.1, 0.0])
        radius = 2.5
        cam_pos = center + radius * np.array(
            [math.sin(angle), 0.15, math.cos(angle)])
        # camera looks at `center`: build R (world->cam rows), T = -R @ pos
        fwd = center - cam_pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])  # y-down image convention
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rcw = np.stack([right, up2, fwd], axis=0)     # world->cam
        T = -Rcw @ cam_pos
        # loaders store R transposed (zjumocap.py:301): R arg = (world->cam)^T
        return {'R': Rcw.T.astype(np.float32), 'T': T.astype(np.float32)}

    def _frame_smpl(self, f: int):
        """Per-frame SMPL products in the ZJU npz format semantics."""
        a = self.assets
        pose = self._poses[f]
        res = smpl_lbs.lbs(
            jnp.zeros((1, 10)), jnp.asarray(pose)[None],
            jnp.asarray(a.v_template)[None], jnp.asarray(a.shapedirs),
            jnp.asarray(a.posedirs), jnp.asarray(a.J_regressor),
            a.parents, jnp.asarray(a.skinning_weights))
        _, _, _, A, _, _, _, _ = res
        bone_transforms = np.asarray(A[0])
        trans = np.zeros(3, np.float32)
        return {
            'bone_transforms': bone_transforms,
            'trans': trans,
            'root_orient': pose[:3],
            'pose_body': pose[3:66],
            'pose_hand': pose[66:72],
        }

    def _pose_ground_truth(self, frames: List[int]):
        ret = {'frames': frames, 'root_orient': [], 'pose_body': [],
               'pose_hand': [], 'trans': [],
               'betas': np.zeros((1, 10), np.float32)}
        for f in frames:
            p = self._poses[f]
            ret['root_orient'].append(p[:3])
            ret['pose_body'].append(p[3:66])
            ret['pose_hand'].append(p[66:72])
            ret['trans'].append(np.zeros(3, np.float32))
        return ret

    def _build_target(self, cfg):
        """Hidden GT gaussian set in canonical space + per-gaussian skinning."""
        n = cfg.get('n_target_gaussians', 4096)
        md = self.metadata
        pts, face_idx, bary = sample_surface(md['smpl_verts'], md['faces'], n,
                                             seed=cfg.get('seed', 0) + 7)
        weights = (md['skinning_weights'][md['faces'][face_idx]]
                   * bary[..., None]).sum(axis=1)
        # procedural colors: smooth position-based palette
        p = (pts - pts.min(0)) / (np.ptp(pts, 0) + 1e-6)
        colors = np.stack([
            0.5 + 0.5 * np.sin(3.0 * p[:, 0] + 6.0 * p[:, 1]),
            p[:, 1],
            0.5 + 0.5 * np.cos(5.0 * p[:, 2] + 2.0 * p[:, 1]),
        ], axis=1).astype(np.float32)
        rng = np.random.default_rng(cfg.get('seed', 0) + 13)
        scales = np.full((n, 3), 0.012, np.float32) \
            * (0.7 + 0.6 * rng.random((n, 3), dtype=np.float32))
        self._target = {
            'xyz': pts.astype(np.float32),
            'colors': colors,
            'opacity': np.full((n, 1), 0.9, np.float32),
            'scales': scales.astype(np.float32),
            'weights': weights.astype(np.float32),
        }

    def _render_gt(self, cam_params, frame_dict_entry):
        """Render the hidden target with our rasterizer to produce GT.
        The whole pipeline is jitted once per image size (class-level cache)."""
        t = self._target
        bt = base.compose_bone_transforms(
            frame_dict_entry['bone_transforms'],
            self.metadata['bone_transforms_02v'], frame_dict_entry['trans'])
        fov = 0.8
        cam = make_camera(
            R=cam_params['R'], T=cam_params['T'], fovx=fov, fovy=fov,
            image=np.zeros((self.h, self.w, 3), np.float32),
            mask=np.zeros((self.h, self.w), np.float32),
            rots=np.zeros((1, 24, 9), np.float32),
            Jtrs=np.zeros((1, 24, 3), np.float32),
            bone_transforms=np.tile(np.eye(4, dtype=np.float32), (24, 1, 1)))
        cfgr = RasterizeConfig(width=self.w, height=self.h,
                               max_pairs=2 ** 18, per_tile_capacity=256,
                               chunk=32)
        img, alpha = _gt_render_jit(
            jnp.asarray(t['xyz']), jnp.asarray(t['weights']),
            jnp.asarray(bt), jnp.asarray(t['scales']),
            jnp.asarray(t['colors']), jnp.asarray(t['opacity']),
            jnp.asarray(cam.world_view_transform),
            jnp.asarray(cam.full_proj_transform),
            cam.tanfovx, cam.tanfovy, cfgr)
        img = np.asarray(img)
        mask = (np.asarray(alpha) > 0.5).astype(np.float32)
        return np.clip(img, 0.0, 1.0), mask

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self.data)

    def _get_camera(self, idx):
        rec = self.data[idx]
        v, f = rec['view'], rec['frame']
        smpl = self._frame_smpl(f)
        cam_params = self._views[v]

        image, mask = self._render_gt(cam_params, smpl)

        md = self.metadata
        rots = base.pose_to_rots(smpl['root_orient'], smpl['pose_body'],
                                 smpl['pose_hand'])
        Jtr_norm = base.normalize_Jtr(md['Jtr'], md['minimal_shape'])
        bt = base.compose_bone_transforms(
            smpl['bone_transforms'], md['bone_transforms_02v'], smpl['trans'])

        frame_dict = md.get('frame_dict') or {}
        in_dict = f in frame_dict
        li = frame_dict.get(f, max(len(frame_dict) - 1, 0))
        fov = 0.8
        return make_camera(
            R=cam_params['R'], T=cam_params['T'], fovx=fov, fovy=fov,
            image=image, mask=mask, rots=rots[None], Jtrs=Jtr_norm[None],
            bone_transforms=bt, frame_id=f, cam_id=v,
            image_name=f"c{v:02d}_f{f:06d}",
            latent_idx=li, pose_idx=li, in_frame_dict=float(in_dict))

    def readPointCloud(self, n_points=None):
        n = n_points or self.cfg.get('n_points', 8192)
        pts, _, _ = sample_surface(self.metadata['smpl_verts'],
                                   self.metadata['faces'], n,
                                   seed=self.cfg.get('seed', 0) + 3)
        colors = np.ones_like(pts)
        return pts, colors
