"""Per-frame SMPL pose refinement.

Parity: models/pose_correction/pose_correction.py of the reference.
  * none   — passthrough.
  * direct — embeddings over root_orient/pose_body/pose_hand/trans initialized
    from the dataset GT plus a shared betas parameter; re-runs SMPL LBS and
    the Vitruvian transform to produce updated (rots, Jtrs, bone_transforms)
    on the camera (pose_correction.py:203-252). The Jtrs normalization recipe
    (center / minmax / 1.1 / [-1,1]) matches _forward_smpl:173-185.

The delay gate and the "frame not in frame_dict" skip are expressed as a
traced blend `use = in_dict * (iteration >= delay)` between the original and
corrected camera tensors — one compiled graph, same numerics."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gsavatar.smpl import lbs as smpl_lbs
from gsavatar.smpl.vitruvian import get_02v_bone_transforms_jax
from .subject import subject_const


class NoPoseCorrection(nn.Module):
    def __call__(self, camera, iteration):
        return camera, {}


class DirectPoseOptimization(nn.Module):
    smpl_consts: Any    # dict of jnp arrays: v_template (1,V,3), shapedirs,
                        # posedirs, J_regressor, lbs_weights; parents static
    init_root_orient: Any  # (Nf, 3) numpy init
    init_pose_body: Any    # (Nf, 63)
    init_pose_hand: Any    # (Nf, 6)
    init_trans: Any        # (Nf, 3)
    init_betas: Any        # (1, 10)
    delay: int = 0

    def _forward_smpl(self, betas, root_orient, pose_body, pose_hand, trans):
        # SMPL template tables through the 'subject' collection so a
        # multi-subject step can vary them per vmap lane; 'parents' (tree
        # topology) stays static — identical for every SMPL subject
        c = dict(self.smpl_consts)
        for k in ('v_template', 'shapedirs', 'posedirs', 'J_regressor',
                  'lbs_weights'):
            c[k] = subject_const(self, k, c[k])
        full_pose = jnp.concatenate([root_orient, pose_body, pose_hand],
                                    axis=-1)
        (verts, Jtrs_posed, Jtrs, A, _absA, v_posed, v_shaped,
         rot_mats) = smpl_lbs.lbs(
            betas, full_pose, c['v_template'], c['shapedirs'], c['posedirs'],
            c['J_regressor'], c['parents'], c['lbs_weights'])

        rots = jnp.concatenate(
            [jnp.eye(3).reshape(1, 1, 3, 3), rot_mats[:, 1:]], axis=1)
        rots = rots.reshape(1, -1, 9)

        tf_02v = get_02v_bone_transforms_jax(Jtrs[0])
        bone_transforms = A[0] @ jnp.linalg.inv(tf_02v)
        bone_transforms = bone_transforms.at[:, :3, 3].add(trans[0])

        v_shaped = jax.lax.stop_gradient(v_shaped)
        center = jnp.mean(v_shaped, axis=1)
        centered = v_shaped - center
        cano_max = centered.max()
        cano_min = centered.min()
        padding = (cano_max - cano_min) * 0.05
        Jn = Jtrs - center
        Jn = (Jn - cano_min + padding) / (cano_max - cano_min) / 1.1
        Jn = (Jn - 0.5) * 2.0

        verts_posed = verts + trans[None]
        return rots, Jn, bone_transforms, verts_posed, v_posed, Jtrs_posed

    @nn.compact
    def __call__(self, camera, iteration):
        nf = self.init_root_orient.shape[0]

        def mk(name, init):
            return self.param(name, lambda key: jnp.asarray(init, jnp.float32))

        root_orients = mk('root_orients', self.init_root_orient)
        pose_bodys = mk('pose_bodys', self.init_pose_body)
        pose_hands = mk('pose_hands', self.init_pose_hand)
        trans_all = mk('trans', self.init_trans)
        betas = mk('betas', self.init_betas)

        idx = camera.pose_idx.reshape(())
        res = self._forward_smpl(
            betas, root_orients[idx][None], pose_bodys[idx][None],
            pose_hands[idx][None], trans_all[idx][None])
        rots, Jtrs, bone_transforms, _, _, _ = res

        gate = (jnp.asarray(iteration, jnp.float32) >= self.delay).astype(
            jnp.float32) * camera.in_frame_dict
        rots_diff = camera.rots - rots
        loss_pose = gate * jnp.mean(rots_diff ** 2)

        blend = lambda new, old: gate * new + (1.0 - gate) * old
        updated = camera.replace(
            rots=blend(rots, camera.rots),
            Jtrs=blend(Jtrs, camera.Jtrs),
            bone_transforms=blend(bone_transforms, camera.bone_transforms))
        return updated, {'pose': loss_pose}


def get_pose_correction(cfg, metadata, assets=None):
    name = cfg.name
    if name == 'none':
        return NoPoseCorrection()
    if name == 'direct':
        assert assets is not None, "direct pose correction needs SMPL assets"
        consts = {
            'v_template': jnp.asarray(assets.v_template)[None],
            'shapedirs': jnp.asarray(assets.shapedirs),
            'posedirs': jnp.asarray(assets.posedirs),
            'J_regressor': jnp.asarray(assets.J_regressor),
            'lbs_weights': jnp.asarray(assets.skinning_weights),
            'parents': assets.parents,
        }
        return DirectPoseOptimization(
            smpl_consts=consts,
            init_root_orient=np.asarray(metadata['root_orient'], np.float32),
            init_pose_body=np.asarray(metadata['pose_body'], np.float32),
            init_pose_hand=np.asarray(metadata['pose_hand'], np.float32),
            init_trans=np.asarray(metadata['trans'], np.float32),
            init_betas=np.asarray(metadata['betas'], np.float32).reshape(1, -1),
            delay=cfg.get('delay', 0))
    raise ValueError(f"unknown pose correction: {name}")
