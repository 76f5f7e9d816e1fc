"""GaussianConverter — the composed avatar model stack.

Parity: models/gaussian_converter.py + models/deformer/deformer.py of the
reference: pose correction mutates the camera, optional pose-noise
augmentation (prob 0.5, N(0, pose_noise) on camera.rots — gaussian_converter
.py:47-50), non-rigid then rigid deformation, then color decoding. Returns
(deformed gaussians, regularization losses, precomputed colors)."""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gsavatar.core.gaussians import Gaussians
from gsavatar.utils.transforms import augm_rot_matrix
from .non_rigid import get_non_rigid
from .pose_correction import get_pose_correction
from .rigid import get_rigid
from .texture import get_texture


class GaussianConverter(nn.Module):
    pose_correction: nn.Module
    non_rigid: nn.Module
    rigid: nn.Module
    texture: nn.Module
    pose_noise: float = 0.0
    view_noise: float = 0.0

    def __call__(self, gaussians: Gaussians, camera, iteration, *,
                 train: bool = False, rng: Optional[jax.Array] = None,
                 nr_cache=None):
        loss_reg = {}
        camera, loss_pose = self.pose_correction(camera, iteration)
        loss_reg.update(loss_pose)

        view_noise_rot = None
        if train and rng is not None:
            k_gate, k_noise, k_view = jax.random.split(rng, 3)
            if self.pose_noise > 0:
                apply = (jax.random.uniform(k_gate) <= 0.5).astype(jnp.float32)
                noise = jax.random.normal(k_noise, camera.rots.shape) \
                    * self.pose_noise
                camera = camera.replace(rots=camera.rots + apply * noise)
            if self.view_noise > 0:
                view_noise_rot = augm_rot_matrix(
                    k_view, self.view_noise, self.view_noise,
                    self.view_noise).T

        deformed, loss_nr = self.non_rigid(gaussians, camera, iteration,
                                           camera.latent_idx,
                                           nr_cache=nr_cache)
        loss_reg.update(loss_nr)
        deformed = self.rigid(deformed, camera, iteration)

        colors = self.texture(deformed, camera, camera.latent_idx,
                              view_noise_rot=view_noise_rot)
        return deformed, loss_reg, colors

    def skinning_loss(self, pts_norm, gt_weights):
        """Skinning-field distillation loss (scene/__init__.py:81-84); zero
        for rigid variants without a learned field."""
        if hasattr(self.rigid, 'skinning_loss'):
            return self.rigid.skinning_loss(pts_norm, gt_weights)
        return jnp.zeros(())


def compute_nr_cache(converter: GaussianConverter, conv_params, gaussians):
    """Precompute the pose-independent part of the non-rigid deformer: the
    hash grid encodes CANONICAL gaussian positions, which are frozen outside
    training — so at eval time the encoding is constant across frames and
    the per-frame render can skip the multi-million-row table gathers that
    dominate inference cost (PERF.md). Returns (N, L*F) for the hashgrid
    variant, None otherwise (other variants have no cacheable stage)."""
    from .non_rigid import HashGridNonRigid, make_hashgrid
    nr = converter.non_rigid
    if not isinstance(nr, HashGridNonRigid):
        return None
    xyz_norm = nr.aabb.normalize(gaussians.get_xyz, sym=True)
    params = conv_params['params']['non_rigid']['hashgrid']
    return make_hashgrid(nr.hashgrid_cfg, name=None).apply(
        {'params': params}, xyz_norm)


def build_converter(cfg, metadata, assets=None) -> GaussianConverter:
    """Assemble from a full config (cfg.model.*, cfg.pipeline.*)."""
    model = cfg.model
    return GaussianConverter(
        pose_correction=get_pose_correction(model.pose_correction, metadata,
                                            assets=assets),
        non_rigid=get_non_rigid(model.deformer.non_rigid, metadata),
        rigid=get_rigid(model.deformer.rigid, metadata),
        texture=get_texture(model.texture, metadata),
        pose_noise=cfg.pipeline.get('pose_noise', 0.0),
        view_noise=model.texture.get('view_noise', 0.0))
