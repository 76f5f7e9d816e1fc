"""Non-rigid (pose-conditioned) canonical-space deformers.

Parity: models/deformer/non_rigid.py of the reference. Variants: identity /
mlp / hannw_mlp / hashgrid, selected by cfg.name (non_rigid.py:302-310).
Offset semantics (non_rigid.py:89-116): xyz additive; scale offset modes
logit|exp|zero; rotation offset modes add | quaternion-mult with the delta's
w pinned to 1. Regularizers nr_xyz (L2) / nr_scale / nr_rot (L1).

Delay gating: the reference returns an untouched clone before cfg.delay
(non_rigid.py:57-61). Here the module always runs and the deltas are
multiplied by a traced gate (iteration >= delay) — numerically identical
(zero deltas == no-op for every offset mode) and keeps one compiled graph for
the whole schedule."""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from gsavatar.core.gaussians import Gaussians
from gsavatar.utils import transforms as T
from .hashgrid import HashGrid
from .mlp import HannwCondMLP, VanillaCondMLP
from .pose_encoder import HierarchicalPoseEncoder
from .subject import subject_const


def _apply_deltas(gaussians: Gaussians, delta_xyz, delta_scale, delta_rot,
                  scale_offset: str, rot_offset: str, gate):
    p = gaussians.params
    delta_xyz = gate * delta_xyz
    new_xyz = p.xyz + delta_xyz

    if scale_offset == 'logit':
        delta_scale = gate * delta_scale
        new_scaling = p.scaling + delta_scale
    elif scale_offset == 'exp':
        delta_scale = gate * delta_scale
        new_scaling = jnp.log(jnp.maximum(jnp.exp(p.scaling) + delta_scale,
                                          1e-6))
    elif scale_offset == 'zero':
        delta_scale = jnp.zeros_like(delta_scale)
        new_scaling = p.scaling
    else:
        raise ValueError(scale_offset)

    if rot_offset == 'add':
        delta_rot = gate * delta_rot
        new_rotation = p.rotation + delta_rot
    elif rot_offset == 'mult':
        q1 = delta_rot.at[:, 0].set(1.0)
        # gate==0 -> identity quaternion [1,0,0,0]
        q1 = q1.at[:, 1:].multiply(gate)
        delta_rot = q1[:, 1:]  # the regularized part (non_rigid.py:109-111)
        new_rotation = T.quat_multiply(q1, p.rotation)
    else:
        raise ValueError(rot_offset)

    out = gaussians.replace(params=p.replace(
        xyz=new_xyz, scaling=new_scaling, rotation=new_rotation))
    return out, delta_xyz, delta_scale, delta_rot


def _reg(delta_xyz, delta_scale, delta_rot, alive):
    """Mean over alive slots only (the reference has no dead slots).
    The L2 norm uses an epsilon so its gradient is defined at exactly-zero
    deltas (the delay gate multiplies deltas by 0 — a bare norm would
    backprop NaN even under a zero loss weight)."""
    n = jnp.maximum(jnp.sum(alive), 1.0)
    m = alive
    l2 = jnp.sqrt(jnp.sum(delta_xyz * delta_xyz, axis=1) + 1e-20)
    return {
        'nr_xyz': jnp.sum(m * l2) / n,
        'nr_scale': jnp.sum(m * jnp.sum(jnp.abs(delta_scale), axis=1)) / n,
        'nr_rot': jnp.sum(m * jnp.sum(jnp.abs(delta_rot), axis=1)) / n,
    }


class IdentityNonRigid(nn.Module):
    feature_dim: int = 0

    def __call__(self, gaussians: Gaussians, camera, iteration,
                 latent_idx, nr_cache=None):
        if self.feature_dim > 0:
            n = gaussians.params.xyz.shape[0]
            gaussians = gaussians.replace(
                non_rigid_feature=jnp.zeros((n, self.feature_dim)))
        return gaussians, {}


class _CondDeformBase(nn.Module):
    """Shared latent/pose-conditioning plumbing for mlp & hashgrid variants."""
    aabb: Any = None
    latent_dim: int = 0
    n_frames: int = 1
    feature_dim: int = 0
    delay: int = 0
    scale_offset: str = 'logit'
    rot_offset: str = 'mult'
    pose_encoder_cfg: dict = None

    def _aabb(self):
        """Canonical AABB through the 'subject' collection (subject.py) so
        multi-subject steps can vary it per vmap lane."""
        return subject_const(self, 'aabb', self.aabb)

    def _pose_feat(self, camera, latent_idx):
        cfg = self.pose_encoder_cfg or {}
        enc = HierarchicalPoseEncoder(
            num_joints=cfg.get('num_joints', 24),
            rel_joints=cfg.get('rel_joints', False),
            dim_per_joint=cfg.get('dim_per_joint', 6),
            out_dim=cfg.get('out_dim', -1), name="pose_encoder")
        feat = enc(camera.rots, camera.Jtrs)          # (1, D)
        if self.latent_dim > 0:
            latent = nn.Embed(self.n_frames, self.latent_dim,
                              embedding_init=nn.initializers.normal(1.0),
                              name="latent")(latent_idx.reshape(1))
            feat = jnp.concatenate([feat, latent.reshape(1, -1)], axis=1)
        return feat

    def _finish(self, gaussians, deltas, iteration):
        gate = (jnp.asarray(iteration, jnp.float32) >= self.delay).astype(
            jnp.float32)
        delta_xyz = deltas[:, :3]
        delta_scale = deltas[:, 3:6]
        delta_rot = deltas[:, 6:10]
        out, dx, ds, dr = _apply_deltas(
            gaussians, delta_xyz, delta_scale, delta_rot,
            self.scale_offset, self.rot_offset, gate)
        if self.feature_dim > 0:
            out = out.replace(non_rigid_feature=gate * deltas[:, 10:])
        alive = gaussians.alive.astype(jnp.float32)
        return out, _reg(dx, ds, dr, alive)


class MLPNonRigid(_CondDeformBase):
    mlp_cfg: dict = None

    @nn.compact
    def __call__(self, gaussians: Gaussians, camera, iteration, latent_idx,
                 nr_cache=None):
        pose_feat = self._pose_feat(camera, latent_idx)
        xyz_norm = self._aabb().normalize(gaussians.get_xyz, sym=True)
        cfg = self.mlp_cfg
        d_out = 10 + self.feature_dim
        d_cond = pose_feat.shape[-1]
        deltas = VanillaCondMLP(
            dim_in=3, dim_cond=d_cond, dim_out=d_out,
            n_neurons=cfg['n_neurons'], n_hidden_layers=cfg['n_hidden_layers'],
            skip_in=tuple(cfg.get('skip_in', ())),
            cond_in=tuple(cfg.get('cond_in', ())),
            multires=cfg.get('multires', 0),
            last_layer_init=cfg.get('last_layer_init', False),
            name="mlp")(xyz_norm, cond=pose_feat)
        return self._finish(gaussians, deltas, iteration)


def make_hashgrid(hg: dict, name='hashgrid') -> HashGrid:
    """Module-level factory: also used with name=None OUTSIDE any module
    scope by the eval-time encoding cache, which applies the grid directly
    on the 'hashgrid' param subtree (models/converter.compute_nr_cache)."""
    return HashGrid(
        n_levels=hg.get('n_levels', 16),
        n_features_per_level=hg.get('n_features_per_level', 2),
        log2_hashmap_size=hg.get('log2_hashmap_size', 16),
        base_resolution=hg.get('base_resolution', 16),
        max_resolution=hg.get('max_resolution', 2048),
        per_level_scale=hg.get('per_level_scale', 0.0),
        name=name)


class HashGridNonRigid(_CondDeformBase):
    mlp_cfg: dict = None
    hashgrid_cfg: dict = None

    @nn.compact
    def __call__(self, gaussians: Gaussians, camera, iteration, latent_idx,
                 nr_cache=None):
        pose_feat = self._pose_feat(camera, latent_idx)
        if nr_cache is not None:
            # eval fast path: the grid encodes CANONICAL positions, which
            # are frozen outside training — the caller precomputes the
            # encoding once per avatar (models/converter.compute_nr_cache)
            # and the per-frame render skips the 7M-row table gathers that
            # dominate inference time. NOTE: the hashgrid submodule is not
            # constructed on this path, so it must never be taken under
            # module init.
            feature = nr_cache
        else:
            xyz_norm = self._aabb().normalize(gaussians.get_xyz, sym=True)
            feature = make_hashgrid(self.hashgrid_cfg)(xyz_norm)
        cfg = self.mlp_cfg
        d_out = 10 + self.feature_dim
        deltas = VanillaCondMLP(
            dim_in=feature.shape[-1], dim_cond=pose_feat.shape[-1],
            dim_out=d_out, n_neurons=cfg['n_neurons'],
            n_hidden_layers=cfg['n_hidden_layers'],
            skip_in=tuple(cfg.get('skip_in', ())),
            cond_in=tuple(cfg.get('cond_in', ())),
            multires=cfg.get('multires', 0),
            last_layer_init=cfg.get('last_layer_init', False),
            name="mlp")(feature, cond=pose_feat)
        return self._finish(gaussians, deltas, iteration)


class HannwMLPNonRigid(_CondDeformBase):
    """Hann-window annealed variant (non_rigid.py:134-201): deltas zeroed
    before kick_in_iter, rot_offset default 'add'."""
    mlp_cfg: dict = None
    kick_in_iter: int = 3000
    full_band_iter: int = 10000

    @nn.compact
    def __call__(self, gaussians: Gaussians, camera, iteration, latent_idx,
                 nr_cache=None):
        pose_feat = self._pose_feat(camera, latent_idx)
        xyz_norm = self._aabb().normalize(gaussians.get_xyz, sym=True)
        cfg = self.mlp_cfg
        deltas = HannwCondMLP(
            dim_in=3, dim_cond=pose_feat.shape[-1], dim_out=10,
            n_neurons=cfg['n_neurons'], n_hidden_layers=cfg['n_hidden_layers'],
            kick_in_iter=self.kick_in_iter, full_band_iter=self.full_band_iter,
            skip_in=tuple(cfg.get('skip_in', ())),
            cond_in=tuple(cfg.get('cond_in', ())),
            multires=cfg.get('multires', 0),
            name="mlp")(xyz_norm, iteration, cond=pose_feat)
        gate = (jnp.asarray(iteration, jnp.float32)
                >= self.kick_in_iter).astype(jnp.float32)
        deltas = deltas * gate
        delta_xyz = deltas[:, :3]
        delta_scale = deltas[:, 3:6]
        delta_rot = deltas[:, -4:]
        out, dx, ds, dr = _apply_deltas(
            gaussians, delta_xyz, delta_scale, delta_rot,
            self.scale_offset, self.rot_offset, 1.0)
        alive = gaussians.alive.astype(jnp.float32)
        return out, _reg(dx, ds, dr, alive)


def get_non_rigid(cfg, metadata):
    name = cfg.name
    n_frames = max(len(metadata.get('frame_dict') or {}), 1)
    common = dict(aabb=metadata.get('aabb'),
                  latent_dim=cfg.get('latent_dim', 0), n_frames=n_frames,
                  feature_dim=cfg.get('feature_dim', 0),
                  delay=cfg.get('delay', 0),
                  scale_offset=cfg.get('scale_offset', 'logit'),
                  rot_offset=cfg.get('rot_offset', 'add'),
                  pose_encoder_cfg=dict(cfg.get('pose_encoder', {}) or {}))
    if name == 'identity':
        return IdentityNonRigid(feature_dim=cfg.get('feature_dim', 0))
    if name == 'mlp':
        return MLPNonRigid(mlp_cfg=dict(cfg.mlp), **common)
    if name == 'hashgrid':
        return HashGridNonRigid(mlp_cfg=dict(cfg.mlp),
                                hashgrid_cfg=dict(cfg.hashgrid), **common)
    if name == 'hannw_mlp':
        emb = cfg.mlp.embedder
        return HannwMLPNonRigid(mlp_cfg=dict(cfg.mlp),
                                kick_in_iter=emb.kick_in_iter,
                                full_band_iter=emb.full_band_iter, **common)
    raise ValueError(f"unknown non-rigid deformer: {name}")
