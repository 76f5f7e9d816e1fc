"""Rigid (forward-LBS) deformers: canonical Vitruvian space -> posed space.

Parity: models/deformer/rigid.py of the reference. Variants:
  * identity        — single-frame reconstruction no-op (rigid.py:24-33)
  * smpl_nn         — skinning weights copied from the nearest SMPL vertex
                      (rigid.py:35-74; pytorch3d knn -> gsavatar.ops.knn)
  * skinning_field  — MLP R^3 -> 25 logits + hierarchical softmax over the
                      SMPL tree (rigid.py:84-129), optional distillation into
                      a (24, d, h, w) voxel sampled trilinearly
                      (rigid.py:140-171)
All forward paths build per-point T_fwd = sum_j w_j B_j, move xyz, premultiply
the rotation (stored as rotation_precomp), and stash a stop-gradient copy of
T_fwd for canonical view-dir computation (rigid.py:215-236)."""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gsavatar.core.gaussians import Gaussians
from gsavatar.ops import knn
from gsavatar.ops.interp import grid_sample_3d
from gsavatar.utils import transforms as T
from .mlp import VanillaCondMLP
from .subject import subject_const


def hierarchical_softmax(x):
    """(N, 25) logits -> (N, 24) probabilities walking the SMPL kinematic
    tree (rigid.py:84-129). Functional rewrite of the in-place torch version:
    identical products of sigmoids/softmaxes along each chain."""
    sig = jax.nn.sigmoid(x)
    prob = jnp.ones((x.shape[0], 24), x.dtype)

    def smax(cols):
        return jax.nn.softmax(x[:, cols], axis=-1)

    p = {}
    base123 = sig[:, 0:1] * smax([1, 2, 3])
    p[0] = 1.0 - sig[:, 0]
    p[1], p[2], p[3] = base123[:, 0], base123[:, 1], base123[:, 2]

    for child, parent in ((4, 1), (5, 2), (6, 3)):
        p[child] = p[parent] * sig[:, child]
        p[parent] = p[parent] * (1 - sig[:, child])
    for child, parent in ((7, 4), (8, 5), (9, 6)):
        p[child] = p[parent] * sig[:, child]
        p[parent] = p[parent] * (1 - sig[:, child])
    for child, parent in ((10, 7), (11, 8)):
        p[child] = p[parent] * sig[:, child]
        p[parent] = p[parent] * (1 - sig[:, child])
    up = p[9] * sig[:, 24]
    s121314 = smax([12, 13, 14])
    p[12], p[13], p[14] = up * s121314[:, 0], up * s121314[:, 1], up * s121314[:, 2]
    p[9] = p[9] * (1 - sig[:, 24])
    p[15] = p[12] * sig[:, 15]
    p[12] = p[12] * (1 - sig[:, 15])
    for child, parent in ((16, 13), (17, 14), (18, 16), (19, 17),
                          (20, 18), (21, 19), (22, 20), (23, 21)):
        p[child] = p[parent] * sig[:, child]
        p[parent] = p[parent] * (1 - sig[:, child])

    for j in range(24):
        prob = prob.at[:, j].set(p[j])
    return prob


def _apply_fwd_transform(gaussians: Gaussians, T_fwd) -> Gaussians:
    """Move xyz and premultiply rotations by the per-point LBS transform.
    Elementwise tiny-matmul forms (transforms.matvec3/matmul3): the `@`
    versions cost bf16 casts + layout copies per site on TPU."""
    xyz = gaussians.get_xyz
    x_bar = T.matvec3(T_fwd[:, :3, :3], xyz) + T_fwd[:, :3, 3]
    rotation_hat = T.quat_to_rotmat(gaussians.params.rotation)
    rotation_bar = T.matmul3(T_fwd[:, :3, :3], rotation_hat)
    return gaussians.replace(
        params=gaussians.params.replace(xyz=x_bar),
        rotation_precomp=rotation_bar,
        fwd_transform=jax.lax.stop_gradient(T_fwd))


class IdentityRigid(nn.Module):
    def __call__(self, gaussians: Gaussians, camera, iteration) -> Gaussians:
        return gaussians


class SMPLNN(nn.Module):
    """Nearest-SMPL-vertex skinning. The canonical SMPL verts/weights come in
    as constants (metadata)."""
    smpl_verts: Any      # (V, 3) jnp
    skinning_weights: Any  # (V, 24) jnp

    @nn.compact
    def __call__(self, gaussians: Gaussians, camera, iteration) -> Gaussians:
        xyz = gaussians.get_xyz
        verts = subject_const(self, 'smpl_verts', self.smpl_verts)
        weights = subject_const(self, 'skinning_weights',
                                self.skinning_weights)
        idx = knn.nn_index(xyz, verts)
        pts_W = weights[idx]                                  # (N, 24)
        B = camera.bone_transforms.reshape(-1, 16)            # (24, 16)
        T_fwd = (pts_W @ B).reshape(-1, 4, 4)
        return _apply_fwd_transform(gaussians, T_fwd)


class SkinningField(nn.Module):
    """Learned skinning field with hierarchical softmax; optional voxel
    distillation (cfg.distill)."""
    aabb: Any
    d_out: int = 25
    soft_blend: float = 20.0
    distill: bool = False
    res: int = 64
    z_ratio: int = 4
    n_neurons: int = 128
    n_hidden_layers: int = 4
    multires: int = 0

    def setup(self):
        self.lbs_network = VanillaCondMLP(
            dim_in=3, dim_cond=0, dim_out=self.d_out,
            n_neurons=self.n_neurons, n_hidden_layers=self.n_hidden_layers,
            multires=self.multires, name="lbs_network")
        # setup-style module: variables must be declared here, not in
        # __call__ (flax rule); the read still goes through subject_const's
        # has_variable path
        if self.is_mutable_collection('subject') \
                and not self.has_variable('subject', 'aabb'):
            import jax as _jax
            self.variable('subject', 'aabb',
                          lambda: _jax.tree.map(jnp.asarray, self.aabb))

    def _softmax(self, logits):
        if logits.shape[-1] == 25:
            return hierarchical_softmax(logits)
        return jax.nn.softmax(logits, axis=-1)

    def _voxel(self):
        d = self.res // self.z_ratio
        h = w = self.res
        zs = jnp.linspace(-1, 1, d)
        ys = jnp.linspace(-1, 1, h)
        xs = jnp.linspace(-1, 1, w)
        Z, Y, X = jnp.meshgrid(zs, ys, xs, indexing='ij')
        grid = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)
        logits = self.lbs_network(grid) * self.soft_blend
        wts = self._softmax(logits)                       # (d*h*w, 24)
        return wts.T.reshape(24, d, h, w)

    def query_weights(self, xyz_norm):
        """(N, 3) normalized coords -> (N, 24) skinning weights."""
        if self.distill:
            vox = self._voxel()
            return grid_sample_3d(vox, xyz_norm)
        logits = self.lbs_network(xyz_norm) * self.soft_blend
        return self._softmax(logits)

    def __call__(self, gaussians: Gaussians, camera, iteration) -> Gaussians:
        aabb = subject_const(self, 'aabb', self.aabb)
        xyz_norm = aabb.normalize(gaussians.get_xyz, sym=True)
        pts_W = self.query_weights(xyz_norm)
        B = camera.bone_transforms.reshape(-1, 16)
        T_fwd = (pts_W @ B).reshape(-1, 4, 4)
        return _apply_fwd_transform(gaussians, T_fwd)

    def skinning_loss(self, pts_norm, gt_weights):
        """MSE between predicted field and GT SMPL weights at surface samples
        (rigid.py:198-212): sum over joints, mean over points."""
        pred = self.query_weights(pts_norm)
        return jnp.mean(jnp.sum((pred - gt_weights) ** 2, axis=-1))


def get_rigid(cfg, metadata):
    name = cfg.name
    if name == 'identity':
        return IdentityRigid()
    if name == 'smpl_nn':
        return SMPLNN(smpl_verts=jnp.asarray(metadata['smpl_verts']),
                      skinning_weights=jnp.asarray(metadata['skinning_weights']))
    if name == 'skinning_field':
        net = cfg.skinning_network
        return SkinningField(
            aabb=metadata['aabb'], d_out=cfg.get('d_out', 25),
            soft_blend=cfg.get('soft_blend', 20),
            distill=cfg.get('distill', False), res=cfg.get('res', 64),
            z_ratio=cfg.get('z_ratio', 4), n_neurons=net.n_neurons,
            n_hidden_layers=net.n_hidden_layers,
            multires=net.get('multires', 0))
    raise ValueError(f"unknown rigid deformer: {name}")
