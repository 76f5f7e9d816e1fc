"""Color decoding ("texture"): SH or latent MLP.

Parity: models/texture/texture.py of the reference.
  * SH2RGB (texture.py:17-38): evaluate SH at per-gaussian view directions,
    optionally rotated into the canonical frame by R_bwd = R_fwd^T from the
    stashed LBS transform, with train-time random view-noise rotations.
  * ColorMLP (texture.py:40-125): per-gaussian feature ++ optional xyz / cov /
    quasi-normal ++ SH-basis-embedded canonical view dir ++ non-rigid feature
    ++ per-frame latent -> CondMLP -> sigmoid RGB.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gsavatar.core.gaussians import Gaussians
from gsavatar.ops import sh as sh_ops
from gsavatar.utils import transforms as T
from .mlp import VanillaCondMLP
from .subject import subject_const


def _view_dirs(gaussians: Gaussians, camera, cano_view_dir: bool,
               view_noise_rot=None):
    """Per-gaussian unit view directions, optionally canonicalized
    (texture.py:23-35). `view_noise_rot` is a (3,3) rotation or None."""
    dir_pp = gaussians.get_xyz - camera.camera_center[None, :]
    # identity rigid deformer leaves no fwd transform: canonical == posed
    if cano_view_dir and gaussians.fwd_transform is not None:
        R_bwd = jnp.swapaxes(gaussians.fwd_transform[:, :3, :3], 1, 2)
        dir_pp = T.matvec3(R_bwd, dir_pp)
        if view_noise_rot is not None:
            # reference multiplies by the transposed noise matrix;
            # elementwise form (transforms.matvec3 rationale): one shared
            # (3,3) against (N,3) is still a per-point tiny dot on TPU
            dir_pp = (dir_pp[..., :, None] * view_noise_rot[None]).sum(-2)
    return dir_pp / (jnp.linalg.norm(dir_pp, axis=1, keepdims=True) + 1e-12)


class SH2RGB(nn.Module):
    cano_view_dir: bool = False

    def __call__(self, gaussians: Gaussians, camera, latent_idx=None,
                 view_noise_rot=None):
        feats = gaussians.get_features                    # (N, coeffs, 3)
        shs = jnp.swapaxes(feats, 1, 2)                   # (N, 3, coeffs)
        dirs = _view_dirs(gaussians, camera, self.cano_view_dir,
                          view_noise_rot)
        rgb = sh_ops.eval_sh(gaussians.active_sh_degree, shs, dirs)
        return jnp.maximum(rgb + 0.5, 0.0)


class ColorMLP(nn.Module):
    feature_dim: int = 32
    use_xyz: bool = False
    use_cov: bool = False
    use_normal: bool = False
    sh_degree: int = 3
    cano_view_dir: bool = True
    non_rigid_dim: int = 16
    latent_dim: int = 16
    n_frames: int = 1
    aabb: Any = None
    mlp_cfg: dict = None

    @nn.compact
    def __call__(self, gaussians: Gaussians, camera, latent_idx,
                 view_noise_rot=None):
        feats = gaussians.get_features[..., 0]            # (N, feature_dim)
        n = feats.shape[0]
        parts = [feats]
        if self.use_xyz:
            aabb = subject_const(self, 'aabb', self.aabb)
            parts.append(aabb.normalize(gaussians.get_xyz, sym=True))
        if self.use_cov:
            parts.append(gaussians.get_covariance())
        if self.use_normal:
            rot = T.quat_to_rotmat(gaussians.params.rotation)
            amin = jnp.argmin(gaussians.params.scaling, axis=1)
            normal = jnp.take_along_axis(
                rot, amin[:, None, None].repeat(3, 1), axis=2)[..., 0]
            parts.append(normal)
        if self.sh_degree > 0:
            dirs = _view_dirs(gaussians, camera, self.cano_view_dir,
                              view_noise_rot)
            parts.append(sh_ops.eval_sh_bases(self.sh_degree, dirs)[:, 1:])
        if self.non_rigid_dim > 0:
            assert gaussians.non_rigid_feature is not None
            parts.append(gaussians.non_rigid_feature)
        if self.latent_dim > 0:
            latent = nn.Embed(self.n_frames, self.latent_dim,
                              embedding_init=nn.initializers.normal(1.0),
                              name="latent")(latent_idx.reshape(1))
            parts.append(jnp.broadcast_to(latent.reshape(1, -1),
                                          (n, self.latent_dim)))
        x = jnp.concatenate(parts, axis=1)
        cfg = self.mlp_cfg or {}
        out = VanillaCondMLP(
            dim_in=x.shape[-1], dim_cond=0, dim_out=3,
            n_neurons=cfg.get('n_neurons', 64),
            n_hidden_layers=cfg.get('n_hidden_layers', 2),
            skip_in=tuple(cfg.get('skip_in', ())),
            cond_in=tuple(cfg.get('cond_in', ())),
            multires=cfg.get('multires', 0), name="mlp")(x)
        return jax.nn.sigmoid(out)


def get_texture(cfg, metadata):
    name = cfg.name
    if name in ('sh2rgb', 'sh'):
        return SH2RGB(cano_view_dir=cfg.get('cano_view_dir', False))
    if name == 'mlp':
        n_frames = max(len(metadata.get('frame_dict') or {}), 1)
        return ColorMLP(
            feature_dim=cfg.feature_dim, use_xyz=cfg.get('use_xyz', False),
            use_cov=cfg.get('use_cov', False),
            use_normal=cfg.get('use_normal', False),
            sh_degree=cfg.get('sh_degree', 0),
            cano_view_dir=cfg.get('cano_view_dir', False),
            non_rigid_dim=cfg.get('non_rigid_dim', 0),
            latent_dim=cfg.get('latent_dim', 0), n_frames=n_frames,
            aabb=metadata.get('aabb'),
            mlp_cfg=dict(cfg.get('mlp', {}) or {}))
    raise ValueError(f"unknown texture: {name}")
