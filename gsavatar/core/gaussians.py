"""Fixed-capacity Gaussian arena.

Parity target: scene/gaussian_model.py of the reference — parameters,
activations, covariance, init from point cloud, SH-degree ramp — redesigned
for XLA: instead of reallocating tensors on every densify/prune (fatal
recompiles on TPU), the arena preallocates `capacity` slots plus an `alive`
mask; clone/split/prune in core/densify.py write into free slots with
fixed-shape scatters. The Adam moments live alongside in the same arena (see
core/optim.py) so the reference's optimizer-state surgery
(gaussian_model.py:311-380) becomes a masked zeroing.

Color modes (gaussian_model.py:39-53): use_sh -> features_dc (N,1,3) +
features_rest (N,(deg+1)^2-1,3); feature mode -> features_dc (N,1,1) +
features_rest (N,feature_dim-1,1), concatenated to a (N,feature_dim) vector.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gsavatar.ops import knn, sh
from gsavatar.utils import transforms as T


@struct.dataclass
class GaussianParams:
    """Learnable arena tensors (raw / pre-activation)."""
    xyz: Any            # (N, 3)
    features_dc: Any    # (N, 1, C)
    features_rest: Any  # (N, R, C)
    scaling: Any        # (N, 3) log-scale
    rotation: Any       # (N, 4) unnormalized quaternion wxyz
    opacity: Any        # (N, 1) logit


K_NEIGHBORS = 5  # AIAP neighbor count (utils/loss_utils.py:76 K=5)


@struct.dataclass
class GaussianAux:
    """Non-learnable arena state (densification bookkeeping + cached AIAP
    neighbor indices — recomputed on the densify cadence instead of per
    iteration; canonical positions drift slowly between refreshes and the
    loss gradient never flows through the indices, so this is a
    quality-neutral 10x saving on the per-step KNN)."""
    alive: Any               # (N,) bool
    max_radii2d: Any         # (N,) f32
    xyz_gradient_accum: Any  # (N,) f32
    denom: Any               # (N,) f32
    nn_ix: Any               # (N, K_NEIGHBORS) int32 cached AIAP neighbors


@struct.dataclass
class Gaussians:
    """A (possibly deformed) view of the arena as fed to the renderer.

    Mirrors the reference's `gaussians.clone()` forward-pass object
    (gaussian_model.py:68-96): deformers functionally replace fields and can
    attach `rotation_precomp` (posed rotation matrices) / `fwd_transform` /
    `non_rigid_feature`."""
    params: GaussianParams
    alive: Any
    rotation_precomp: Optional[Any] = None   # (N, 3, 3)
    fwd_transform: Optional[Any] = None      # (N, 4, 4), stop-gradient
    non_rigid_feature: Optional[Any] = None  # (N, F)
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)
    use_sh: bool = struct.field(pytree_node=False, default=True)

    # --- activations (gaussian_model.py:61-66) ---
    @property
    def get_xyz(self):
        return self.params.xyz

    @property
    def get_scaling(self):
        return jnp.exp(self.params.scaling)

    @property
    def get_rotation(self):
        return T.quat_normalize(self.params.rotation)

    @property
    def get_opacity(self):
        return jax.nn.sigmoid(self.params.opacity)

    @property
    def get_features(self):
        return jnp.concatenate([self.params.features_dc,
                                self.params.features_rest], axis=1)

    def get_covariance(self, scaling_modifier=1.0):
        rot = (self.rotation_precomp if self.rotation_precomp is not None
               else self.params.rotation)
        return T.covariance_from_scaling_rotation(
            self.get_scaling, scaling_modifier, rot)

    @property
    def n_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))


def num_sh_coeffs(sh_degree: int) -> int:
    return (sh_degree + 1) ** 2


def empty_params(capacity: int, use_sh: bool, sh_degree: int = 3,
                 feature_dim: int = 32) -> GaussianParams:
    if use_sh:
        rest, ch = num_sh_coeffs(sh_degree) - 1, 3
    else:
        rest, ch = feature_dim - 1, 1
    z = jnp.zeros
    return GaussianParams(
        xyz=z((capacity, 3)), features_dc=z((capacity, 1, ch)),
        features_rest=z((capacity, rest, ch)), scaling=z((capacity, 3)),
        rotation=z((capacity, 4)).at[:, 0].set(1.0), opacity=z((capacity, 1)))


def empty_aux(capacity: int) -> GaussianAux:
    z = jnp.zeros
    return GaussianAux(alive=jnp.zeros(capacity, bool),
                       max_radii2d=z(capacity),
                       xyz_gradient_accum=z(capacity), denom=z(capacity),
                       nn_ix=jnp.zeros((capacity, K_NEIGHBORS), jnp.int32))


def create_from_pcd(points: np.ndarray, colors: np.ndarray, capacity: int,
                    use_sh: bool, sh_degree: int = 3, feature_dim: int = 32):
    """Seed the arena from a point cloud (gaussian_model.py:172-199):
    RGB -> SH DC, log(sqrt(mean 3-NN sq dist)) scales, identity rotations,
    opacity logit of 0.1."""
    n = points.shape[0]
    assert n <= capacity, (n, capacity)
    params = empty_params(capacity, use_sh, sh_degree, feature_dim)
    aux = empty_aux(capacity)

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(knn.mean_dist3(pts), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    opacity = T.inverse_sigmoid(0.1 * jnp.ones((n, 1)))

    params = params.replace(
        xyz=params.xyz.at[:n].set(pts),
        scaling=params.scaling.at[:n].set(scales),
        opacity=params.opacity.at[:n].set(opacity))
    if use_sh:
        dc = sh.rgb_to_sh(jnp.asarray(colors, jnp.float32))  # (n, 3)
        params = params.replace(
            features_dc=params.features_dc.at[:n, 0].set(dc))
    aux = aux.replace(
        alive=aux.alive.at[:n].set(True),
        nn_ix=aux.nn_ix.at[:n].set(knn.knn_self(pts, K_NEIGHBORS)))
    return params, aux


def make_view(params: GaussianParams, aux: GaussianAux, *, active_sh_degree=0,
              max_sh_degree=3, use_sh=True, bucket: int = 0) -> Gaussians:
    """`bucket` > 0 slices the alive-prefix (see densify compaction) so every
    downstream stage runs over ~n_alive rows instead of capacity."""
    alive = aux.alive
    if bucket:
        params = jax.tree.map(lambda x: x[:bucket], params)
        alive = alive[:bucket]
    return Gaussians(params=params, alive=alive,
                     active_sh_degree=active_sh_degree,
                     max_sh_degree=max_sh_degree, use_sh=use_sh)
