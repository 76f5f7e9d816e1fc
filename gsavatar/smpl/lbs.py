"""SMPL linear blend skinning — pure JAX.

Parity: models/pose_correction/lbs.py:34-263 of the reference (SMPL-X lineage
math). The kinematic-chain walk over the 24 fixed parents is unrolled in
Python (static tree, traced once); everything else is batched matmuls that
map straight onto the MXU."""
from __future__ import annotations

import jax.numpy as jnp

from gsavatar.utils.transforms import rodrigues as rodrigues_batch


def blend_shapes(betas, shape_disps):
    """betas (B, nb), shape_disps (V, 3, nb) -> (B, V, 3)."""
    return jnp.einsum('bl,mkl->bmk', betas, shape_disps)


def vertices_to_joints(J_regressor, vertices):
    """J_regressor (J, V), vertices (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum('bik,ji->bjk', vertices, J_regressor)


def _transform_mat(R, t):
    """R (..., 3, 3), t (..., 3, 1) -> (..., 4, 4)."""
    pad_R = jnp.concatenate([R, jnp.zeros_like(R[..., :1, :])], axis=-2)
    pad_t = jnp.concatenate([t, jnp.ones_like(t[..., :1, :])], axis=-2)
    return jnp.concatenate([pad_R, pad_t], axis=-1)


def batch_rigid_transform(rot_mats, joints, parents):
    """Walk the kinematic tree.

    rot_mats (B, J, 3, 3), joints (B, J, 3), parents: static int sequence.
    Returns (posed_joints (B,J,3), rel_transforms (B,J,4,4), abs (B,J,4,4)).
    """
    parents = [int(p) for p in parents]
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, parents[1:]]], axis=1)
    transforms_mat = _transform_mat(rot_mats, rel_joints[..., None])

    chain = [transforms_mat[:, 0]]
    for i in range(1, len(parents)):
        chain.append(chain[parents[i]] @ transforms_mat[:, i])
    transforms = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[:, :, :3, 3]
    # rel = A - [0 | A @ [j;0]]: remove the rest-pose joint offset
    joints_h = jnp.concatenate([joints[..., None],
                                jnp.zeros_like(joints[..., :1, None])], axis=-2)
    init_bone = transforms @ joints_h                      # (B, J, 4, 1)
    init_bone = jnp.concatenate([jnp.zeros(transforms.shape[:-1] + (3,),
                                           transforms.dtype),
                                 init_bone], axis=-1)      # pad left 3 cols
    rel_transforms = transforms - init_bone
    return posed_joints, rel_transforms, transforms


def lbs(betas, pose, v_template, shapedirs, posedirs, J_regressor, parents,
        lbs_weights, clothed_v_template=None):
    """Full SMPL LBS.

    betas (B, nb); pose (B, J*3) axis-angle; v_template (B|1, V, 3);
    shapedirs (V, 3, nb); posedirs (P, V*3) or None; J_regressor (J, V);
    parents: static ints; lbs_weights (V, J).

    Returns (verts, J_posed, J_rest, rel_A, abs_A, v_posed, v_shaped, rot_mats)
    exactly as the reference lbs() (models/pose_correction/lbs.py:34-119).
    """
    B = betas.shape[0]
    v_shaped = v_template + blend_shapes(betas, shapedirs)
    J = vertices_to_joints(J_regressor, v_shaped)
    if clothed_v_template is not None:
        v_shaped = clothed_v_template

    rot_mats = rodrigues_batch(pose.reshape(-1, 3)).reshape(B, -1, 3, 3)

    if posedirs is not None:
        ident = jnp.eye(3, dtype=v_shaped.dtype)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
        pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
        v_posed = pose_offsets + v_shaped
    else:
        v_posed = v_shaped

    J_transformed, A, abs_A = batch_rigid_transform(rot_mats, J, parents)

    num_joints = J_regressor.shape[0]
    W = lbs_weights[None]                                   # (1, V, J)
    T = (W @ A.reshape(B, num_joints, 16)).reshape(B, -1, 4, 4)

    v_posed_h = jnp.concatenate(
        [v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = (T @ v_posed_h[..., None])[:, :, :3, 0]

    return verts, J_transformed, J, A, abs_A, v_posed, v_shaped, rot_mats
