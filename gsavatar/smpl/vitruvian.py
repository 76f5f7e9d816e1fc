"""Vitruvian ("star") canonicalization transforms.

Parity: utils/dataset_utils.py:9-37 (numpy version, used at dataset setup)
and models/pose_correction/pose_correction.py:14-77 (torch/jax version used
inside pose correction). Both rotate the two leg chains by +-45 deg about z.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gsavatar.utils.transforms import euler_z

_CHAIN_L = (1, 4, 7, 10)   # L-hip, L-knee, L-ankle, L-foot
_CHAIN_R = (2, 5, 8, 11)   # R-hip, R-knee, R-ankle, R-foot


def get_02v_bone_transforms(joints: np.ndarray) -> np.ndarray:
    """joints (24, 3) -> (24, 4, 4) bone transforms taking the rest A-pose to
    the star Vitruvian pose (identity everywhere except the leg chains)."""
    joints = np.asarray(joints, np.float64)
    trans = np.tile(np.eye(4), (24, 1, 1))

    for chain, R in ((_CHAIN_L, euler_z(45)), (_CHAIN_R, euler_z(-45))):
        for i, j_idx in enumerate(chain):
            trans[j_idx, :3, :3] = R
            t = joints[j_idx].copy()
            if i > 0:
                parent = chain[i - 1]
                t = R @ (t - joints[parent])
                t += trans[parent, :3, -1]
            trans[j_idx, :3, -1] = t
        trans[list(chain), :3, -1] -= joints[list(chain)] @ R.T

    return trans.astype(np.float32)


def get_02v_bone_transforms_jax(Jtr):
    """Differentiable (traced) version operating on (24, 3) joints — used by
    pose correction, where joints depend on optimized betas
    (ref pose_correction.py:14-77)."""
    rot45 = {0: jnp.asarray(euler_z(45), jnp.float32),
             1: jnp.asarray(euler_z(-45), jnp.float32)}
    out = jnp.tile(jnp.eye(4, dtype=jnp.float32), (24, 1, 1))

    for ci, chain in enumerate((_CHAIN_L, _CHAIN_R)):
        R = rot45[ci]
        ts = []
        for i, j_idx in enumerate(chain):
            t = Jtr[j_idx]
            if i > 0:
                t = R @ (t - Jtr[chain[i - 1]]) + ts[i - 1]
            ts.append(t)
        ts = jnp.stack(ts) - Jtr[jnp.asarray(chain)] @ R.T
        for i, j_idx in enumerate(chain):
            out = out.at[j_idx, :3, :3].set(R)
            out = out.at[j_idx, :3, 3].set(ts[i])
    return out
