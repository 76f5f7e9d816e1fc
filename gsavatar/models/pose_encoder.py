"""Hierarchical (LEAP-style) body-pose encoder.

Parity: models/network_utils.py:119-180. A global linear over all joint
rotations+positions feeds the root; each joint's 2-layer MLP consumes
[rot(9), Jtr(3), bone_len(1), parent_feature] walking down the fixed SMPL
tree. The 24-joint walk is unrolled (static tree) — XLA fuses it into a
couple dozen small matmuls per frame, negligible next to rasterization."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gsavatar.smpl.body_model import KTREE_PARENTS
from .mlp import TorchDense


class HierarchicalPoseEncoder(nn.Module):
    num_joints: int = 24
    rel_joints: bool = False
    dim_per_joint: int = 6
    out_dim: int = -1

    @property
    def n_output_dims(self) -> int:
        return self.out_dim if self.out_dim > 0 \
            else self.num_joints * self.dim_per_joint

    @nn.compact
    def __call__(self, rots, Jtrs):
        """rots (B, 24, 9), Jtrs (B, 24, 3) -> (B, n_output_dims)."""
        B = rots.shape[0]
        parents = KTREE_PARENTS

        if self.rel_joints:
            # computed under no_grad in the reference (network_utils.py:154-158)
            rel = jnp.concatenate(
                [Jtrs[:, :1], Jtrs[:, 1:] - Jtrs[:, parents[1:]]], axis=1)
            Jtrs = jax.lax.stop_gradient(rel)

        global_feat = jnp.concatenate([rots.reshape(B, -1),
                                       Jtrs.reshape(B, -1)], axis=-1)
        global_feat = TorchDense(self.dim_per_joint, name="layer_0")(global_feat)

        out = [None] * self.num_joints
        for j in range(self.num_joints):
            rot = rots[:, j]
            Jtr = Jtrs[:, j]
            parent = parents[j]
            if parent == -1:
                bone_l = jnp.linalg.norm(Jtr, axis=-1, keepdims=True)
                feat = global_feat
            else:
                bone_l = jnp.linalg.norm(
                    Jtr if self.rel_joints else Jtr - Jtrs[:, parent],
                    axis=-1, keepdims=True)
                feat = out[parent]
            x = jnp.concatenate([rot, Jtr, bone_l, feat], axis=-1)
            x = TorchDense(13 + self.dim_per_joint, name=f"layers_{j}_0")(x)
            x = nn.relu(x)
            out[j] = TorchDense(self.dim_per_joint, name=f"layers_{j}_2")(x)

        y = jnp.concatenate(out, axis=-1)
        if self.out_dim > 0:
            y = TorchDense(self.out_dim, name="out_layer")(y)
        return y
