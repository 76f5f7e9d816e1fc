"""Trilinear grid sampling (torch F.grid_sample parity, border padding,
align_corners=False) — used by the distilled skinning-voxel path
(models/deformer/rigid.py:160-171 of the reference)."""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_3d(vol, coords):
    """vol (C, D, H, W); coords (N, 3) in [-1, 1] as (x, y, z) where x indexes
    W, y indexes H, z indexes D (torch convention). Returns (N, C)."""
    C, D, H, W = vol.shape
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]

    def to_idx(v, size):
        # align_corners=False: v in [-1,1] -> pixel coords
        return ((v + 1.0) * size - 1.0) / 2.0

    fx, fy, fz = to_idx(x, W), to_idx(y, H), to_idx(z, D)

    def corners(f, size):
        f0 = jnp.floor(f)
        w1 = f - f0
        i0 = jnp.clip(f0.astype(jnp.int32), 0, size - 1)
        i1 = jnp.clip(f0.astype(jnp.int32) + 1, 0, size - 1)
        return i0, i1, w1

    x0, x1, wx = corners(fx, W)
    y0, y1, wy = corners(fy, H)
    z0, z1, wz = corners(fz, D)

    def gather(zi, yi, xi):
        return vol[:, zi, yi, xi].T  # (N, C)

    out = (gather(z0, y0, x0) * ((1 - wz) * (1 - wy) * (1 - wx))[:, None]
           + gather(z0, y0, x1) * ((1 - wz) * (1 - wy) * wx)[:, None]
           + gather(z0, y1, x0) * ((1 - wz) * wy * (1 - wx))[:, None]
           + gather(z0, y1, x1) * ((1 - wz) * wy * wx)[:, None]
           + gather(z1, y0, x0) * (wz * (1 - wy) * (1 - wx))[:, None]
           + gather(z1, y0, x1) * (wz * (1 - wy) * wx)[:, None]
           + gather(z1, y1, x0) * (wz * wy * (1 - wx))[:, None]
           + gather(z1, y1, x1) * (wz * wy * wx)[:, None])
    return out
