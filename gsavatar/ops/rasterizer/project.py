"""Gaussian projection: 3D -> screen (EWA splatting preprocessing).

Behavioral spec: the preprocess stage of the Inria diff-gaussian-rasterization
CUDA kernel as exercised by the reference (SURVEY.md §2.9): frustum cull at
z<=0.2, perspective projection through the (transposed, row-vector) matrices
stored on the Camera, EWA 2D covariance J W Sigma W^T J^T with +0.3 px
dilation, radius = ceil(3 sqrt(lambda_max)), 16x16 tile footprint.

Everything is plain vectorized jnp over N Gaussians — XLA fuses this into a
handful of elementwise kernels; there is no benefit to Pallas here.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

TILE = 16


class Projection(NamedTuple):
    means2d: jnp.ndarray      # (N, 2) pixel coords
    depths: jnp.ndarray       # (N,) view-space z
    conics: jnp.ndarray       # (N, 3) inverse 2D covariance (a, b, c)
    radii: jnp.ndarray        # (N,) int32 pixel radius (0 = culled)
    rect_min: jnp.ndarray     # (N, 2) int32 tile rect (x0, y0) inclusive
    rect_max: jnp.ndarray     # (N, 2) int32 tile rect (x1, y1) exclusive
    tiles_touched: jnp.ndarray  # (N,) int32


def ndc_to_pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def project(means3d, cov3d, viewmatrix, full_projmatrix, tanfovx, tanfovy,
            width, height, active=None, means2d_offset=None,
            near: float = 0.2) -> Projection:
    """means3d (N,3); cov3d (N,6) upper-tri; matrices in row-vector convention
    (p_h @ M). `means2d_offset` (N,2), in NDC units scaled by half image size,
    is the hook through which densification reads d(loss)/d(screen position):
    gradients w.r.t. it match the CUDA kernel's dL_dmean2D (which multiplies
    NDC gradients by 0.5*W / 0.5*H)."""
    N = means3d.shape[0]
    ones = jnp.ones((N, 1), means3d.dtype)
    p_hom4 = jnp.concatenate([means3d, ones], axis=1)

    # view space — elementwise (N,4)x(4,3): a shared-matrix dot at K=4
    # lowers to an MXU pass with f32->bf16 casts on TPU (see
    # transforms.matvec3); broadcast-sum keeps projected centers f32
    t = (p_hom4[:, :, None] * viewmatrix[None, :, :3]).sum(1)   # (N, 3)
    tz = t[:, 2]
    in_front = tz > near

    # clip space -> NDC
    p_hom = (p_hom4[:, :, None] * full_projmatrix[None]).sum(1)  # (N, 4)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    ndc_xy = p_proj[:, :2]
    if means2d_offset is not None:
        ndc_xy = ndc_xy + means2d_offset
    means2d = jnp.stack([ndc_to_pix(ndc_xy[:, 0], width),
                         ndc_to_pix(ndc_xy[:, 1], height)], axis=1)

    # EWA: J of the perspective map, with the CUDA kernel's fov clamping
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tz_safe = jnp.where(in_front, tz, 1.0)
    txtz = jnp.clip(t[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    # world->cam rotation W (viewmatrix is W2V^T, so rows of viewmatrix[:3,:3]
    # are columns of W): cov_cam = (J W) Sigma (J W)^T
    Wr = viewmatrix[:3, :3]                             # = W^T
    # Vrk: full symmetric 3x3 from upper-tri
    xx, xy, xz, yy, yz, zz = [cov3d[:, i] for i in range(6)]
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    # J rows (2x3): [fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2
    # M = J @ W^T_cols: with row-convention Wr = W^T, (J W) row i = sum_k J_ik W[k,:]
    # W[k, :] = Wr[:, k]
    m0 = j00[:, None] * Wr[:, 0][None, :] + j02[:, None] * Wr[:, 2][None, :]  # (N,3)
    m1 = j11[:, None] * Wr[:, 1][None, :] + j12[:, None] * Wr[:, 2][None, :]
    # Sigma @ m^T
    Sm0 = jnp.stack([xx * m0[:, 0] + xy * m0[:, 1] + xz * m0[:, 2],
                     xy * m0[:, 0] + yy * m0[:, 1] + yz * m0[:, 2],
                     xz * m0[:, 0] + yz * m0[:, 1] + zz * m0[:, 2]], axis=1)
    Sm1 = jnp.stack([xx * m1[:, 0] + xy * m1[:, 1] + xz * m1[:, 2],
                     xy * m1[:, 0] + yy * m1[:, 1] + yz * m1[:, 2],
                     xz * m1[:, 0] + yz * m1[:, 1] + zz * m1[:, 2]], axis=1)
    c00 = (m0 * Sm0).sum(1) + 0.3
    c01 = (m0 * Sm1).sum(1)
    c11 = (m1 * Sm1).sum(1) + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=1)

    mid = 0.5 * (c00 + c11)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    px, py = means2d[:, 0], means2d[:, 1]
    x0 = jnp.clip(((px - radius_f) / TILE).astype(jnp.int32), 0, grid_x)
    y0 = jnp.clip(((py - radius_f) / TILE).astype(jnp.int32), 0, grid_y)
    x1 = jnp.clip(((px + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    y1 = jnp.clip(((py + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    area = (x1 - x0) * (y1 - y0)

    visible = in_front & det_ok & (area > 0)
    if active is not None:
        visible = visible & active
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(visible, area, 0).astype(jnp.int32)

    return Projection(
        means2d=means2d, depths=tz, conics=conics, radii=radii,
        rect_min=jnp.stack([x0, y0], 1), rect_max=jnp.stack([x1, y1], 1),
        tiles_touched=tiles_touched)
