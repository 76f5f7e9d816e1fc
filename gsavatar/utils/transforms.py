"""Rotation / quaternion / covariance math and LR schedules.

Behavioral parity targets (reference, /root/reference):
  utils/general_utils.py:27-28   inverse_sigmoid
  utils/general_utils.py:38-71   get_expon_lr_func (Plenoxels log-lerp)
  utils/general_utils.py:73-85   strip_symmetric (upper-tri 6-vector)
  utils/general_utils.py:87-108  build_rotation (wxyz quat -> 3x3)
  utils/general_utils.py:184-192 quaternion_multiply
  utils/general_utils.py:194-207 build_scaling_rotation (L = R diag(s))
  scene/gaussian_model.py:28-32  covariance = L L^T, stored upper-tri
All functions are pure jnp and batch over the leading axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def quat_normalize(q, eps: float = 0.0):
    """Normalize quaternions (..., 4) wxyz. eps=0 matches torch F.normalize
    default semantics closely enough for unit-ish quats."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return q / norm


def matvec3(R, v):
    """Batched (..., 3, 3) @ (..., 3) as elementwise multiply+sum.

    A per-point tiny matmul written with `@` lowers to an MXU dot, and on
    TPU the default matmul precision inserts f32->bf16 casts plus layout
    copies around EVERY such site — measured (round-5 trace) as the
    dominant share of a ~22 ms/step per-gaussian 'tail' of 6,500 small
    cast/copy ops at N=53k. The elementwise form runs on the VPU, fuses
    into its neighbors, and stays f32 (strictly better precision than the
    silent bf16 dot it replaces)."""
    return (R * v[..., None, :]).sum(-1)


def matmul3(A, B):
    """Batched (..., 3, 3) @ (..., 3, 3) elementwise (see matvec3)."""
    return (A[..., :, :, None] * B[..., None, :, :]).sum(-2)


def quat_to_rotmat(q):
    """(..., 4) wxyz (not necessarily normalized) -> (..., 3, 3).

    Normalizes internally, like the reference build_rotation."""
    q = quat_normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def quat_multiply(r, s):
    """Hamilton product of wxyz quaternions, broadcasting over batch dims."""
    r0, r1, r2, r3 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    s0, s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    return jnp.stack([
        r0 * s0 - r1 * s1 - r2 * s2 - r3 * s3,
        r0 * s1 + r1 * s0 + r2 * s3 - r3 * s2,
        r0 * s2 - r1 * s3 + r2 * s0 + r3 * s1,
        r0 * s3 + r1 * s2 - r2 * s1 + r3 * s0,
    ], axis=-1)


def rotmat_to_quat(R, eps: float = 1e-8):
    """(..., 3, 3) -> (..., 4) wxyz. Shepperd-style branch selection via
    jnp.where (matches utils/general_utils.py:110-181 semantics)."""
    m = R.reshape(R.shape[:-2] + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[..., i] for i in range(9)]
    trace = m00 + m11 + m22
    tiny = jnp.finfo(R.dtype).tiny

    def safe_div(a, b):
        return a / jnp.maximum(b, tiny)

    sq_t = jnp.sqrt(jnp.maximum(trace + 1.0 + eps, 0.0)) * 2.0
    cand_t = jnp.stack([0.25 * sq_t, safe_div(m21 - m12, sq_t),
                        safe_div(m02 - m20, sq_t), safe_div(m10 - m01, sq_t)], -1)
    sq_x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22 + eps, 0.0)) * 2.0
    cand_x = jnp.stack([safe_div(m21 - m12, sq_x), 0.25 * sq_x,
                        safe_div(m01 + m10, sq_x), safe_div(m02 + m20, sq_x)], -1)
    sq_y = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22 + eps, 0.0)) * 2.0
    cand_y = jnp.stack([safe_div(m02 - m20, sq_y), safe_div(m01 + m10, sq_y),
                        0.25 * sq_y, safe_div(m12 + m21, sq_y)], -1)
    sq_z = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11 + eps, 0.0)) * 2.0
    cand_z = jnp.stack([safe_div(m10 - m01, sq_z), safe_div(m02 + m20, sq_z),
                        safe_div(m12 + m21, sq_z), 0.25 * sq_z], -1)

    where_2 = jnp.where((m11 > m22)[..., None], cand_y, cand_z)
    where_1 = jnp.where(((m00 > m11) & (m00 > m22))[..., None], cand_x, where_2)
    return jnp.where((trace > 0.0)[..., None], cand_t, where_1)


def build_scaling_rotation(s, r):
    """L = R @ diag(s). r is (N,4) quat or (N,3,3) matrix."""
    if r.shape[-1] == 4 and r.ndim == 2:
        R = quat_to_rotmat(r)
    else:
        R = r
    return R * s[..., None, :]


def strip_symmetric(S):
    """(N, 3, 3) symmetric -> (N, 6) [xx, xy, xz, yy, yz, zz]."""
    return jnp.stack([S[..., 0, 0], S[..., 0, 1], S[..., 0, 2],
                      S[..., 1, 1], S[..., 1, 2], S[..., 2, 2]], axis=-1)


def unstrip_symmetric(u):
    """(N, 6) -> (N, 3, 3) symmetric."""
    xx, xy, xz, yy, yz, zz = [u[..., i] for i in range(6)]
    row0 = jnp.stack([xx, xy, xz], -1)
    row1 = jnp.stack([xy, yy, yz], -1)
    row2 = jnp.stack([xz, yz, zz], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def covariance_from_scaling_rotation(scaling, scaling_modifier, rotation):
    """Sigma = L L^T with L = R diag(m*s); returns upper-tri 6-vector.
    rotation may be (N,4) quaternions or (N,3,3) precomputed matrices
    (the rigid deformer premultiplies LBS rotation; ref gaussian_model.py:154-157)."""
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    # Sigma[i,j] = sum_k L[i,k] L[j,k], elementwise (see matvec3 rationale)
    S = (L[..., :, None, :] * L[..., None, :, :]).sum(-1)
    return strip_symmetric(S)


def expon_lr_schedule(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1000000):
    """Log-linear LR interpolation with optional sine delay ramp.
    Returns a function step -> lr usable both traced and host-side."""
    def helper(step):
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(jnp.asarray(step, jnp.float32))
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        lr = delay_rate * log_lerp
        # negative step disables (reference returns 0.0)
        return jnp.where(step < 0, 0.0, lr)
    return helper


def rodrigues(aa):
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3).
    Matches models/pose_correction/lbs.py:166-193 (note the +1e-8 inside
    the norm for stability at theta=0)."""
    angle = jnp.linalg.norm(aa + 1e-8, axis=-1, keepdims=True)
    rot_dir = aa / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros],
                  axis=-1).reshape(aa.shape[:-1] + (3, 3))
    ident = jnp.eye(3, dtype=aa.dtype)
    return ident + sin * K + (1 - cos) * (K @ K)


def euler_z(deg: float) -> np.ndarray:
    """Host-side rotation about z by degrees (3,3)."""
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float64)


def augm_rot_matrix(key, roll_range, pitch_range, yaw_range):
    """Random small-rotation augmentation matrix (3,3), jax-random version of
    utils/sh_utils.py:169-213 (randn*range clipped to +-2*range; the pitch
    axis uses rand() in the reference — we mirror that)."""
    k1, k2, k3 = jax.random.split(key, 3)
    rx = jnp.clip(jax.random.normal(k1) * roll_range, -2 * roll_range, 2 * roll_range)
    ry = jnp.clip(jax.random.uniform(k2) * pitch_range, -2 * pitch_range, 2 * pitch_range)
    rz = jnp.clip(jax.random.normal(k3) * yaw_range, -2 * yaw_range, 2 * yaw_range)
    d = jnp.pi / 180.0
    sx, cx = jnp.sin(d * rx), jnp.cos(d * rx)
    sy, cy = jnp.sin(d * ry), jnp.cos(d * ry)
    sz, cz = jnp.sin(d * rz), jnp.cos(d * rz)
    rot_x = jnp.array([[1, 0, 0], [0, 0, 0], [0, 0, 0]], jnp.float32)
    rot_x = rot_x.at[1, 1].set(cx).at[1, 2].set(-sx).at[2, 1].set(sx).at[2, 2].set(cx).at[0, 0].set(1.0)
    rot_y = jnp.zeros((3, 3), jnp.float32)
    rot_y = rot_y.at[0, 0].set(cy).at[0, 2].set(sy).at[2, 0].set(-sy).at[2, 2].set(cy).at[1, 1].set(1.0)
    rot_z = jnp.zeros((3, 3), jnp.float32)
    rot_z = rot_z.at[0, 0].set(cz).at[0, 1].set(-sz).at[1, 0].set(sz).at[1, 1].set(cz).at[2, 2].set(1.0)
    return rot_x @ (rot_y @ rot_z)
