"""Loss assembly.

Parity: train.py:106-178 and utils/loss_utils.py of the reference — L1,
D-SSIM, perceptual (LPIPS, optional — see ops/lpips.py), mask (l1|bce),
skinning distillation, AIAP (as-isometric-as-possible) xyz/cov, plus the
model regularizers, each weighted by a `C(iteration, value)` piecewise
schedule."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gsavatar.ops import knn
from gsavatar.ops.ssim import ssim


def C(iteration: int, value):
    """Piecewise-constant schedule (train.py:31-47): scalars pass through,
    a list [v0, it1, v1, it2, v2, ...] yields vi once iteration >= iti.
    Host-side (the result feeds the jitted step as a scalar)."""
    if isinstance(value, (int, float, str)):
        return float(value)
    value = list(value)
    value_list = [0] + value
    i = 0
    while i < len(value_list):
        if iteration >= value_list[i]:
            i += 2
        else:
            break
    return float(value_list[i - 1])


def l1_loss(a, b):
    return jnp.abs(a - b).mean()


def mask_loss(opacity_img, gt_mask, kind: str):
    """(H, W) alpha render vs gt mask (train.py:143-153)."""
    if kind == 'bce':
        o = jnp.clip(opacity_img, 1e-3, 1.0 - 1e-3)
        return -(gt_mask * jnp.log(o) + (1 - gt_mask) * jnp.log(1 - o)).mean()
    if kind == 'l1':
        return jnp.abs(opacity_img - gt_mask).mean()
    raise ValueError(kind)


def _safe_norm(x, axis=-1):
    """sqrt with an epsilon: exact duplicates (dead arena slots, fresh
    clones) would otherwise backprop NaN through d sqrt(0), which poisons
    the whole gradient even under a zero mask weight."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + 1e-20)


def aiap_loss(x_can, x_obs, nn_ix, alive):
    """L1 between canonical and deformed neighbor distances
    (utils/loss_utils.py:87-102), masked to alive arena slots. Neighbor
    gathers run through the scatter-free transpose (ops/segsum.py).
    Single-attribute variant kept for ad-hoc use; the train step goes
    through full_aiap_loss's fused columnar path below."""
    from gsavatar.ops.segsum import gather_rows
    k = nn_ix.shape[1]
    flat = nn_ix.reshape(-1)
    can_nb = gather_rows(x_can, flat).reshape(-1, k, x_can.shape[-1])
    obs_nb = gather_rows(x_obs, flat).reshape(-1, k, x_obs.shape[-1])
    d_can = _safe_norm(x_can[:, None, :] - can_nb)
    d_obs = _safe_norm(x_obs[:, None, :] - obs_nb)
    err = jnp.abs(d_can - d_obs)
    w = alive[:, None].astype(err.dtype)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w) * err.shape[1], 1.0)


def full_aiap_loss(gs_can, gs_obs, n_neighbors: int = 5, nn_ix=None):
    """Both AIAP terms (utils/loss_utils.py:69-85), KNN on canonical
    positions shared by both. Pass cached `nn_ix` (N, k) to skip the
    per-step KNN (refreshed on the densify cadence — see GaussianAux).

    TPU shape discipline (measured, round 5): the naive (N, k, C)
    formulation puts C = 3/6 on the 128-lane minor dim, so every
    broadcast/sub/reduce pass runs 21-42x oversized and XLA inserts
    reshape relayouts around each — ~8 ms/step at the bench shape. Here
    the post-gather math is slot-major columnar (C, k, N) — N rides the
    lane dim end to end and each elementwise pass touches 6.4 MB instead
    of 136 MB. The gathers stay one-per-attribute: a fused (k*N, 18)
    gather was measured 37 ms/step SLOWER — its VJP rides all 18 f32
    cotangent columns through one segment-sum sort (19-operand lax.sort)
    where the per-attribute VJPs sort 4/7 operands."""
    from gsavatar.ops.segsum import gather_rows
    xyz_can = gs_can.get_xyz
    xyz_obs = gs_obs.get_xyz
    cov_can = gs_can.get_covariance()
    cov_obs = gs_obs.get_covariance()
    alive = gs_can.alive
    if nn_ix is None:
        nn_ix = knn.knn_self(xyz_can, n_neighbors, mask=alive)
    n, k = nn_ix.shape
    flat = nn_ix.T.reshape(-1)            # slot-major: block j = slot j

    def dist(x):                          # _safe_norm, columnar
        C = x.shape[-1]
        nbT = gather_rows(x, flat).T.reshape(C, k, n)
        d = x.T.reshape(C, 1, n) - nbT
        return jnp.sqrt(jnp.sum(d * d, axis=0) + 1e-20)   # (k, N)

    err_xyz = jnp.abs(dist(xyz_can) - dist(xyz_obs))
    err_cov = jnp.abs(dist(cov_can) - dist(cov_obs))
    w = alive.astype(err_xyz.dtype)[None, :]
    denom = jnp.maximum(jnp.sum(w) * k, 1.0)
    return (jnp.sum(err_xyz * w) / denom,
            jnp.sum(err_cov * w) / denom)


def opacity_entropy_loss(opacity, alive):
    """Binary-entropy opacity classification loss
    (gaussian_model.py:165-170 of the reference, weight `lambda_opacity`
    wired by configs/option/no_mask.yaml), masked to alive arena slots."""
    eps = 1e-6
    o = opacity.reshape(-1)
    ent = -(o * jnp.log(o + eps) + (1 - o) * jnp.log(1 - o + eps))
    w = alive.astype(ent.dtype)
    return jnp.sum(ent * w) / jnp.maximum(jnp.sum(w), 1.0)


def foreground_crop(render, gt, mask, crop_hw):
    """Fixed-size crop of both images centered on the mask centroid.

    The reference crops the exact foreground bounding box before LPIPS
    (train.py:129-136) — a dynamic shape. Under jit we take a static
    `crop_hw` window centered on the mask's center of mass, clamped to the
    image bounds; empty masks degrade to the image center."""
    h, w = render.shape[0], render.shape[1]
    ch, cw = min(crop_hw[0], h), min(crop_hw[1], w)
    total = jnp.maximum(jnp.sum(mask), 1e-6)
    ys = jnp.arange(h, dtype=mask.dtype)
    xs = jnp.arange(w, dtype=mask.dtype)
    cy = jnp.sum(mask.sum(axis=1) * ys) / total
    cx = jnp.sum(mask.sum(axis=0) * xs) / total
    y0 = jnp.clip(jnp.round(cy).astype(jnp.int32) - ch // 2, 0, h - ch)
    x0 = jnp.clip(jnp.round(cx).astype(jnp.int32) - cw // 2, 0, w - cw)
    sl = lambda im: jax.lax.dynamic_slice(im, (y0, x0, 0),
                                          (ch, cw, im.shape[2]))
    return sl(render), sl(gt)


def psnr(a, b):
    return -10.0 * jnp.log10(jnp.mean((a - b) ** 2))
