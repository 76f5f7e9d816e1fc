#!/usr/bin/env python
"""Generate tests/fixtures/golden_raster.npz from the independent float64
NumPy restatement of the CUDA rasterizer contract (tests/golden_oracle.py).

The fixture freezes: rasterizer-boundary inputs (means/colors/opacities/
cov3d/camera matrices), the expected image/alpha/radii, and central-
difference gradients of a fixed scalar probe loss w.r.t. selected inputs —
so both production backends (XLA scan and Pallas kernels) are anchored to
the documented CUDA numerics, gradients included, without our jax code in
the loop."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tests.golden_oracle import render_golden

H = W = 64
N = 48


def camera_matrices():
    """Row-vector-convention W2V^T and full projection, built directly from
    the reference recipe (graphics_utils getWorld2View2/getProjectionMatrix,
    both stored transposed on the Camera)."""
    R = np.eye(3)
    T = np.array([0.05, -0.08, 3.0])
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.T
    Rt[:3, 3] = T
    Rt[3, 3] = 1.0
    world_view = Rt.T                       # transposed storage

    fovx = fovy = 0.8
    tanx, tany = np.tan(fovx / 2), np.tan(fovy / 2)
    znear, zfar = 0.01, 100.0
    top = tany * znear
    right = tanx * znear
    P = np.zeros((4, 4))
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[2, 2] = zfar / (zfar - znear)
    P[3, 2] = 1.0                           # z_sign (graphics_utils.py:68)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    proj = P.T                              # transposed storage
    full = world_view @ proj
    return world_view, full, tanx, tany


def make_scene(seed=7):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.6, 0.6, (N, 3))
    means[:, 2] = rng.uniform(-0.5, 0.5, N)
    # random SPD covariances: A A^T scaled to splat-sized extents
    scales = 0.04 * (0.5 + rng.random((N, 3)))
    qs = rng.normal(size=(N, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    cov = np.zeros((N, 6))
    for i in range(N):
        w, x, y, z = qs[i]
        Rm = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        L = Rm * scales[i][None, :]
        S = L @ L.T
        cov[i] = [S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2]]
    colors = rng.random((N, 3))
    opac = rng.uniform(0.35, 0.95, N)
    return means, colors, opac, cov


def main():
    means, colors, opac, cov = make_scene()
    world_view, full, tanx, tany = camera_matrices()
    bg = np.array([0.15, 0.25, 0.35])

    img, alpha, radii = render_golden(means, colors, opac, cov, world_view,
                                      full, tanx, tany, W, H, bg)

    # probe loss L = sum(image * W_probe): central-difference gradients for a
    # handful of (array, index) coordinates through the FULL golden pipeline
    rng = np.random.default_rng(11)
    probe = rng.random((H, W, 3))

    def loss(m, c, o, cv):
        im, _, _ = render_golden(m, c, o, cv, world_view, full, tanx, tany,
                                 W, H, bg)
        return float(np.sum(im * probe))

    coords = []   # (array_id, flat_index, fd_grad)
    arrays = {0: means, 1: colors, 2: opac, 3: cov}

    def fd(aid, flat, eps):
        a = arrays[aid]
        base = a.flat[flat]
        a.flat[flat] = base + eps
        lp = loss(means, colors, opac, cov)
        a.flat[flat] = base - eps
        lm = loss(means, colors, opac, cov)
        a.flat[flat] = base
        return (lp - lm) / (2 * eps)

    # candidate coordinates; keep only those whose central difference is
    # stable under eps halving (the pipeline has hard thresholds — radii
    # ceil, alpha 1/255, T 1e-4 — an FD window crossing one is discarded)
    picks = [(0, 5 * 3 + 0), (0, 11 * 3 + 2), (0, 20 * 3 + 1),
             (1, 7 * 3 + 1), (1, 30 * 3 + 0), (2, 3), (2, 21), (2, 40),
             (3, 9 * 6 + 0), (3, 17 * 6 + 3), (3, 25 * 6 + 5),
             (3, 33 * 6 + 0)]
    for aid, flat in picks:
        scale = max(abs(float(arrays[aid].flat[flat])), 1e-3)
        eps = 2e-5 * scale
        g1 = fd(aid, flat, eps)
        g2 = fd(aid, flat, eps / 2)
        if abs(g1 - g2) > 5e-3 * max(abs(g1), abs(g2), 1e-3):
            print(f"skip array{aid}[{flat}]: unstable FD {g1:.5f} vs "
                  f"{g2:.5f}", flush=True)
            continue
        coords.append((aid, flat, g2))
        print(f"fd grad array{aid}[{flat}] = {g2:.6f}", flush=True)
    assert len(coords) >= 6, "too few stable FD coordinates"

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'fixtures')
    os.makedirs(out, exist_ok=True)
    np.savez_compressed(
        os.path.join(out, 'golden_raster.npz'),
        means3d=means, colors=colors, opacities=opac, cov3d=cov,
        viewmatrix=world_view, full_projmatrix=full,
        tanfovx=tanx, tanfovy=tany, width=W, height=H, background=bg,
        image=img, alpha=alpha, radii=radii, probe=probe,
        grad_coords=np.asarray([(a, f) for a, f, _ in coords], np.int64),
        grad_values=np.asarray([g for _, _, g in coords]))
    print("wrote tests/fixtures/golden_raster.npz "
          f"(alpha coverage {float((alpha > 0.01).mean()):.3f})")


if __name__ == '__main__':
    main()
