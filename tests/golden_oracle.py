"""Independent float64 NumPy implementation of the diff-gaussian-rasterization
forward contract (SURVEY.md §2.9; upstream Inria kernel semantics as
exercised by /root/reference/gaussian_renderer/__init__.py:100-129).

Written WITHOUT reference to gsavatar's jax code — every formula restated
from the kernel spec — so it anchors both production backends to the
documented numerics. The true CUDA binary cannot run in this image (empty
submodule pin, no GPU); this double-precision restatement of its published
algorithm is the strongest available golden source and is frozen into
tests/fixtures/golden_raster.npz by tools/make_golden.py.
"""
from __future__ import annotations

import numpy as np

TILE = 16


def render_golden(means3d, colors, opacities, cov3d, viewmatrix,
                  full_projmatrix, tanfovx, tanfovy, width, height,
                  background):
    """All inputs float64 numpy; matrices in the row-vector convention the
    Camera stores (p_hom @ M). Returns (image (H,W,3), alpha (H,W),
    radii (N,) int)."""
    N = means3d.shape[0]
    ones = np.ones((N, 1))
    p_hom4 = np.concatenate([means3d, ones], axis=1)

    # ---- preprocess (per gaussian) ----
    t = p_hom4 @ viewmatrix[:, :3]                     # view space
    depth = t[:, 2]

    p_clip = p_hom4 @ full_projmatrix
    p_w = 1.0 / (p_clip[:, 3] + 1e-7)                  # kernel: + 0.0000001f
    ndc = p_clip[:, :3] * p_w[:, None]

    def ndc2pix(v, S):
        return ((v + 1.0) * S - 1.0) * 0.5
    px = ndc2pix(ndc[:, 0], width)
    py = ndc2pix(ndc[:, 1], height)

    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tz = np.where(depth > 0.2, depth, 1.0)
    txtz = np.clip(t[:, 0] / tz, -limx, limx)
    tytz = np.clip(t[:, 1] / tz, -limy, limy)
    tx, ty = txtz * tz, tytz * tz

    # J (2x3 rows of the perspective jacobian), W = world->cam rotation.
    # viewmatrix holds W2V transposed, so W = viewmatrix[:3,:3]^T.
    Wrot = viewmatrix[:3, :3].T                        # (3,3) world->cam
    image = np.zeros((height, width, 3))
    alpha_img = np.zeros((height, width))
    radii = np.zeros(N, np.int64)
    conics = np.zeros((N, 3))

    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    rect = np.zeros((N, 4), np.int64)

    for i in range(N):
        if depth[i] <= 0.2:
            continue
        J = np.array([
            [focal_x / tz[i], 0.0, -focal_x * tx[i] / (tz[i] * tz[i])],
            [0.0, focal_y / tz[i], -focal_y * ty[i] / (tz[i] * tz[i])],
        ])
        M = J @ Wrot                                   # (2,3)
        c6 = cov3d[i]
        Vrk = np.array([[c6[0], c6[1], c6[2]],
                        [c6[1], c6[3], c6[4]],
                        [c6[2], c6[4], c6[5]]])
        cov2d = M @ Vrk @ M.T
        cov2d[0, 0] += 0.3
        cov2d[1, 1] += 0.3
        det = cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] * cov2d[0, 1]
        if det == 0.0:
            continue
        conic = np.array([cov2d[1, 1], -cov2d[0, 1], cov2d[0, 0]]) / det
        mid = 0.5 * (cov2d[0, 0] + cov2d[1, 1])
        lam1 = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = int(np.ceil(3.0 * np.sqrt(max(lam1, 0.0))))
        x0 = min(grid_x, max(0, int((px[i] - radius) / TILE)))
        y0 = min(grid_y, max(0, int((py[i] - radius) / TILE)))
        x1 = min(grid_x, max(0, int((px[i] + radius + TILE - 1) / TILE)))
        y1 = min(grid_y, max(0, int((py[i] + radius + TILE - 1) / TILE)))
        if (x1 - x0) * (y1 - y0) == 0:
            continue
        radii[i] = radius
        conics[i] = conic
        rect[i] = (x0, y0, x1, y1)

    # ---- composite (per pixel, global front-to-back depth order) ----
    order = np.argsort(depth, kind='stable')
    for yy in range(height):
        ty_ = yy // TILE
        for xx in range(width):
            tx_ = xx // TILE
            T = 1.0
            C = np.zeros(3)
            for i in order:
                if radii[i] <= 0:
                    continue
                x0, y0, x1, y1 = rect[i]
                if not (x0 <= tx_ < x1 and y0 <= ty_ < y1):
                    continue
                dx = px[i] - xx
                dy = py[i] - yy
                power = (-0.5 * (conics[i][0] * dx * dx
                                 + conics[i][2] * dy * dy)
                         - conics[i][1] * dx * dy)
                if power > 0.0:
                    continue
                alpha = min(0.99, opacities[i] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = T * (1.0 - alpha)
                if test_T < 1e-4:
                    break
                C += colors[i] * alpha * T
                T = test_T
            image[yy, xx] = C + T * background
            alpha_img[yy, xx] = 1.0 - T
    return image, alpha_img, radii
