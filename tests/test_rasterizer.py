"""Rasterizer correctness: analytic single-splat values, a dense (untiled)
oracle implementing the CUDA compositing spec directly, and gradient parity
between the tiled production path and the oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsavatar.camera.camera import make_camera
from gsavatar.ops.rasterizer import RasterizeConfig, rasterize
from gsavatar.ops.rasterizer import project as proj_mod
from gsavatar.utils.transforms import covariance_from_scaling_rotation

H = W = 64


def _camera():
    R = np.eye(3)
    T = np.array([0.0, 0.0, 3.0])  # camera 3 units back, looking at origin
    img = np.zeros((H, W, 3), np.float32)
    return make_camera(R=R, T=T, fovx=0.8, fovy=0.8, image=img,
                       mask=np.zeros((H, W), np.float32),
                       rots=np.zeros((1, 24, 9)), Jtrs=np.zeros((1, 24, 3)),
                       bone_transforms=np.tile(np.eye(4), (24, 1, 1)))


def _scene(n, seed=0, spread=0.5, scale=0.05):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    s = (scale * (0.5 + rng.random((n, 3)))).astype(np.float32)
    cov = covariance_from_scaling_rotation(jnp.asarray(s), 1.0, jnp.asarray(q))
    colors = rng.random((n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n, 1)).astype(np.float32)
    return jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opac), cov


def _oracle_render(means3d, colors, opacities, cov3d, cam, bg):
    """Dense per-pixel front-to-back compositing over ALL gaussians in global
    depth order, restricted to each gaussian's tile rect — the CUDA spec
    without any pair-capacity machinery."""
    prj = proj_mod.project(means3d, cov3d,
                           jnp.asarray(cam.world_view_transform),
                           jnp.asarray(cam.full_proj_transform),
                           cam.tanfovx, cam.tanfovy, W, H)
    order = jnp.argsort(prj.depths)
    m2d = prj.means2d[order]
    con = prj.conics[order]
    col = colors[order]
    op = opacities.reshape(-1)[order]
    vis = (prj.radii[order] > 0)
    r0 = prj.rect_min[order]
    r1 = prj.rect_max[order]

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing='ij')
    tile_x = (xs // 16).astype(jnp.int32)
    tile_y = (ys // 16).astype(jnp.int32)

    dx = m2d[:, 0][:, None, None] - xs[None]
    dy = m2d[:, 1][:, None, None] - ys[None]
    power = -0.5 * (con[:, 0][:, None, None] * dx * dx
                    + con[:, 2][:, None, None] * dy * dy) \
        - con[:, 1][:, None, None] * dx * dy
    alpha = jnp.minimum(0.99, op[:, None, None] * jnp.exp(power))
    in_rect = ((tile_x[None] >= r0[:, 0][:, None, None])
               & (tile_x[None] < r1[:, 0][:, None, None])
               & (tile_y[None] >= r0[:, 1][:, None, None])
               & (tile_y[None] < r1[:, 1][:, None, None]))
    skip = (power > 0) | (alpha < 1.0 / 255.0) | ~in_rect | ~vis[:, None, None]
    log1m = jnp.where(skip, 0.0, jnp.log1p(-alpha))
    cum = jnp.cumsum(log1m, axis=0)
    include = cum >= jnp.log(1e-4)
    T_before = jnp.exp(cum - log1m)
    w = jnp.where(include & ~skip, alpha * T_before, 0.0)
    img = jnp.einsum('nhw,nc->hwc', w, col)
    T_final = jnp.exp(jnp.min(jnp.where(include & ~skip, cum, 0.0), axis=0))
    return img + T_final[..., None] * bg[None, None, :], 1.0 - T_final


def _raster(means, colors, opac, cov, cam, bg, cfg=None):
    cfg = cfg or RasterizeConfig(width=W, height=H, max_pairs=2 ** 14,
                                 per_tile_capacity=256, chunk=32)
    return rasterize(means, colors, opac, cov,
                     viewmatrix=jnp.asarray(cam.world_view_transform),
                     full_projmatrix=jnp.asarray(cam.full_proj_transform),
                     tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                     background=bg, config=cfg)


class TestForward:
    def test_single_gaussian_analytic(self):
        cam = _camera()
        means = jnp.array([[0.0, 0.0, 0.0]])
        colors = jnp.array([[1.0, 0.5, 0.25]])
        opac = jnp.array([[0.8]])
        s = jnp.array([[0.1, 0.1, 0.1]])
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        cov = covariance_from_scaling_rotation(s, 1.0, q)
        bg = jnp.zeros(3)
        res = _raster(means, colors, opac, cov, cam, bg)
        img = np.asarray(res.image)
        assert int(res.pair_overflow) == 0 and int(res.tile_overflow) == 0
        assert res.radii[0] > 0
        # center pixel: isotropic gaussian projected at image center
        prj = proj_mod.project(means, cov, jnp.asarray(cam.world_view_transform),
                               jnp.asarray(cam.full_proj_transform),
                               cam.tanfovx, cam.tanfovy, W, H)
        cx, cy = np.asarray(prj.means2d)[0]
        px, py = int(round(cx)), int(round(cy))
        d = np.array([cx - px, cy - py])
        a, b, c = np.asarray(prj.conics)[0]
        power = -0.5 * (a * d[0] ** 2 + c * d[1] ** 2) - b * d[0] * d[1]
        alpha = min(0.99, 0.8 * np.exp(power))
        np.testing.assert_allclose(img[py, px], alpha * np.array([1.0, 0.5, 0.25]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.alpha)[py, px], alpha, atol=1e-4)

    def test_background_blend(self):
        cam = _camera()
        means, colors, opac, cov = _scene(5)
        bg = jnp.array([0.2, 0.4, 0.6])
        res = _raster(means, colors, opac, cov, cam, bg)
        img = np.asarray(res.image)
        # corner pixels are pure background
        np.testing.assert_allclose(img[0, 0], np.asarray(bg), atol=1e-5)
        np.testing.assert_allclose(np.asarray(res.alpha)[0, 0], 0.0, atol=1e-6)

    def test_matches_oracle(self):
        cam = _camera()
        means, colors, opac, cov = _scene(60, seed=3)
        bg = jnp.array([0.1, 0.1, 0.1])
        res = _raster(means, colors, opac, cov, cam, bg)
        oracle_img, oracle_alpha = _oracle_render(means, colors, opac, cov, cam, bg)
        assert int(res.pair_overflow) == 0 and int(res.tile_overflow) == 0
        np.testing.assert_allclose(np.asarray(res.image), np.asarray(oracle_img),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(res.alpha), np.asarray(oracle_alpha),
                                   atol=2e-4)

    def test_depth_ordering_occlusion(self):
        cam = _camera()
        # camera convention: p_cam = p_world + T, so world z=-1 sits at
        # camera depth 2 (in front of world z=+1 at depth 4): green occludes
        means = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        opac = jnp.array([[0.99], [0.99]])
        s = jnp.array([[0.2, 0.2, 0.2]] * 2)
        q = jnp.array([[1.0, 0, 0, 0]] * 2)
        cov = covariance_from_scaling_rotation(s, 1.0, q)
        res = _raster(means, colors, opac, cov, cam, jnp.zeros(3))
        img = np.asarray(res.image)
        center = img[H // 2, W // 2]
        assert center[1] > 0.9 and center[0] < 0.05  # front (green) wins

    def test_inactive_mask(self):
        cam = _camera()
        means, colors, opac, cov = _scene(10, seed=4)
        bg = jnp.zeros(3)
        active = jnp.zeros(10, bool).at[:5].set(True)
        res_mask = rasterize(means, colors, opac, cov,
                             viewmatrix=jnp.asarray(cam.world_view_transform),
                             full_projmatrix=jnp.asarray(cam.full_proj_transform),
                             tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                             background=bg, active=active,
                             config=RasterizeConfig(width=W, height=H,
                                                    max_pairs=2 ** 14,
                                                    per_tile_capacity=256,
                                                    chunk=32))
        res_five = _raster(means[:5], colors[:5], opac[:5], cov[:5], cam, bg)
        np.testing.assert_allclose(np.asarray(res_mask.image),
                                   np.asarray(res_five.image), atol=1e-5)
        assert np.all(np.asarray(res_mask.radii[5:]) == 0)


class TestGradients:
    def test_grads_match_oracle(self):
        cam = _camera()
        means, colors, opac, cov = _scene(25, seed=7)
        bg = jnp.array([0.3, 0.2, 0.1])
        target = jnp.asarray(np.random.default_rng(0).random((H, W, 3)),
                             jnp.float32)

        def loss_tiled(m, c, o, cv):
            return jnp.mean((_raster(m, c, o, cv, cam, bg).image - target) ** 2)

        def loss_oracle(m, c, o, cv):
            return jnp.mean((_oracle_render(m, c, o, cv, cam, bg)[0] - target) ** 2)

        g_t = jax.grad(loss_tiled, argnums=(0, 1, 2, 3))(means, colors, opac, cov)
        g_o = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(means, colors, opac, cov)
        for a, b, name in zip(g_t, g_o, ["means", "colors", "opac", "cov"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                       err_msg=name)
            assert np.isfinite(np.asarray(a)).all()

    def test_means2d_offset_gradient(self):
        cam = _camera()
        means, colors, opac, cov = _scene(12, seed=9)
        bg = jnp.zeros(3)
        cfg = RasterizeConfig(width=W, height=H, max_pairs=2 ** 14,
                              per_tile_capacity=256, chunk=32)

        def loss(off):
            res = rasterize(means, colors, opac, cov,
                            viewmatrix=jnp.asarray(cam.world_view_transform),
                            full_projmatrix=jnp.asarray(cam.full_proj_transform),
                            tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                            background=bg, config=cfg, means2d_offset=off)
            return jnp.sum(res.image ** 2)

        g = jax.grad(loss)(jnp.zeros((12, 2)))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0.0
