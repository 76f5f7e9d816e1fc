"""Fused pallas compositor (interpret mode) vs the XLA reference path:
forward image/alpha and full gradient parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsavatar.camera.camera import make_camera
from gsavatar.ops.rasterizer import RasterizeConfig, rasterize
from gsavatar.utils.transforms import covariance_from_scaling_rotation

H = W = 64


def _camera():
    return make_camera(R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                       fovx=0.8, fovy=0.8,
                       image=np.zeros((H, W, 3), np.float32),
                       mask=np.zeros((H, W), np.float32),
                       rots=np.zeros((1, 24, 9)), Jtrs=np.zeros((1, 24, 3)),
                       bone_transforms=np.tile(np.eye(4), (24, 1, 1)))


def _scene(n, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    s = jnp.asarray(0.05 * (0.5 + rng.random((n, 3))), jnp.float32)
    cov = covariance_from_scaling_rotation(s, 1.0, q)
    colors = jnp.asarray(rng.random((n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, (n, 1)), jnp.float32)
    return means, colors, opac, cov


def _run(backend, means, colors, opac, cov, cam, bg):
    cfg = RasterizeConfig(width=W, height=H, max_pairs=2 ** 13,
                          per_tile_capacity=256, chunk=32, backend=backend)
    return rasterize(means, colors, opac, cov,
                     viewmatrix=jnp.asarray(cam.world_view_transform),
                     full_projmatrix=jnp.asarray(cam.full_proj_transform),
                     tanfovx=cam.tanfovx, tanfovy=cam.tanfovy,
                     background=bg, config=cfg)


class TestPallasParity:
    def test_forward_matches_xla(self):
        cam = _camera()
        means, colors, opac, cov = _scene(40, seed=1)
        bg = jnp.array([0.2, 0.1, 0.3])
        r_x = _run('xla', means, colors, opac, cov, cam, bg)
        r_p = _run('pallas_interpret', means, colors, opac, cov, cam, bg)
        assert int(r_p.pair_overflow) == 0
        np.testing.assert_allclose(np.asarray(r_p.image),
                                   np.asarray(r_x.image), atol=3e-4)
        np.testing.assert_allclose(np.asarray(r_p.alpha),
                                   np.asarray(r_x.alpha), atol=3e-4)

    def test_gradients_match_xla(self):
        cam = _camera()
        means, colors, opac, cov = _scene(20, seed=2)
        bg = jnp.array([0.3, 0.2, 0.1])
        target = jnp.asarray(np.random.default_rng(0).random((H, W, 3)),
                             jnp.float32)

        def loss(backend, m, c, o, cv):
            r = _run(backend, m, c, o, cv, cam, bg)
            return jnp.mean((r.image - target) ** 2) \
                + 0.1 * jnp.mean(r.alpha ** 2)

        g_x = jax.grad(lambda *a: loss('xla', *a), argnums=(0, 1, 2, 3))(
            means, colors, opac, cov)
        g_p = jax.grad(lambda *a: loss('pallas_interpret', *a),
                       argnums=(0, 1, 2, 3))(means, colors, opac, cov)
        for a, b, name in zip(g_p, g_x, ['means', 'colors', 'opac', 'cov']):
            assert np.isfinite(np.asarray(a)).all(), name
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3, err_msg=name)

    def test_background_gradient(self):
        cam = _camera()
        means, colors, opac, cov = _scene(10, seed=3)

        def loss(bg):
            r = _run('pallas_interpret', means, colors, opac, cov, cam, bg)
            return jnp.sum(r.image)

        g = jax.grad(loss)(jnp.array([0.1, 0.2, 0.3]))
        # every fully-background pixel contributes 1 to each channel grad
        assert np.all(np.asarray(g) > 0)
        assert np.isfinite(np.asarray(g)).all()
