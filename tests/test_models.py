"""Model-stack unit tests: shapes, gates, and reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsavatar.models.embedders import get_embedder, get_hannw_embedder, hannw_weights
from gsavatar.models.hashgrid import HashGrid
from gsavatar.models.mlp import VanillaCondMLP
from gsavatar.models.pose_encoder import HierarchicalPoseEncoder
from gsavatar.models.rigid import hierarchical_softmax


class TestEmbedders:
    def test_embedder_layout(self):
        fn, dim = get_embedder(4, input_dims=3)
        assert dim == 3 * (1 + 2 * 4)
        x = jnp.ones((5, 3)) * 0.3
        y = fn(x)
        assert y.shape == (5, dim)
        np.testing.assert_allclose(np.asarray(y[:, :3]), 0.3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y[:, 3:6]),
                                   np.sin(0.3), atol=1e-6)  # sin(x * 2^0)
        np.testing.assert_allclose(np.asarray(y[:, 6:9]),
                                   np.cos(0.3), atol=1e-6)

    def test_hannw_annealing(self):
        w0 = np.asarray(hannw_weights(0, 6, kick_in_iter=100,
                                      full_band_iter=1000))
        w_mid = np.asarray(hannw_weights(550, 6, 100, 1000))
        w_full = np.asarray(hannw_weights(5000, 6, 100, 1000))
        assert w0.sum() == 0.0
        assert 0 < w_mid.sum() < 6
        np.testing.assert_allclose(w_full, 1.0, atol=1e-6)

    def test_hannw_embedder_no_identity(self):
        fn, dim = get_hannw_embedder(6, 100, 1000)
        assert dim == 3 * 2 * 6
        y = fn(jnp.ones((4, 3)), jnp.int32(5000))
        assert y.shape == (4, dim)


class TestCondMLP:
    def test_skip_and_cond_shapes(self):
        mlp = VanillaCondMLP(dim_in=3, dim_cond=7, dim_out=10, n_neurons=32,
                             n_hidden_layers=4, skip_in=(2,), cond_in=(0,),
                             multires=4)
        params = mlp.init(jax.random.PRNGKey(0), jnp.ones((6, 3)),
                          cond=jnp.ones((1, 7)))
        out = mlp.apply(params, jnp.ones((6, 3)), cond=jnp.ones((1, 7)))
        assert out.shape == (6, 10)

    def test_last_layer_init_small(self):
        mlp = VanillaCondMLP(dim_in=3, dim_cond=0, dim_out=4, n_neurons=16,
                             n_hidden_layers=2, last_layer_init=True)
        params = mlp.init(jax.random.PRNGKey(0), jnp.ones((2, 3)))
        w_last = params['params']['lin2']['kernel']
        assert float(jnp.abs(w_last).max()) < 1e-3
        b_last = params['params']['lin2']['bias']
        np.testing.assert_array_equal(np.asarray(b_last), 0.0)


class TestPoseEncoder:
    def test_output_dim(self):
        enc = HierarchicalPoseEncoder()
        rots = jnp.zeros((1, 24, 9)).at[:, :, 0].set(1).at[:, :, 4].set(1) \
            .at[:, :, 8].set(1)
        Jtrs = jnp.asarray(np.random.default_rng(0).random((1, 24, 3)),
                           jnp.float32)
        params = enc.init(jax.random.PRNGKey(1), rots, Jtrs)
        out = enc.apply(params, rots, Jtrs)
        assert out.shape == (1, 144)
        assert np.isfinite(np.asarray(out)).all()


class TestHierarchicalSoftmax:
    def test_sums_to_one(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(50, 25)), jnp.float32)
        p = np.asarray(hierarchical_softmax(x))
        assert p.shape == (50, 24)
        assert (p >= 0).all()
        np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-5)

    def test_root_gate(self):
        # very negative gate logit -> all mass on joint 0
        x = jnp.zeros((2, 25)).at[:, 0].set(-30.0)
        p = np.asarray(hierarchical_softmax(x))
        np.testing.assert_allclose(p[:, 0], 1.0, atol=1e-5)


class TestHashGrid:
    def test_shapes_and_grads(self):
        hg = HashGrid(n_levels=4, n_features_per_level=2,
                      log2_hashmap_size=10, base_resolution=4,
                      max_resolution=32)
        x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (20, 3)),
                        jnp.float32)
        params = hg.init(jax.random.PRNGKey(0), x)
        out = hg.apply(params, x)
        assert out.shape == (20, 8)

        def loss(p, xx):
            return jnp.sum(hg.apply(p, xx) ** 2)

        g_p, g_x = jax.grad(loss, argnums=(0, 1))(params, x)
        assert float(jnp.abs(g_x).max()) > 0  # differentiable wrt positions
        assert np.isfinite(np.asarray(g_x)).all()

    def test_continuity(self):
        hg = HashGrid(n_levels=4, n_features_per_level=2,
                      log2_hashmap_size=10, base_resolution=4,
                      max_resolution=32)
        x = jnp.zeros((1, 3)) + 0.3
        params = hg.init(jax.random.PRNGKey(0), x)
        a = hg.apply(params, x)
        b = hg.apply(params, x + 1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
