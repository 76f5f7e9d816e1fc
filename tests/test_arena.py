"""Arena densification + Adam surgery semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from gsavatar.core import densify as D
from gsavatar.core import gaussians as G
from gsavatar.core import optim as O


def _setup(n=8, capacity=16, seed=0):
    rng = np.random.default_rng(seed)
    params, aux = G.create_from_pcd(
        rng.random((n, 3)).astype(np.float32) * 0.1,
        rng.random((n, 3)).astype(np.float32), capacity=capacity, use_sh=True)
    adam = O.init_adam(params)
    return params, aux, adam


class TestAdam:
    def test_matches_torch_adam(self):
        import torch
        params, aux, adam = _setup()
        rng = np.random.default_rng(1)
        grads_np = {f: rng.normal(size=np.asarray(getattr(params, f)).shape)
                    .astype(np.float32) for f in
                    ['xyz', 'features_dc', 'features_rest', 'scaling',
                     'rotation', 'opacity']}
        # zero grads on dead slots (as the real pipeline produces)
        alive = np.asarray(aux.alive)
        for f in grads_np:
            grads_np[f][~alive] = 0.0

        t_params = {f: torch.tensor(np.asarray(getattr(params, f))[alive],
                                    requires_grad=True) for f in grads_np}
        opt = torch.optim.Adam([{'params': [t_params[f]], 'lr': 0.01}
                                for f in grads_np], eps=1e-15)
        lrs = {f: 0.01 for f in grads_np}
        p, a = params, adam
        for step in range(3):
            g = G.GaussianParams(**{f: jnp.asarray(grads_np[f])
                                    for f in grads_np})
            p, a = O.adam_step(p, g, a, lrs, aux.alive, apply=True)
            opt.zero_grad()
            for f in grads_np:
                t_params[f].grad = torch.tensor(grads_np[f][alive])
            opt.step()
        for f in grads_np:
            np.testing.assert_allclose(
                np.asarray(getattr(p, f))[alive],
                t_params[f].detach().numpy(), atol=1e-5, err_msg=f)

    def test_delay_gate_freezes(self):
        params, aux, adam = _setup()
        g = jax.tree.map(jnp.ones_like, params)
        p2, a2 = O.adam_step(params, g, adam, {f: 0.1 for f in
                                               ['xyz', 'features_dc',
                                                'features_rest', 'scaling',
                                                'rotation', 'opacity']},
                             aux.alive, apply=False)
        for f in ['xyz', 'scaling']:
            np.testing.assert_array_equal(np.asarray(getattr(p2, f)),
                                          np.asarray(getattr(params, f)))
        assert int(a2.step) == 0


class TestDensify:
    def test_clone_into_free_slots(self):
        params, aux, adam = _setup(n=8, capacity=16)
        # force all alive slots over the grad threshold, scales small -> clone
        aux = aux.replace(xyz_gradient_accum=jnp.where(aux.alive, 1.0, 0.0),
                          denom=jnp.where(aux.alive, 1.0, 0.0))
        p, a, ad, info = D.densify_and_prune(
            params, aux, adam, jax.random.PRNGKey(0), grad_threshold=0.5,
            min_opacity=0.005, extent=100.0, percent_dense=0.01,
            use_screen_size_prune=False)
        assert int(info['n_cloned']) == 8
        assert int(info['n_alive']) == 16
        # clones duplicate the source rows
        src = np.asarray(params.xyz)[:8]
        dst = np.asarray(p.xyz)[8:16]
        np.testing.assert_allclose(np.sort(src, 0), np.sort(dst, 0),
                                   atol=1e-6)
        # stats reset
        assert float(jnp.sum(a.denom)) == 0.0

    def test_split_replaces_parent(self):
        params, aux, adam = _setup(n=4, capacity=16)
        # big scales -> split path
        params = params.replace(scaling=jnp.where(
            aux.alive[:, None], jnp.log(5.0), params.scaling))
        aux = aux.replace(xyz_gradient_accum=jnp.where(aux.alive, 1.0, 0.0),
                          denom=jnp.where(aux.alive, 1.0, 0.0))
        # poison adam moments to check they are reset for children
        adam = adam.replace(m=jax.tree.map(lambda x: x + 1.0, adam.m))
        p, a, ad, info = D.densify_and_prune(
            params, aux, adam, jax.random.PRNGKey(1), grad_threshold=0.5,
            min_opacity=0.005, extent=1.0, percent_dense=0.01,
            use_screen_size_prune=False)
        assert int(info['n_split']) == 4
        # world-size prune off: 8 children alive (scale 5/1.6 > 0.1*extent
        # would prune if enabled)
        assert int(info['n_alive']) == 8
        child_scale = np.exp(np.asarray(p.scaling)[np.asarray(a.alive)])
        np.testing.assert_allclose(child_scale, 5.0 / 1.6, rtol=1e-4)
        # adam moments zeroed on every alive (child) slot
        m_xyz = np.asarray(ad.m.xyz)[np.asarray(a.alive)]
        np.testing.assert_array_equal(m_xyz, 0.0)

    def test_opacity_prune(self):
        params, aux, adam = _setup(n=8, capacity=16)
        low = jnp.zeros(16, bool).at[:4].set(True)
        params = params.replace(opacity=jnp.where(
            low[:, None], -10.0, params.opacity))
        p, a, ad, info = D.densify_and_prune(
            params, aux, adam, jax.random.PRNGKey(2), grad_threshold=0.5,
            min_opacity=0.05, extent=100.0, percent_dense=0.01,
            use_screen_size_prune=False)
        assert int(info['n_pruned']) == 4
        assert int(info['n_alive']) == 4

    def test_reset_opacity(self):
        params, aux, adam = _setup()
        adam = adam.replace(v=jax.tree.map(lambda x: x + 2.0, adam.v))
        p, ad = D.reset_opacity(params, adam, aux.alive)
        op = jax.nn.sigmoid(np.asarray(p.opacity)[np.asarray(aux.alive)])
        assert op.max() <= 0.0101
        np.testing.assert_array_equal(np.asarray(ad.v.opacity), 0.0)
        # other groups untouched
        assert float(np.asarray(ad.v.xyz).min()) == 2.0

    def test_capacity_overflow_drops(self):
        params, aux, adam = _setup(n=14, capacity=16)
        aux = aux.replace(xyz_gradient_accum=jnp.where(aux.alive, 1.0, 0.0),
                          denom=jnp.where(aux.alive, 1.0, 0.0))
        p, a, ad, info = D.densify_and_prune(
            params, aux, adam, jax.random.PRNGKey(3), grad_threshold=0.5,
            min_opacity=0.005, extent=100.0, percent_dense=0.01,
            use_screen_size_prune=False)
        assert int(info['n_cloned']) == 2  # only 2 free slots
        assert int(info['n_dropped']) == 12
        assert int(info['n_alive']) == 16
