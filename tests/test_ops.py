"""Unit tests: KNN, SSIM, grid sampling, surface sampling, PLY I/O."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from gsavatar.ops import knn
from gsavatar.ops.interp import grid_sample_3d
from gsavatar.ops.sampling import sample_skinning_pool, sample_surface
from gsavatar.ops.ssim import ssim
from gsavatar.utils import ply


class TestKNN:
    def test_nn_index_matches_kdtree(self):
        rng = np.random.default_rng(0)
        q = rng.random((500, 3)).astype(np.float32)
        p = rng.random((300, 3)).astype(np.float32)
        got = np.asarray(knn.nn_index(jnp.asarray(q), jnp.asarray(p),
                                      chunk=128))
        _, expect = cKDTree(p).query(q)
        np.testing.assert_array_equal(got, expect)

    def test_knn_self_excludes_self(self):
        rng = np.random.default_rng(1)
        x = rng.random((200, 3)).astype(np.float32)
        idx = np.asarray(knn.knn_self(jnp.asarray(x), 5, chunk=64))
        assert idx.shape == (200, 5)
        assert not np.any(idx == np.arange(200)[:, None])
        _, expect = cKDTree(x).query(x, k=6)
        np.testing.assert_array_equal(np.sort(idx, 1),
                                      np.sort(expect[:, 1:], 1))

    def test_mean_dist3(self):
        rng = np.random.default_rng(2)
        x = rng.random((100, 3)).astype(np.float32)
        got = np.asarray(knn.mean_dist3(jnp.asarray(x), chunk=64))
        d, _ = cKDTree(x).query(x, k=4)
        expect = (d[:, 1:] ** 2).mean(1)
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_masked_self_knn(self):
        rng = np.random.default_rng(3)
        x = rng.random((64, 3)).astype(np.float32)
        mask = jnp.zeros(64, bool).at[:32].set(True)
        idx = np.asarray(knn.knn_self(jnp.asarray(x), 3, chunk=64, mask=mask))
        assert np.all(idx[:32] < 32)  # alive points only pick alive neighbors


class TestSSIM:
    def test_identical_is_one(self):
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
        assert float(ssim(img, img)) > 0.999

    def test_noise_lowers(self):
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
        b = jnp.clip(a + 0.3 * jnp.asarray(rng.random((32, 32, 3))), 0, 1)
        s = float(ssim(a, b))
        assert 0.0 < s < 0.95

    def test_matches_torch_reference_formula(self):
        # cross-check against a direct conv implementation in numpy
        import torch
        import torch.nn.functional as F
        from math import exp
        rng = np.random.default_rng(6)
        a = rng.random((3, 24, 24)).astype(np.float32)
        b = rng.random((3, 24, 24)).astype(np.float32)

        g = torch.tensor([exp(-(x - 5) ** 2 / (2 * 1.5 ** 2))
                          for x in range(11)])
        g = (g / g.sum()).unsqueeze(1)
        win = g.mm(g.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11)
        ta, tb = torch.from_numpy(a)[None], torch.from_numpy(b)[None]
        mu1 = F.conv2d(ta, win, padding=5, groups=3)
        mu2 = F.conv2d(tb, win, padding=5, groups=3)
        s1 = F.conv2d(ta * ta, win, padding=5, groups=3) - mu1 ** 2
        s2 = F.conv2d(tb * tb, win, padding=5, groups=3) - mu2 ** 2
        s12 = F.conv2d(ta * tb, win, padding=5, groups=3) - mu1 * mu2
        C1, C2 = 0.01 ** 2, 0.03 ** 2
        expect = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2))
                  / ((mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))).mean()
        got = float(ssim(jnp.asarray(a.transpose(1, 2, 0)),
                         jnp.asarray(b.transpose(1, 2, 0))))
        assert abs(got - float(expect)) < 1e-5


class TestGridSample:
    def test_matches_torch(self):
        import torch
        import torch.nn.functional as F
        rng = np.random.default_rng(7)
        vol = rng.random((4, 8, 16, 16)).astype(np.float32)
        coords = (rng.random((50, 3)) * 2 - 1).astype(np.float32)
        got = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))
        tv = torch.from_numpy(vol)[None]
        tc = torch.from_numpy(coords).reshape(1, 1, 1, -1, 3)
        expect = F.grid_sample(tv, tc, padding_mode='border',
                               align_corners=False)
        expect = expect.reshape(4, -1).T.numpy()
        np.testing.assert_allclose(got, expect, atol=1e-5)


class TestSampling:
    def test_surface_points_on_triangles(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                         np.float32)
        faces = np.array([[0, 1, 2], [0, 1, 3]])
        pts, fi, bary = sample_surface(verts, faces, 200, seed=0)
        np.testing.assert_allclose(bary.sum(1), 1.0, atol=1e-6)
        recon = (verts[faces[fi]] * bary[..., None]).sum(1)
        np.testing.assert_allclose(pts, recon, atol=1e-5)

    def test_skinning_pool_weights_normalized(self):
        from gsavatar.smpl.body_model import synthetic_assets
        a = synthetic_assets(n_verts=256, seed=0)
        pts, w = sample_skinning_pool(a.v_template, a.faces,
                                      a.skinning_weights, pool_size=512)
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-4)
        assert pts.shape == (512, 3) and w.shape == (512, 24)


class TestPly:
    def test_arena_roundtrip(self, tmp_path):
        from gsavatar.core import gaussians as G
        rng = np.random.default_rng(8)
        params, aux = G.create_from_pcd(
            rng.random((20, 3)).astype(np.float32),
            rng.random((20, 3)).astype(np.float32), capacity=32, use_sh=True)
        p = str(tmp_path / "pc.ply")
        ply.save_arena_ply(p, params, aux)
        back = ply.load_gaussian_ply(p)
        np.testing.assert_allclose(back['xyz'],
                                   np.asarray(params.xyz)[:20], atol=1e-6)
        np.testing.assert_allclose(back['features_dc'],
                                   np.asarray(params.features_dc)[:20],
                                   atol=1e-6)
        np.testing.assert_allclose(back['features_rest'],
                                   np.asarray(params.features_rest)[:20],
                                   atol=1e-6)
        np.testing.assert_allclose(back['rotation'],
                                   np.asarray(params.rotation)[:20], atol=1e-6)


class TestLossTerms:
    def test_opacity_entropy_matches_reference_formula(self):
        from gsavatar import losses as L
        rng = np.random.default_rng(3)
        o = rng.uniform(0.01, 0.99, (50, 1)).astype(np.float32)
        alive = np.ones(50, bool)
        got = float(L.opacity_entropy_loss(jnp.asarray(o), jnp.asarray(alive)))
        eps = 1e-6  # gaussian_model.py:165-170
        want = float(np.mean(-(o * np.log(o + eps)
                               + (1 - o) * np.log(1 - o + eps))))
        assert abs(got - want) < 1e-4

    def test_opacity_entropy_masks_dead_slots(self):
        from gsavatar import losses as L
        o = np.full((10, 1), 0.5, np.float32)
        alive = np.zeros(10, bool)
        alive[:4] = True
        got = float(L.opacity_entropy_loss(jnp.asarray(o), jnp.asarray(alive)))
        assert abs(got - float(np.log(2) + 2e-6 * 0)) < 1e-4

    def test_foreground_crop_centers_on_mask(self):
        from gsavatar import losses as L
        img = jnp.asarray(np.arange(64 * 64 * 3, dtype=np.float32)
                          .reshape(64, 64, 3))
        mask = np.zeros((64, 64), np.float32)
        mask[40:50, 10:20] = 1.0  # centroid (44.5, 14.5)
        r, g = L.foreground_crop(img, img, jnp.asarray(mask), (16, 16))
        assert r.shape == (16, 16, 3)
        np.testing.assert_allclose(np.asarray(r), np.asarray(g))
        # crop window should cover the mask centroid
        np.testing.assert_allclose(np.asarray(r)[0, 0, 0],
                                   np.asarray(img)[44 - 8 + 1 - 1, 14 - 8 + 1 - 1, 0])

    def test_foreground_crop_empty_mask_degrades_to_center(self):
        from gsavatar import losses as L
        img = jnp.zeros((32, 32, 3))
        mask = jnp.zeros((32, 32))
        r, g = L.foreground_crop(img, img, mask, (16, 16))
        assert r.shape == (16, 16, 3)


class TestSegsum:
    def test_segment_sum_matches_scatter(self):
        import numpy as np
        from gsavatar.ops import segsum
        rng = np.random.default_rng(0)
        M, S, C = 5000, 257, 3
        ids = jnp.asarray(rng.integers(0, S + 40, M), jnp.int32)  # some OOB
        vals = jnp.asarray(rng.normal(size=(M, C)), jnp.float32)
        want = np.zeros((S, C), np.float32)
        np.add.at(want, np.clip(np.asarray(ids), 0, None)
                  [np.asarray(ids) < S], np.asarray(vals)[np.asarray(ids) < S])
        got = np.asarray(segsum.segment_sum(vals, ids, S))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_gather_rows_grad_matches_plain(self):
        import numpy as np
        from gsavatar.ops import segsum
        rng = np.random.default_rng(1)
        S, M, C = 123, 4096, 2
        src = jnp.asarray(rng.normal(size=(S, C)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, S, M), jnp.int32)
        ct = jnp.asarray(rng.normal(size=(M, C)), jnp.float32)

        def f_fast(s):
            return jnp.sum(segsum.gather_rows(s, idx) * ct)

        def f_ref(s):
            return jnp.sum(s[idx] * ct)

        gf = jax.grad(f_fast)(src)
        gr = jax.grad(f_ref)(src)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)
