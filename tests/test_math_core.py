"""Golden tests for the math core against independent numpy/scipy oracles."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from gsavatar.ops import sh
from gsavatar.smpl import lbs as smpl_lbs
from gsavatar.smpl.vitruvian import get_02v_bone_transforms, get_02v_bone_transforms_jax
from gsavatar.smpl.body_model import synthetic_assets, KTREE_PARENTS
from gsavatar.utils import transforms as T
from gsavatar.utils.aabb import AABB


def _rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q.astype(np.float32)


class TestRotations:
    def test_quat_to_rotmat_matches_scipy(self):
        q = _rand_quats(64)
        ours = np.asarray(T.quat_to_rotmat(jnp.asarray(q)))
        # scipy uses xyzw order
        theirs = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_quat_multiply_matches_scipy(self):
        a, b = _rand_quats(32, 1), _rand_quats(32, 2)
        ours = np.asarray(T.quat_multiply(jnp.asarray(a), jnp.asarray(b)))
        ra = R.from_quat(a[:, [1, 2, 3, 0]] / np.linalg.norm(a, axis=1, keepdims=True))
        rb = R.from_quat(b[:, [1, 2, 3, 0]] / np.linalg.norm(b, axis=1, keepdims=True))
        prod = (ra * rb).as_quat()[:, [3, 0, 1, 2]]
        norm = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        ours_unit = ours / norm[:, None]
        # sign-invariant comparison
        sign = np.sign((ours_unit * prod).sum(1, keepdims=True))
        np.testing.assert_allclose(ours_unit, sign * prod, atol=1e-5)

    def test_rotmat_to_quat_roundtrip(self):
        q = _rand_quats(128, 3)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        mats = T.quat_to_rotmat(jnp.asarray(q))
        back = np.asarray(T.rotmat_to_quat(mats))
        sign = np.sign((back * q).sum(1, keepdims=True))
        np.testing.assert_allclose(sign * back, q, atol=1e-4)

    def test_rodrigues_matches_scipy(self):
        rng = np.random.default_rng(4)
        aa = rng.normal(scale=1.2, size=(64, 3)).astype(np.float32)
        ours = np.asarray(T.rodrigues(jnp.asarray(aa)))
        theirs = R.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_rodrigues_zero_angle(self):
        out = np.asarray(T.rodrigues(jnp.zeros((3, 3))))
        np.testing.assert_allclose(out, np.eye(3)[None].repeat(3, 0), atol=1e-5)


class TestCovariance:
    def test_covariance_equals_R_S2_Rt(self):
        rng = np.random.default_rng(5)
        q = _rand_quats(16, 5)
        s = np.exp(rng.normal(size=(16, 3))).astype(np.float32)
        cov6 = np.asarray(T.covariance_from_scaling_rotation(
            jnp.asarray(s), 1.0, jnp.asarray(q)))
        Rm = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        full = Rm @ (s[..., None] ** 2 * np.eye(3)) @ np.transpose(Rm, (0, 2, 1))
        expect = np.stack([full[:, 0, 0], full[:, 0, 1], full[:, 0, 2],
                           full[:, 1, 1], full[:, 1, 2], full[:, 2, 2]], -1)
        np.testing.assert_allclose(cov6, expect, atol=1e-4)

    def test_unstrip_roundtrip(self):
        rng = np.random.default_rng(6)
        A = rng.normal(size=(8, 3, 3))
        S = A @ np.transpose(A, (0, 2, 1))
        u = T.strip_symmetric(jnp.asarray(S))
        back = np.asarray(T.unstrip_symmetric(u))
        np.testing.assert_allclose(back, S, atol=1e-5)


class TestSH:
    def test_orthonormality_monte_carlo(self):
        # int_{S^2} Y_i Y_j dOmega = delta_ij; MC estimate
        rng = np.random.default_rng(7)
        d = rng.normal(size=(100_000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        B = np.asarray(sh.eval_sh_bases(3, jnp.asarray(d, jnp.float32)))
        gram = 4 * np.pi * (B.T @ B) / len(d)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    def test_eval_sh_is_linear_combination(self):
        rng = np.random.default_rng(8)
        coeffs = rng.normal(size=(10, 3, 16)).astype(np.float32)
        dirs = rng.normal(size=(10, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        for deg in range(4):
            got = np.asarray(sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs)))
            basis = np.asarray(sh.eval_sh_bases(deg, jnp.asarray(dirs)))
            expect = np.einsum('ncb,nb->nc', coeffs[:, :, :basis.shape[-1]], basis)
            np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_rgb_sh_roundtrip(self):
        x = jnp.asarray([0.1, 0.5, 0.9])
        np.testing.assert_allclose(np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(x))), np.asarray(x), atol=1e-6)


class TestSchedules:
    def test_expon_lr_endpoints(self):
        f = T.expon_lr_schedule(1e-2, 1e-4, max_steps=1000)
        assert np.isclose(float(f(0)), 1e-2, rtol=1e-5)
        assert np.isclose(float(f(1000)), 1e-4, rtol=1e-5)
        assert np.isclose(float(f(500)), 1e-3, rtol=1e-4)  # log-linear midpoint
        assert float(f(-1)) == 0.0

    def test_expon_lr_delay(self):
        f = T.expon_lr_schedule(1e-2, 1e-4, lr_delay_steps=100,
                                lr_delay_mult=0.01, max_steps=1000)
        assert float(f(0)) < 1e-3  # delayed start
        assert np.isclose(float(f(100)), float(T.expon_lr_schedule(1e-2, 1e-4, max_steps=1000)(100)), rtol=1e-4)


class TestLBS:
    def setup_method(self):
        self.assets = synthetic_assets(n_verts=512, seed=0)

    def _run(self, pose, betas=None):
        a = self.assets
        betas = betas if betas is not None else np.zeros((1, 10), np.float32)
        return smpl_lbs.lbs(
            jnp.asarray(betas), jnp.asarray(pose),
            jnp.asarray(a.v_template)[None], jnp.asarray(a.shapedirs),
            jnp.asarray(a.posedirs), jnp.asarray(a.J_regressor),
            a.parents, jnp.asarray(a.skinning_weights))

    def test_rest_pose_identity(self):
        pose = np.zeros((1, 72), np.float32)
        verts, J_posed, J_rest, A, abs_A, v_posed, v_shaped, rot_mats = self._run(pose)
        np.testing.assert_allclose(np.asarray(J_posed), np.asarray(J_rest), atol=1e-5)
        np.testing.assert_allclose(np.asarray(verts), np.asarray(v_posed), atol=1e-4)
        # relative transforms are identity at rest
        np.testing.assert_allclose(np.asarray(A),
                                   np.tile(np.eye(4), (1, 24, 1, 1)), atol=1e-4)

    def test_global_rotation_rotates_everything(self):
        aa = np.array([0.3, -0.2, 0.5], np.float32)
        pose = np.zeros((1, 72), np.float32)
        pose[0, :3] = aa
        verts_r, J_posed_r, J_rest, *_ = self._run(pose)
        verts_0, J_posed_0, *_ = self._run(np.zeros((1, 72), np.float32))
        Rm = R.from_rotvec(aa).as_matrix()
        root = np.asarray(J_rest)[0, 0]
        expect = (np.asarray(J_posed_0)[0] - root) @ Rm.T + root
        np.testing.assert_allclose(np.asarray(J_posed_r)[0], expect, atol=1e-4)
        expect_v = (np.asarray(verts_0)[0] - root) @ Rm.T + root
        np.testing.assert_allclose(np.asarray(verts_r)[0], expect_v, atol=1e-3)

    def test_bone_lengths_preserved(self):
        rng = np.random.default_rng(11)
        pose = (rng.normal(scale=0.3, size=(1, 72))).astype(np.float32)
        _, J_posed, J_rest, *_ = self._run(pose)
        par = KTREE_PARENTS[1:]
        l_posed = np.linalg.norm(np.asarray(J_posed)[0, 1:] - np.asarray(J_posed)[0, par], axis=1)
        l_rest = np.linalg.norm(np.asarray(J_rest)[0, 1:] - np.asarray(J_rest)[0, par], axis=1)
        np.testing.assert_allclose(l_posed, l_rest, atol=1e-5)

    def test_betas_move_shape(self):
        betas = np.zeros((1, 10), np.float32)
        betas[0, 0] = 2.0
        v1 = self._run(np.zeros((1, 72), np.float32))[6]
        v2 = self._run(np.zeros((1, 72), np.float32), betas)[6]
        assert float(jnp.abs(v1 - v2).max()) > 1e-4


class TestVitruvian:
    def test_non_leg_joints_identity(self):
        a = synthetic_assets(n_verts=256, seed=1)
        J = a.J_regressor @ a.v_template
        tf = get_02v_bone_transforms(J)
        legs = {1, 4, 7, 10, 2, 5, 8, 11}
        for j in range(24):
            if j not in legs:
                np.testing.assert_allclose(tf[j], np.eye(4), atol=1e-6)

    def test_leg_chain_rotations(self):
        a = synthetic_assets(n_verts=256, seed=1)
        J = a.J_regressor @ a.v_template
        tf = get_02v_bone_transforms(J)
        c45, s45 = np.cos(np.pi / 4), np.sin(np.pi / 4)
        Rp = np.array([[c45, -s45, 0], [s45, c45, 0], [0, 0, 1]])
        for j in (1, 4, 7, 10):
            np.testing.assert_allclose(tf[j, :3, :3], Rp, atol=1e-6)
        for j in (2, 5, 8, 11):
            np.testing.assert_allclose(tf[j, :3, :3], Rp.T, atol=1e-6)

    def test_hip_anchored(self):
        # the hip joint (chain root) must map to a rotation about itself:
        # T @ [j_hip; 1] == j_hip rotated about hip -> equals j_hip
        a = synthetic_assets(n_verts=256, seed=2)
        J = (a.J_regressor @ a.v_template).astype(np.float64)
        tf = get_02v_bone_transforms(J)
        for hip in (1, 2):
            mapped = tf[hip, :3, :3] @ J[hip] + tf[hip, :3, 3]
            np.testing.assert_allclose(mapped, J[hip], atol=1e-5)

    def test_jax_matches_numpy(self):
        a = synthetic_assets(n_verts=256, seed=3)
        J = a.J_regressor @ a.v_template
        np.testing.assert_allclose(
            np.asarray(get_02v_bone_transforms_jax(jnp.asarray(J))),
            get_02v_bone_transforms(J), atol=1e-5)


class TestAABB:
    def test_normalize_roundtrip(self):
        rng = np.random.default_rng(12)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        box = AABB.from_points(pts, padding=0.1)
        x = jnp.asarray(pts)
        for sym in (False, True):
            back = box.unnormalize(box.normalize(x, sym=sym), sym=sym)
            np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)
        n = np.asarray(box.normalize(x, sym=True))
        assert n.min() >= -1.0 and n.max() <= 1.0
