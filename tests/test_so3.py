import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from fast_limo_tpu.ops import so3


def rand_quat(rng, n=None):
    q = rng.normal(size=(n, 4) if n else (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def to_scipy(q):  # wxyz -> xyzw
    return Rotation.from_quat(np.roll(np.asarray(q), -1, axis=-1))


class TestQuatOps:
    def test_mul_matches_scipy(self, rng):
        q1, q2 = rand_quat(rng), rand_quat(rng)
        got = to_scipy(so3.quat_mul(jnp.asarray(q1), jnp.asarray(q2))).as_matrix()
        want = (to_scipy(q1) * to_scipy(q2)).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_rotate_matches_matrix(self, rng):
        q = rand_quat(rng, 5)
        v = rng.normal(size=(5, 3))
        got = so3.quat_rotate(jnp.asarray(q), jnp.asarray(v))
        want = np.einsum("nij,nj->ni", to_scipy(q).as_matrix(), v)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_quat_to_mat(self, rng):
        q = rand_quat(rng, 7)
        np.testing.assert_allclose(
            so3.quat_to_mat(jnp.asarray(q)), to_scipy(q).as_matrix(), atol=1e-12)

    def test_mat_to_quat_roundtrip(self, rng):
        q = rand_quat(rng, 20)
        q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
        R = to_scipy(q).as_matrix()
        q2 = np.asarray(so3.mat_to_quat(jnp.asarray(R)))
        q2 = np.where(q2[:, :1] < 0, -q2, q2)
        np.testing.assert_allclose(q2, q, atol=1e-8)

    def test_mat_to_quat_axis_aligned(self):
        # exercise all four Shepperd branches
        for rotvec in ([0, 0, 0], [np.pi * 0.999, 0, 0], [0, np.pi * 0.999, 0],
                       [0, 0, np.pi * 0.999], [2, 2, -1]):
            R = Rotation.from_rotvec(rotvec).as_matrix()
            q = np.asarray(so3.mat_to_quat(jnp.asarray(R)))
            np.testing.assert_allclose(so3.quat_to_mat(jnp.asarray(q)), R, atol=1e-7)


class TestExpLog:
    def test_exp_matches_scipy(self, rng):
        v = rng.normal(size=(10, 3)) * 2
        got = to_scipy(so3.exp_quat(jnp.asarray(v))).as_matrix()
        want = Rotation.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_exp_small_angle(self):
        v = jnp.asarray([1e-12, -2e-12, 1e-13])
        q = so3.exp_quat(v)
        np.testing.assert_allclose(np.asarray(q[1:]), np.asarray(v) / 2, rtol=1e-6)
        assert np.asarray(q[0]) == pytest.approx(1.0)

    def test_log_inverse_of_exp(self, rng):
        v = rng.normal(size=(10, 3))
        v = v / np.linalg.norm(v, axis=-1, keepdims=True) * rng.uniform(1e-8, 3.0, (10, 1))
        v2 = so3.log_quat(so3.exp_quat(jnp.asarray(v)))
        np.testing.assert_allclose(np.asarray(v2), v, atol=1e-9)

    def test_boxplus_boxminus_inverse(self, rng):
        q = jnp.asarray(rand_quat(rng, 8))
        d = jnp.asarray(rng.normal(size=(8, 3)) * 0.5)
        d2 = so3.boxminus(so3.boxplus(q, d), q)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-10)


class TestAMatrix:
    def test_A_matrix_closed_form(self, rng):
        v = rng.normal(size=3)
        n = np.linalg.norm(v)
        K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        want = (np.eye(3) + (1 - np.cos(n)) / n**2 * K
                + (1 - np.sin(n) / n) / n**2 * K @ K)
        np.testing.assert_allclose(so3.A_matrix(jnp.asarray(v)), want, atol=1e-12)

    def test_A_matrix_identity_at_zero(self):
        np.testing.assert_allclose(
            so3.A_matrix(jnp.zeros(3)), np.eye(3), atol=1e-15)

    def test_A_matrix_is_dexp(self, rng):
        # A(v)^T is the right Jacobian: exp(v+eps*d) ≈ exp(v)*exp(A(v)^T... )
        # verify numerically: d/dt log(exp(v)^{-1} exp(v+t d))|_0 == A(v)^T d
        v = rng.normal(size=3)
        d = rng.normal(size=3)
        eps = 1e-7
        q0 = so3.exp_quat(jnp.asarray(v))
        q1 = so3.exp_quat(jnp.asarray(v + eps * d))
        num = np.asarray(so3.log_quat(so3.quat_mul(so3.quat_conj(q0), q1))) / eps
        want = np.asarray(so3.A_matrix(jnp.asarray(v))).T @ d
        np.testing.assert_allclose(num, want, atol=1e-6)
