"""Unrolled small-matrix Cholesky/solves vs numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from fast_limo_tpu.ops import linalg


def spd(rng, n, cond=1e3):
    A = rng.standard_normal((n, n))
    U, _, Vt = np.linalg.svd(A)
    s = np.logspace(0, -np.log10(cond), n)
    return (U * s) @ U.T


class TestChol:
    def test_matches_numpy(self, rng):
        for n in (3, 12, 23):
            A = spd(rng, n)
            L = np.asarray(linalg.chol(jnp.asarray(A, jnp.float64)))
            np.testing.assert_allclose(L, np.linalg.cholesky(A), atol=1e-8)

    def test_solves(self, rng):
        A = spd(rng, 12)
        B = rng.standard_normal((12, 23))
        x = np.asarray(linalg.spd_solve(jnp.asarray(A, jnp.float64),
                                        jnp.asarray(B, jnp.float64)))
        np.testing.assert_allclose(x, np.linalg.solve(A, B), atol=1e-7)

    def test_triangular_solves_vector(self, rng):
        A = spd(rng, 8)
        L = np.linalg.cholesky(A)
        b = rng.standard_normal(8)
        y = np.asarray(linalg.solve_lower(jnp.asarray(L, jnp.float64),
                                          jnp.asarray(b, jnp.float64)))
        np.testing.assert_allclose(L @ y, b, atol=1e-9)
        z = np.asarray(linalg.solve_upper(jnp.asarray(L.T, jnp.float64),
                                          jnp.asarray(b, jnp.float64)))
        np.testing.assert_allclose(L.T @ z, b, atol=1e-9)

    def test_dead_direction_dropped(self, rng):
        # rank-deficient PSD: factor must stay finite and reproduce the
        # matrix minus (approximately) nothing — the dead direction's pivot
        # is ~0 so dropping it loses ~0 mass
        v = rng.standard_normal((12, 10))
        A = v @ v.T  # rank 10
        L = np.asarray(linalg.chol(jnp.asarray(A, jnp.float64),
                                   dead_thresh=1e-10 * A.max()))
        assert np.isfinite(L).all()
        np.testing.assert_allclose(L @ L.T, A, atol=1e-6)


class TestMaskedCompress:
    def test_exact_with_zero_dims(self, rng):
        # HTH with exactly-zero rows/cols 6:12 (estimate_extrinsics=false)
        H = rng.standard_normal((200, 6))
        Hfull = np.concatenate([H, np.zeros((200, 6))], axis=1)
        r = rng.standard_normal(200)
        HTH = Hfull.T @ Hfull
        HTh = Hfull.T @ r
        Ht, h = linalg.masked_chol_compress(
            jnp.asarray(HTH, jnp.float64), jnp.asarray(HTh, jnp.float64))
        Ht, h = np.asarray(Ht), np.asarray(h)
        np.testing.assert_allclose(Ht.T @ Ht, HTH, atol=1e-8)
        np.testing.assert_allclose(Ht.T @ h, HTh, atol=1e-8)
        # filler rows and columns are fully zero
        assert np.all(Ht[6:] == 0) or np.all(Ht[:, 6:] == 0)

    def test_full_rank(self, rng):
        H = rng.standard_normal((300, 12))
        r = rng.standard_normal(300)
        HTH, HTh = H.T @ H, H.T @ r
        Ht, h = linalg.masked_chol_compress(
            jnp.asarray(HTH, jnp.float64), jnp.asarray(HTh, jnp.float64))
        np.testing.assert_allclose(np.asarray(Ht).T @ np.asarray(Ht), HTH,
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(Ht).T @ np.asarray(h), HTh,
                                   rtol=1e-8, atol=1e-8)

    def test_all_zero(self):
        Ht, h = linalg.masked_chol_compress(
            jnp.zeros((12, 12)), jnp.zeros(12))
        assert np.all(np.asarray(Ht) == 0)
        assert np.all(np.asarray(h) == 0)


class TestQRSolve:
    """ops/linalg.qr_solve — the in-graph innovation solver."""

    @pytest.fixture
    def rng(self):
        return np.random.default_rng(11)

    def test_matches_lapack_well_conditioned(self, rng):
        A = rng.standard_normal((12, 12))
        A = A @ A.T + 12 * np.eye(12)
        B = rng.standard_normal((12, 23))
        X = np.asarray(linalg.qr_solve(jnp.asarray(A, jnp.float64),
                                       jnp.asarray(B, jnp.float64)))
        np.testing.assert_allclose(X, np.linalg.solve(A, B), rtol=1e-10,
                                   atol=1e-12)

    def test_vector_rhs(self, rng):
        A = rng.standard_normal((7, 7)) + 7 * np.eye(7)
        b = rng.standard_normal(7)
        x = np.asarray(linalg.qr_solve(jnp.asarray(A, jnp.float64),
                                       jnp.asarray(b, jnp.float64)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-10)

    def test_slightly_indefinite_ill_conditioned(self, rng):
        """The iEKF failure mode: S = I + G/R with G spanning decades and a
        tiny asymmetric perturbation that breaks unpivoted Cholesky."""
        H = rng.standard_normal((200, 12)) * np.geomspace(1, 3000, 12)
        G = H.T @ H
        S = np.eye(12) + G / 1e-3
        S = S + rng.standard_normal((12, 12)) * 1e-4 * np.abs(S).max() * 1e-3
        B = rng.standard_normal((12, 23)) * np.geomspace(1e-6, 1.0, 23)[None]
        Xf = np.asarray(linalg.qr_solve(jnp.asarray(S, jnp.float32),
                                        jnp.asarray(B, jnp.float32)))
        Xd = np.linalg.solve(S, B)
        # per-column relative accuracy vs the f64 truth, f32-grade
        colB = np.linalg.norm(Xd, axis=0) + 1e-30
        rel = np.linalg.norm(Xf - Xd, axis=0) / colB
        assert np.max(rel) < 1e-2, rel

    def test_asymmetric_general(self, rng):
        A = rng.standard_normal((12, 12)) + np.diag(rng.uniform(2, 5, 12))
        B = rng.standard_normal((12, 4))
        X = np.asarray(linalg.qr_solve(jnp.asarray(A, jnp.float64),
                                       jnp.asarray(B, jnp.float64)))
        np.testing.assert_allclose(X, np.linalg.solve(A, B), rtol=1e-9,
                                   atol=1e-11)
