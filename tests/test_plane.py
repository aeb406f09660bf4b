"""Plane fit vs eigen-decomposition oracle + validity gates.

Gates mirror Plane.cpp:41-48,107-114; the estimator is the centroid-PCA
fit (see ops/plane.py module docstring for why the reference's A·n=-1
solve is not reproduced)."""

import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.ops import plane


def fit_ref(pts):
    """PCA oracle: least eigenvector of the centered scatter (LAPACK eigh)."""
    P = np.asarray(pts, float)
    c = P.mean(0)
    M = (P - c).T @ (P - c)
    _, V = np.linalg.eigh(M)
    n = V[:, 0]
    d = -n @ c
    if d < 0:
        n, d = -n, -d
    return np.concatenate([n, [d]])


class TestFit:
    def test_matches_eigh_oracle(self, rng):
        # points near a plane, well conditioned
        for _ in range(10):
            n = rng.normal(size=3)
            n /= np.linalg.norm(n)
            d0 = rng.uniform(0.5, 3)
            basis = np.linalg.svd(n[None])[2][1:]
            uv = rng.normal(size=(5, 2))
            pts = -d0 * n + uv @ basis + rng.normal(size=(5, 3)) * 0.01
            want = fit_ref(pts)

            nb = jnp.asarray(pts[None], jnp.float64)
            sq = jnp.sort(jnp.sum((nb - nb[:, :1]) ** 2, axis=-1))
            got, good = plane.fit_planes(
                nb, sq, jnp.ones((1, 5), bool),
                num_match_points=5, max_dist_plane=2.0, plane_threshold=5e-2)
            np.testing.assert_allclose(np.asarray(got[0]), want, atol=1e-6)

    def test_translation_invariant(self, rng):
        """The fit must be identical (up to the shifted offset) when the
        patch is translated 100 m — the property the reference's A·n=-1
        estimator lacks and the reason it was replaced."""
        pts = np.concatenate([rng.normal(size=(5, 2)) * 0.3,
                              rng.normal(size=(5, 1)) * 0.01], axis=1)
        shift = np.array([100.0, -50.0, 30.0])
        for dtype in (jnp.float64, jnp.float32):
            a, _ = plane.fit_planes(jnp.asarray(pts[None], dtype),
                                    jnp.full((1, 5), 0.01, dtype),
                                    jnp.ones((1, 5), bool),
                                    num_match_points=5, max_dist_plane=2.0,
                                    plane_threshold=5e-2)
            b, _ = plane.fit_planes(jnp.asarray((pts + shift)[None], dtype),
                                    jnp.full((1, 5), 0.01, dtype),
                                    jnp.ones((1, 5), bool),
                                    num_match_points=5, max_dist_plane=2.0,
                                    plane_threshold=5e-2)
            na, nb_ = np.asarray(a[0, :3]), np.asarray(b[0, :3])
            sgn = np.sign(na @ nb_)
            tol = 1e-9 if dtype == jnp.float64 else 1e-3
            np.testing.assert_allclose(na, sgn * nb_, atol=tol)

    def test_plane_through_origin_is_fittable(self, rng):
        """A ground plane at z=0 through the origin must yield a correct
        vertical normal and pass the gates (the reference's d=1/|n| blows
        up here — see ops/plane.py)."""
        pts = np.concatenate([rng.normal(size=(5, 2)) * 0.4 + 5.0,
                              rng.normal(size=(5, 1)) * 0.002], axis=1)
        abcd, good = plane.fit_planes(jnp.asarray(pts[None], jnp.float32),
                                      jnp.full((1, 5), 0.01), jnp.ones((1, 5), bool),
                                      num_match_points=5, max_dist_plane=2.0,
                                      plane_threshold=5e-2)
        assert bool(good[0])
        assert abs(abs(float(abcd[0, 2])) - 1.0) < 1e-3   # normal ≈ ±z
        # offset ≈ 0 up to noise-tilt × 5 m lever arm
        assert abs(float(abcd[0, 3])) < 0.1

    def test_exact_plane_good(self, rng):
        n = np.array([0.0, 0.0, 1.0])
        pts = np.concatenate([rng.normal(size=(5, 2)) * 0.3, np.full((5, 1), 2.0)], axis=1)
        nb = jnp.asarray(pts[None])
        sq = jnp.full((1, 5), 0.01)
        abcd, good = plane.fit_planes(nb, sq, jnp.ones((1, 5), bool),
                                      num_match_points=5, max_dist_plane=2.0,
                                      plane_threshold=5e-2)
        assert bool(good[0])
        got = np.asarray(abcd[0])
        np.testing.assert_allclose(np.abs(got[2]), 1.0, atol=1e-5)
        # dist of a point on the plane is ~0
        dist = plane.point_to_plane(abcd, jnp.asarray([[0.0, 0.0, 2.0]]))
        assert abs(float(dist[0])) < 1e-5

    def test_gate_not_enough_points(self, rng):
        pts = rng.normal(size=(1, 5, 3))
        valid = jnp.asarray([[True, True, True, True, False]])
        _, good = plane.fit_planes(jnp.asarray(pts), jnp.full((1, 5), 0.1), valid,
                                   num_match_points=5, max_dist_plane=2.0,
                                   plane_threshold=5e-2)
        assert not bool(good[0])

    def test_gate_too_far(self, rng):
        pts = np.concatenate([rng.normal(size=(5, 2)), np.zeros((5, 1))], axis=1)[None]
        sq = jnp.asarray([[0.1, 0.2, 0.3, 0.4, 2.5]])  # kth sq-dist ≥ MAX_DIST_PLANE
        _, good = plane.fit_planes(jnp.asarray(pts), sq, jnp.ones((1, 5), bool),
                                   num_match_points=5, max_dist_plane=2.0,
                                   plane_threshold=5e-2)
        assert not bool(good[0])

    def test_gate_residuals(self, rng):
        # non-planar neighbors rejected by the residual gate
        pts = rng.normal(size=(1, 5, 3)) * 2
        _, good = plane.fit_planes(jnp.asarray(pts), jnp.full((1, 5), 0.1),
                                   jnp.ones((1, 5), bool),
                                   num_match_points=5, max_dist_plane=2.0,
                                   plane_threshold=5e-2)
        assert not bool(good[0])

    def test_degenerate_collinear(self, rng):
        # collinear points: singular normal equations must not produce NaN-good
        t = np.linspace(0, 1, 5)
        pts = (np.outer(t, np.array([1.0, 2.0, 3.0])))[None]
        abcd, good = plane.fit_planes(jnp.asarray(pts), jnp.full((1, 5), 0.1),
                                      jnp.ones((1, 5), bool),
                                      num_match_points=5, max_dist_plane=2.0,
                                      plane_threshold=5e-2)
        assert not bool(good[0])
        assert np.all(np.isfinite(np.asarray(abcd)))
