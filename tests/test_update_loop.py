"""ops/update_loop — the whole-iterated-update-in-one-launch kernel vs the
exact jnp loop (models/iekf.update_iterated), plus the in-kernel series
manifold logs vs their atan2-based references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.models import iekf
from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import hstats, s2, so3, update_loop


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _rand_state(rng, dtype=jnp.float32):
    q = so3.quat_normalize(jnp.asarray(rng.standard_normal(4), dtype))
    qe = so3.quat_normalize(
        jnp.asarray([1.0, *(rng.standard_normal(3) * 0.01)], dtype))
    return st.NavState(
        pos=jnp.asarray(rng.standard_normal(3) * 5, dtype), rot=q, rot_LI=qe,
        t_LI=jnp.asarray(rng.standard_normal(3) * 0.1, dtype),
        vel=jnp.asarray(rng.standard_normal(3), dtype),
        bg=jnp.asarray(rng.standard_normal(3) * 0.01, dtype),
        ba=jnp.asarray(rng.standard_normal(3) * 0.05, dtype),
        grav=s2.project(jnp.asarray([0.1, 0.2, -9.7], dtype)))


def _plane_case(rng, n_pts=384, resid=0.05, keep_frac=0.9):
    """Realistic point-to-plane measurement set at the prior pose."""
    x_prop = _rand_state(rng)
    pc = jnp.asarray(rng.uniform(-20, 20, (n_pts, 3)), jnp.float32)
    glob = so3.quat_rotate(x_prop.rot, pc) + x_prop.pos
    n = rng.standard_normal((n_pts, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    d = -np.sum(n * np.asarray(glob), axis=1) \
        + rng.standard_normal(n_pts) * resid
    n_abcd = jnp.asarray(np.concatenate([n, d[:, None]], axis=1), jnp.float32)
    keep = jnp.asarray(rng.random(n_pts) < keep_frac)
    Q = rng.standard_normal((23, 23)) * 0.02
    P = jnp.asarray(Q @ Q.T + np.eye(23) * 0.01, jnp.float32)
    return x_prop, P, pc, n_abcd, keep


class TestSeriesLogs:
    def test_log_quat_matches_reference_in_regime(self, rng):
        for ang in (1e-6, 1e-4, 0.01, 0.1, 0.3, 0.45):
            axis = rng.standard_normal(3)
            axis /= np.linalg.norm(axis)
            q = so3.exp_quat(jnp.asarray(axis * ang, jnp.float32))
            got, ok = update_loop._log_quat(jnp.asarray(q))
            want = so3.log_quat(jnp.asarray(q, jnp.float32))
            assert bool(ok), f"angle {ang} should be in regime"
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-7)

    def test_log_quat_flags_large_rotation(self, rng):
        axis = np.array([0.0, 0.0, 1.0])
        q = so3.exp_quat(jnp.asarray(axis * 1.2, jnp.float32))  # 69°
        _got, ok = update_loop._log_quat(jnp.asarray(q))
        assert not bool(ok)

    def test_s2_boxminus_matches_reference(self, rng):
        g0 = s2.project(jnp.asarray([0.05, -0.1, -9.8], jnp.float32))
        for ang in (1e-7, 1e-5, 0.001, 0.05, 0.2):
            delta = jnp.asarray([ang, -0.3 * ang], jnp.float32)
            g1 = s2.boxplus(g0, delta)
            got, ok = update_loop._s2_boxminus(jnp.asarray(g1), jnp.asarray(g0))
            want = s2.boxminus(g1, g0)
            assert bool(ok)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-6)

    def test_boxminus_full_state(self, rng):
        xp = _rand_state(rng)
        pert = jnp.asarray(rng.standard_normal(23) * 0.02, jnp.float32)
        xn = st.boxplus(xp, pert)
        got, ok = update_loop._boxminus(st.as_vector(xn), st.as_vector(xp))
        want = st.boxminus(xn, xp)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-6)


class TestWholeLoopKernel:
    def _run_both(self, rng, **case_kw):
        x_prop, P, pc, n_abcd, keep = _plane_case(rng, **case_kw)
        R, D, limit, max_iters = 1e-3, 5.0, 1e-3, 3
        ee = True

        def h_model(x):
            return hstats.hstats_reference(pc, n_abcd, keep, x, ee)

        x_ref, P_ref, n_ref = iekf.update_iterated(
            x_prop, P, h_model, R=R, D=D, max_iters=max_iters, limit=limit)

        X = hstats.pack_inputs(pc, n_abcd, keep)
        x_k, P_k, n_k, ok, _g, _me = update_loop.update_loop_tpu(
            X, P, x_prop, R, D, limit, max_iters=max_iters,
            estimate_extrinsics=ee, interpret=True)
        return (x_ref, P_ref, n_ref), (x_k, P_k, n_k, ok)

    def test_matches_jnp_loop(self, rng):
        (x_ref, P_ref, n_ref), (x_k, P_k, n_k, ok) = self._run_both(rng)
        assert bool(ok)
        assert int(n_k) == int(n_ref)
        np.testing.assert_allclose(
            np.asarray(st.as_vector(x_k)), np.asarray(st.as_vector(x_ref)),
            rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_ref),
                                   rtol=1e-3, atol=2e-4)

    def test_matches_without_extrinsics(self, rng):
        x_prop, P, pc, n_abcd, keep = _plane_case(rng)
        R, D, limit, max_iters = 1e-3, 5.0, 1e-3, 3

        def h_model(x):
            return hstats.hstats_reference(pc, n_abcd, keep, x, False)

        x_ref, P_ref, n_ref = iekf.update_iterated(
            x_prop, P, h_model, R=R, D=D, max_iters=max_iters, limit=limit)
        X = hstats.pack_inputs(pc, n_abcd, keep)
        x_k, P_k, n_k, ok, _g, _me = update_loop.update_loop_tpu(
            X, P, x_prop, R, D, limit, max_iters=max_iters,
            estimate_extrinsics=False, interpret=True)
        assert bool(ok)
        assert int(n_k) == int(n_ref)
        np.testing.assert_allclose(
            np.asarray(st.as_vector(x_k)), np.asarray(st.as_vector(x_ref)),
            rtol=1e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_ref),
                                   rtol=1e-3, atol=2e-4)

    def test_degenerate_geometry_matches_eigh_guard_loop(self, rng):
        """Nearly all planes share one normal → pose-block eigenvalues
        below D but well above FP noise: the in-kernel Jacobi guard must
        reproduce the jnp eigh-guard loop on a genuinely degenerate
        problem (both compute the spectral projector)."""
        x_prop, P, pc, n_abcd, keep = _plane_case(rng)
        pc = pc * 0.1                      # small lever arms keep the weak
        n_pts = pc.shape[0]                # directions below D
        one_n = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n_pts, 1))
        mixed = rng.standard_normal((n_pts, 3)).astype(np.float32)
        mixed /= np.linalg.norm(mixed, axis=1, keepdims=True)
        use_mixed = (rng.random(n_pts) < 0.03)[:, None]
        n = np.where(use_mixed, mixed, one_n)
        glob = so3.quat_rotate(x_prop.rot, pc) + x_prop.pos
        d = -np.sum(n * np.asarray(glob), axis=1) \
            + rng.standard_normal(n_pts) * 0.02
        n_abcd = jnp.asarray(np.concatenate([n, d[:, None]], axis=1),
                             jnp.float32)
        R, D, limit, max_iters = 1e-3, 5.0, 1e-3, 3

        # scenario sanity: degenerate (min eig < D) but far from FP noise
        HTH0, _ = hstats.hstats_reference(pc, n_abcd, keep, x_prop, True)
        w0 = np.linalg.eigvalsh(np.asarray(HTH0, np.float64)[:6, :6])
        assert 0.05 < w0.min() < D, w0

        def h_model(x):
            return hstats.hstats_reference(pc, n_abcd, keep, x, True)

        x_ref, P_ref, n_ref = iekf.update_iterated(
            x_prop, P, h_model, R=R, D=D, max_iters=max_iters, limit=limit)
        X = hstats.pack_inputs(pc, n_abcd, keep)
        x_k, P_k, n_k, ok, _g, _me = update_loop.update_loop_tpu(
            X, P, x_prop, R, D, limit, max_iters=max_iters,
            estimate_extrinsics=True, interpret=True)
        assert bool(ok)
        assert int(n_k) == int(n_ref)
        np.testing.assert_allclose(
            np.asarray(st.as_vector(x_k)), np.asarray(st.as_vector(x_ref)),
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_ref),
                                   rtol=1e-3, atol=2e-4)


class TestWindowRematchKernel:
    """Window mode: the kernel's per-iteration EXACT window re-match
    (re-rank, in-kernel refit, gates, cap) must reproduce the jnp
    per-iteration loop built on the SAME window semantics, and its
    staleness certificates must flag windows that cannot prove set
    stability."""

    WIN = update_loop.Window(k=5, W=8, voxel_size=1.2, max_dist_plane=2.0,
                             plane_threshold=0.1, max_num_matches=300,
                             dynamic_gate=0.0)

    def _window_fixture(self, rng, n_q=384, partial_frac=0.33):
        """Queries + per-query top-W candidate windows from a planar world."""
        x_prop, P, pc, _n, _keep = _plane_case(rng, n_pts=n_q)
        pc = pc * 0.3                      # keep queries near the surfaces
        from fast_limo_tpu.ops import so3 as so3_op

        glob0 = so3_op.quat_rotate(x_prop.rot, pc) + x_prop.pos
        # world surface points: local planar patches around each query
        world = []
        nrm = rng.standard_normal((n_q, 3))
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        for i in range(12):
            t1 = np.cross(nrm, [0.1, 0.7, 0.2])
            t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
            t2 = np.cross(nrm, t1)
            a, b = rng.uniform(-0.5, 0.5, (2, n_q, 1))
            world.append(np.asarray(glob0) + a * t1 + b * t2
                         + 0.02 * rng.standard_normal((n_q, 3)))
        world = np.concatenate(world).astype(np.float32)
        d2 = (np.sum(np.asarray(glob0) ** 2, 1)[:, None]
              + np.sum(world ** 2, 1)[None, :]
              - 2.0 * np.asarray(glob0) @ world.T)
        idx = np.argsort(d2, axis=1)[:, :self.WIN.W]
        nbrs_w = np.asarray(world[idx])
        # PARTIAL windows for a third of the queries (sparse/frontier
        # regime: cnt < W, some cnt < k) — these exercised two real
        # kernel-vs-jnp divergences (slot-validity off-by-one, missing
        # cnt<W clause in cert_a) that full windows cannot see
        cnt_w = np.full(n_q, self.WIN.W)
        cut = rng.integers(0, self.WIN.W + 1, n_q)
        partial = rng.random(n_q) < partial_frac
        cnt_w = np.where(partial, cut, cnt_w)
        vld_w = np.arange(self.WIN.W)[None, :] < cnt_w[:, None]
        nbrs_w = np.where(vld_w[..., None], nbrs_w, 0.0).astype(np.float32)
        pc_valid = jnp.asarray(rng.random(n_q) < 0.95)
        return (x_prop, P, pc, pc_valid, jnp.asarray(nbrs_w),
                jnp.asarray(vld_w), jnp.asarray(cnt_w))

    def _jnp_h_model(self, pc, pc_valid, nbrs_w, vld_w, win):
        """measurement._window_match twin on explicit window arrays."""
        from fast_limo_tpu.ops import plane as plane_op
        from fast_limo_tpu.ops import so3 as so3_op

        def h_model(x):
            glob = so3_op.quat_rotate(x.rot, pc) + x.pos
            diff = glob[:, None, :] - nbrs_w
            d2 = jnp.where(vld_w, jnp.sum(diff * diff, -1), jnp.inf)
            neg, order = jax.lax.top_k(-d2, win.k)
            sel_sq = -neg
            sel = jnp.take_along_axis(nbrs_w, order[..., None], axis=1)
            n_abcd, good = plane_op.fit_planes(
                sel, sel_sq, jnp.isfinite(sel_sq),
                num_match_points=win.k, max_dist_plane=win.max_dist_plane,
                plane_threshold=win.plane_threshold)
            good = good & pc_valid
            keep = good & (jnp.cumsum(good.astype(jnp.int32))
                           <= win.max_num_matches)
            return hstats.hstats_reference(pc, n_abcd, keep, x, True)

        return h_model

    def test_matches_jnp_window_loop(self, rng):
        import jax

        x_prop, P, pc, pc_valid, nbrs_w, vld_w, cnt_w = \
            self._window_fixture(rng)
        R, D, limit, max_iters = 1e-3, 5.0, 1e-3, 3
        h_model = self._jnp_h_model(pc, pc_valid, nbrs_w, vld_w, self.WIN)
        x_ref, P_ref, n_ref = iekf.update_iterated(
            x_prop, P, h_model, R=R, D=D, max_iters=max_iters, limit=limit)

        X = update_loop.pack_window(pc, pc_valid, nbrs_w, vld_w, cnt_w)
        x_k, P_k, n_k, ok, _g, _me = update_loop.update_loop_tpu(
            X, P, x_prop, R, D, limit, max_iters=max_iters,
            estimate_extrinsics=True, window=self.WIN, interpret=True)
        # parity holds regardless of ok: both sides run the SAME window
        # re-match (ok merely reports whether a full re-gather could have
        # differed — this fixture's tight windows legitimately flag it)
        assert int(n_k) == int(n_ref)
        np.testing.assert_allclose(
            np.asarray(st.as_vector(x_k)), np.asarray(st.as_vector(x_ref)),
            rtol=1e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(P_k), np.asarray(P_ref),
                                   rtol=1e-3, atol=2e-4)

    def test_clean_geometry_passes_certificates(self, rng):
        """Wide windows + small corrections → every staleness certificate
        holds and the kernel keeps the fast path (ok=True)."""
        x_prop, P, pc, pc_valid, nbrs_w, vld_w, cnt_w = \
            self._window_fixture(rng, partial_frac=0.0)
        # make every window WIDE-gapped: push the 3 farthest candidates far
        # out so d_W − d_k is metres
        nw = np.array(nbrs_w, copy=True)
        from fast_limo_tpu.ops import so3 as so3_op

        glob0 = np.asarray(so3_op.quat_rotate(x_prop.rot, pc) + x_prop.pos)
        for j in range(self.WIN.k, self.WIN.W):
            d = nw[:, j] - glob0
            nw[:, j] = glob0 + d / np.maximum(
                np.linalg.norm(d, axis=1, keepdims=True), 1e-9) * 3.0
        vld = jnp.ones_like(vld_w, dtype=bool)
        cnt = jnp.full(pc.shape[0], self.WIN.W)
        X = update_loop.pack_window(pc, pc_valid, jnp.asarray(nw), vld, cnt)
        _x, _P, _n, ok, _g, _me = update_loop.update_loop_tpu(
            X, P, x_prop, 1e-3, 5.0, 1e-3, max_iters=3,
            estimate_extrinsics=True, window=self.WIN, interpret=True)
        assert bool(ok)

    def test_tight_window_flags_staleness(self, rng):
        """All W candidates equidistant from the query → d_W − d_k ≈ 0, so
        ANY iterate displacement defeats cert_a → ok=False."""
        x_prop, P, pc, pc_valid, nbrs_w, vld_w, cnt_w = \
            self._window_fixture(rng)
        from fast_limo_tpu.ops import so3 as so3_op

        glob0 = so3_op.quat_rotate(x_prop.rot, pc) + x_prop.pos
        # shell windows: candidates on a sphere around each query
        dirs = rng.standard_normal((pc.shape[0], self.WIN.W, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        shell = np.asarray(glob0)[:, None, :] + 0.5 * dirs
        X = update_loop.pack_window(pc, pc_valid, jnp.asarray(shell),
                                    vld_w, cnt_w)
        _x, _P, _n, ok, _g, _me = update_loop.update_loop_tpu(
            X, P, x_prop, 1e-3, 5.0, 1e-3, max_iters=3,
            estimate_extrinsics=True, window=self.WIN, interpret=True)
        assert not bool(ok)


class TestJacobiGuard:
    def test_jacobi_eigh_matches_numpy(self, rng):
        from fast_limo_tpu.ops import update_body

        for _ in range(5):
            A = rng.standard_normal((6, 6))
            A = jnp.asarray(A @ A.T + np.eye(6), jnp.float32)
            w, V = update_body._sort_eig6(*update_body._jacobi_eigh6(A))
            w_np, V_np = np.linalg.eigh(np.asarray(A, np.float64))
            np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-4,
                                       atol=1e-4)
            # V orthogonal and diagonalizing
            Vn = np.asarray(V, np.float64)
            np.testing.assert_allclose(Vn.T @ Vn, np.eye(6), atol=1e-5)
            np.testing.assert_allclose(
                Vn.T @ np.asarray(A, np.float64) @ Vn, np.diag(np.asarray(w)),
                atol=1e-2)

    def test_guard_matches_jnp_eigh_guard(self, rng):
        from fast_limo_tpu.models import iekf as iekf_m
        from fast_limo_tpu.ops import update_body

        for _ in range(5):
            # eigenvalues {0.5, 0.5, 0.5, big…}: three guarded directions,
            # well away from both D and FP noise
            B = rng.standard_normal((6, 3))
            H6 = jnp.asarray(B @ B.T * 100 + 0.5 * np.eye(6), jnp.float32)
            HTH = jnp.zeros((12, 12), jnp.float32).at[:6, :6].set(H6)
            dx = jnp.asarray(rng.standard_normal(23), jnp.float32)
            want, _we = iekf_m._degeneracy_guard(HTH, dx, 5.0)
            got, _ke = update_body.jacobi_guard_head(H6, dx[:6], 5.0)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want)[:6],
                                       rtol=1e-3, atol=1e-4)
        # the spectral-projector guard is invariant to eigenvector signs —
        # the property the reference's row-zeroing quirk lacks (why the
        # engine documents a divergence; see iekf._degeneracy_guard)
        dx6 = np.asarray(dx)[:6]
        w_np, V_np = np.linalg.eigh(np.asarray(H6, np.float64))
        m = (w_np >= 5.0).astype(float)
        for sgn in (np.ones(6), np.array([1, -1, 1, -1, -1, 1.0])):
            Vs = V_np * sgn[None, :]
            np.testing.assert_allclose(
                (Vs * m[None, :]) @ (Vs.T @ dx6),
                np.asarray(got, np.float64), rtol=1e-3, atol=1e-4)
