"""iEKF predict & iterated update vs the NumPy oracle (independent transcription)."""

import jax.numpy as jnp
import numpy as np

import oracle
from fast_limo_tpu.models import iekf, process
from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import s2, so3


def rand_state(rng) -> dict:
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    qe = rng.normal(size=4)
    qe /= np.linalg.norm(qe)
    g = rng.normal(size=3)
    g = g / np.linalg.norm(g) * oracle.S2_LEN
    return {
        "pos": rng.normal(size=3) * 10,
        "rot": q,
        "rot_LI": qe,
        "t_LI": rng.normal(size=3),
        "vel": rng.normal(size=3),
        "bg": rng.normal(size=3) * 0.01,
        "ba": rng.normal(size=3) * 0.01,
        "grav": g,
    }


def to_nav(d) -> st.NavState:
    return st.NavState(**{k: jnp.asarray(np.asarray(v), jnp.float64) for k, v in d.items()})


def rand_P(rng):
    A = rng.normal(size=(23, 23)) * 0.05
    return A @ A.T + np.eye(23) * 0.1


class TestManifoldOps:
    def test_boxplus_matches_oracle(self, rng):
        d = rand_state(rng)
        dx = rng.normal(size=23) * 0.1
        got = st.boxplus(to_nav(d), jnp.asarray(dx))
        want = oracle.state_boxplus(d, dx)
        for k in d:
            np.testing.assert_allclose(np.asarray(getattr(got, k)), want[k],
                                       atol=1e-12, err_msg=k)

    def test_boxminus_matches_oracle(self, rng):
        a, b = rand_state(rng), rand_state(rng)
        got = st.boxminus(to_nav(a), to_nav(b))
        want = oracle.state_boxminus(a, b)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)

    def test_boxplus_boxminus_roundtrip(self, rng):
        a = rand_state(rng)
        dx = rng.normal(size=23) * 0.2
        b = st.boxplus(to_nav(a), jnp.asarray(dx))
        dx2 = st.boxminus(b, to_nav(a))
        np.testing.assert_allclose(np.asarray(dx2), dx, atol=1e-9)


class TestProcessModel:
    def test_f_matches_oracle(self, rng):
        d = rand_state(rng)
        acc, gyro = rng.normal(size=3) * 9, rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(process.f(to_nav(d), jnp.asarray(acc), jnp.asarray(gyro))),
            oracle.get_f(d, acc, gyro), atol=1e-12)

    def test_df_dx_matches_oracle(self, rng):
        d = rand_state(rng)
        acc, gyro = rng.normal(size=3) * 9, rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(process.df_dx(to_nav(d), jnp.asarray(acc), jnp.asarray(gyro))),
            oracle.df_dx(d, acc, gyro), atol=1e-12)

    def test_df_dw_matches_oracle(self, rng):
        d = rand_state(rng)
        acc, gyro = rng.normal(size=3) * 9, rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(process.df_dw(to_nav(d), jnp.asarray(acc), jnp.asarray(gyro))),
            oracle.df_dw(d, acc, gyro), atol=1e-12)

    def test_df_dx_is_numeric_jacobian(self, rng):
        # the analytic blocks actually differentiate f through boxplus
        d = rand_state(rng)
        acc, gyro = rng.normal(size=3) * 5, rng.normal(size=3)
        J = oracle.df_dx(d, acc, gyro)
        eps = 1e-7
        for col in list(range(0, 23)):
            dx = np.zeros(23)
            dx[col] = eps
            fp = oracle.get_f(oracle.state_boxplus(d, dx), acc, gyro)
            fm = oracle.get_f(oracle.state_boxplus(d, -dx), acc, gyro)
            num = (fp - fm) / (2 * eps)
            # compare only rows the reference fills (pos/rot/vel dynamics)
            np.testing.assert_allclose(num[0:3], J[0:3, col], atol=1e-5)
            np.testing.assert_allclose(num[3:6], J[3:6, col], atol=1e-5)
            np.testing.assert_allclose(num[12:15], J[12:15, col], atol=2e-4)


class TestPredict:
    def test_predict_matches_oracle(self, rng):
        d = rand_state(rng)
        P = rand_P(rng)
        acc, gyro = rng.normal(size=3) * 9, rng.normal(size=3) * 0.5
        dt = 0.005
        Q = np.diag(np.concatenate([np.full(3, 6e-4), np.full(3, 1.5e-2),
                                    np.full(3, 1.5e-5), np.full(3, 3.4e-4)]))
        x1, P1 = iekf.predict(to_nav(d), jnp.asarray(P), jnp.asarray(acc),
                              jnp.asarray(gyro), dt, jnp.asarray(Q))
        x1o, P1o = oracle.predict(d, P, acc, gyro, dt, Q)
        for k in d:
            np.testing.assert_allclose(np.asarray(getattr(x1, k)), x1o[k],
                                       atol=1e-11, err_msg=k)
        np.testing.assert_allclose(np.asarray(P1), P1o, atol=1e-10)

    def test_predict_chain_matches_oracle(self, rng):
        d = rand_state(rng)
        P = rand_P(rng)
        Q = np.eye(12) * 1e-3
        x, Po = d, P
        xj = to_nav(d)
        Pj = jnp.asarray(P)
        for i in range(20):
            acc, gyro = rng.normal(size=3) * 9, rng.normal(size=3)
            x, Po = oracle.predict(x, Po, acc, gyro, 0.005, Q)
            xj, Pj = iekf.predict(xj, Pj, jnp.asarray(acc), jnp.asarray(gyro),
                                  0.005, jnp.asarray(Q))
        for k in d:
            np.testing.assert_allclose(np.asarray(getattr(xj, k)), x[k],
                                       atol=1e-9, err_msg=k)
        np.testing.assert_allclose(np.asarray(Pj), Po, atol=1e-8)


def synthetic_h(planes_n, planes_d, pts_local):
    """Point-to-plane h_model with fixed planes/points, in both frameworks."""

    def h_oracle(s):
        R = oracle.qmat(s["rot"])
        glob = pts_local @ R.T + s["pos"]
        dist = glob @ planes_n.T.diagonal() if False else np.sum(planes_n * glob, axis=1) + planes_d
        C = planes_n @ R  # R^T n per row
        A = np.cross(pts_local, C)
        RLI = oracle.qmat(s["rot_LI"])
        p_lidar = (pts_local - s["t_LI"]) @ RLI
        B = np.cross(p_lidar, C @ RLI)
        H = np.concatenate([planes_n, A, B, C], axis=1)
        return H, -dist

    def h_jax(x: st.NavState):
        glob = so3.quat_rotate(x.rot, jnp.asarray(pts_local)) + x.pos
        dist = jnp.sum(jnp.asarray(planes_n) * glob, axis=1) + jnp.asarray(planes_d)
        Rm = so3.quat_to_mat(x.rot)
        C = jnp.asarray(planes_n) @ Rm
        A = jnp.cross(jnp.asarray(pts_local), C)
        RLI = so3.quat_to_mat(x.rot_LI)
        p_lidar = (jnp.asarray(pts_local) - x.t_LI) @ RLI
        B = jnp.cross(p_lidar, C @ RLI)
        H = jnp.concatenate([jnp.asarray(planes_n), A, B, C], axis=1)
        return H, -dist

    def h_jax_stats(x):
        H, h = h_jax(x)
        return H.T @ H, H.T @ h

    return h_oracle, h_jax_stats, h_jax


class TestUpdateIterated:
    def test_update_matches_oracle(self, rng):
        d = rand_state(rng)
        d["pos"] = np.zeros(3)
        P = rand_P(rng) * 0.01
        M = 50
        n = rng.normal(size=(M, 3))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        planes_d = rng.normal(size=M) * 0.1
        pts = rng.normal(size=(M, 3)) * 5
        h_o, h_j, _ = synthetic_h(n, planes_d, pts)

        xo, Po, _ = oracle.update_iterated(d, P, h_o, R=1e-3, D=5.0,
                                           max_iters=3, limit=1e-3)
        xj, Pj, iters = iekf.update_iterated(to_nav(d), jnp.asarray(P), h_j,
                                             R=1e-3, D=5.0, max_iters=3, limit=1e-3)
        for k in d:
            np.testing.assert_allclose(np.asarray(getattr(xj, k)), xo[k],
                                       atol=1e-8, err_msg=k)
        np.testing.assert_allclose(np.asarray(Pj), Po, atol=1e-8)

    def test_update_converges_to_plane_solution(self, rng):
        # a well-constrained synthetic problem: posterior should reduce dists
        d = rand_state(rng)
        d["pos"] = np.zeros(3)
        P = np.asarray(iekf.init_P(jnp.float64))
        M = 120
        n = rng.normal(size=(M, 3))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        pts = rng.normal(size=(M, 3)) * 5
        # planes consistent with the current rotation and a small translation
        R0 = oracle.qmat(d["rot"])
        planes_d = -np.sum(n * (pts @ R0.T + np.array([0.05, -0.03, 0.08])), axis=1)
        h_o, h_j, h_j_rows = synthetic_h(n, planes_d, pts)
        _, h0 = h_o(d)

        xj, _, _ = iekf.update_iterated(to_nav(d), jnp.asarray(P), h_j,
                                        R=1e-3, D=5.0, max_iters=5, limit=1e-4)
        _, h1 = h_j_rows(xj)
        assert float(jnp.mean(jnp.abs(h1))) < 0.2 * float(np.mean(np.abs(h0))) + 1e-9

    def test_update_zero_rows_noop_on_empty(self, rng):
        # all-zero H/h (no matches): state unchanged
        d = rand_state(rng)
        P = rand_P(rng) * 0.01

        def h_zero(x):
            return jnp.zeros((12, 12)), jnp.zeros(12)

        xj, Pj, _ = iekf.update_iterated(to_nav(d), jnp.asarray(P), h_zero,
                                         R=1e-3, D=5.0, max_iters=3, limit=1e-3)
        for k in d:
            np.testing.assert_allclose(np.asarray(getattr(xj, k)), d[k], atol=1e-9)


class TestPredictScan:
    def test_predict_scan_matches_sequential_chain(self, rng):
        """predict_scan's batched tree-fold must equal K sequential predicts
        (it reassociates the same affine covariance maps)."""
        d = rand_state(rng)
        P = rand_P(rng)
        Q = np.eye(12) * 1e-3
        K = 11  # odd: exercises the identity padding
        acc = rng.normal(size=(K, 3)) * 9
        gyro = rng.normal(size=(K, 3))
        dt = np.full(K, 0.005)
        valid = np.ones(K, bool)
        valid[7] = False  # padded sample passes through

        xj, Pj = to_nav(d), jnp.asarray(P)
        for i in range(K):
            if not valid[i]:
                continue
            xj, Pj = iekf.predict(xj, Pj, jnp.asarray(acc[i]),
                                  jnp.asarray(gyro[i]), dt[i], jnp.asarray(Q))

        imu = {"acc": jnp.asarray(acc), "gyro": jnp.asarray(gyro),
               "dt": jnp.asarray(dt), "valid": jnp.asarray(valid)}
        xs_f, Ps_f, xs = iekf.predict_scan(to_nav(d), jnp.asarray(P), imu,
                                           jnp.asarray(Q))
        for k in d:
            np.testing.assert_allclose(np.asarray(getattr(xs_f, k)),
                                       np.asarray(getattr(xj, k)),
                                       atol=1e-9, err_msg=k)
        np.testing.assert_allclose(np.asarray(Ps_f), np.asarray(Pj), atol=1e-8)
        # stacked states: entry i is the post-state of step i
        np.testing.assert_allclose(np.asarray(xs.pos[-1]),
                                   np.asarray(xs_f.pos), atol=1e-12)


class TestUnrolledUpdate:
    def test_unrolled_matches_while_loop(self, rng):
        """The unrolled masked update is the same math as the while_loop,
        just scheduled straight-line — identical iteration counts, states
        equal to f64 reassociation noise (XLA fuses the two program forms
        differently, so exact bit equality is not guaranteed)."""
        import numpy as np

        d = rand_state(rng)
        d["pos"] = np.zeros(3)
        P = rand_P(rng) * 0.01
        M = 60
        n = rng.normal(size=(M, 3))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        planes_d = rng.normal(size=M) * 0.1
        pts = rng.normal(size=(M, 3)) * 5
        _, h_j, _ = synthetic_h(n, planes_d, pts)

        for max_iters in (1, 3, 5):
            xu, Pu, iu = iekf.update_iterated(
                to_nav(d), jnp.asarray(P), h_j, R=1e-3, D=5.0,
                max_iters=max_iters, limit=1e-3, unroll=True)
            xw, Pw, iw = iekf.update_iterated(
                to_nav(d), jnp.asarray(P), h_j, R=1e-3, D=5.0,
                max_iters=max_iters, limit=1e-3, unroll=False)
            assert int(iu) == int(iw)
            np.testing.assert_allclose(np.asarray(Pu), np.asarray(Pw),
                                       atol=1e-12)
            for k in d:
                np.testing.assert_allclose(np.asarray(getattr(xu, k)),
                                           np.asarray(getattr(xw, k)),
                                           atol=1e-12, err_msg=k)

    def test_unrolled_early_convergence_freezes_state(self, rng):
        """With a tiny problem that converges immediately, extra unrolled
        iterations must not perturb the result (mask correctness)."""
        import numpy as np

        d = rand_state(rng)
        P = rand_P(rng) * 0.01

        def h_zero(x):
            return jnp.zeros((12, 12)), jnp.zeros(12)

        x3, P3, i3 = iekf.update_iterated(to_nav(d), jnp.asarray(P), h_zero,
                                          R=1e-3, D=5.0, max_iters=3,
                                          limit=1e-3, unroll=True)
        x9, P9, i9 = iekf.update_iterated(to_nav(d), jnp.asarray(P), h_zero,
                                          R=1e-3, D=5.0, max_iters=9,
                                          limit=1e-3, unroll=True)
        assert int(i3) == int(i9)
        np.testing.assert_array_equal(np.asarray(P3), np.asarray(P9))
        for k in d:
            np.testing.assert_array_equal(np.asarray(getattr(x3, k)),
                                          np.asarray(getattr(x9, k)), err_msg=k)
