"""ScanContext, ICP, SE(3), pose-graph optimization."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.models import icp, posegraph, scancontext
from fast_limo_tpu.ops import se3, so3


def ring_scene(rng, n=2000, w1_y=10.0, w2_x=-15.0):
    """A structured scene: points on two walls + ground (distinctive SC)."""
    g = np.stack([rng.uniform(-40, 40, n // 2), rng.uniform(-40, 40, n // 2),
                  np.full(n // 2, -2.0)], 1)
    w1 = np.stack([rng.uniform(5, 40, n // 4), np.full(n // 4, w1_y),
                   rng.uniform(-2, 4, n // 4)], 1)
    w2 = np.stack([np.full(n // 4, w2_x), rng.uniform(-30, 0, n // 4),
                   rng.uniform(-2, 4, n // 4)], 1)
    return np.concatenate([g, w1, w2]).astype(np.float32)


def yaw_rot(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(10, 6))
        q, t = se3.exp(jnp.asarray(xi))
        xi2 = se3.log(q, t)
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-9)

    def test_exp_small(self):
        q, t = se3.exp(jnp.asarray([1e-9, 0, 0, 0, 1e-9, 0]))
        np.testing.assert_allclose(np.asarray(t), [1e-9, 0, 0], atol=1e-12)


class TestScanContext:
    def test_rotation_shifts_descriptor(self, rng):
        pts = ring_scene(rng)
        d1 = scancontext.descriptor(jnp.asarray(pts), jnp.ones(len(pts), bool))
        # rotate scene by 4 sectors (24 deg)
        yaw = 4 * 2 * np.pi / scancontext.N_SECTOR
        pts2 = pts @ yaw_rot(yaw).T
        d2 = scancontext.descriptor(jnp.asarray(pts2), jnp.ones(len(pts), bool))
        dist, shift = scancontext.distance(d1, d2)
        assert float(dist) < 0.15
        got_yaw = float(scancontext.shift_to_yaw(shift))
        assert abs(((got_yaw - (-yaw)) + np.pi) % (2 * np.pi) - np.pi) < 0.11 or \
               abs(((got_yaw - yaw) + np.pi) % (2 * np.pi) - np.pi) < 0.11

    def test_different_scenes_distant(self, rng):
        pts1 = ring_scene(rng)
        pts2 = ring_scene(np.random.default_rng(99), w1_y=30.0, w2_x=-35.0)
        v = jnp.ones(len(pts1), bool)
        d1 = scancontext.descriptor(jnp.asarray(pts1), v)
        d2 = scancontext.descriptor(jnp.asarray(pts2), v)
        same, _ = scancontext.distance(d1, d1)
        diff, _ = scancontext.distance(d1, d2)
        assert float(same) < 1e-6
        assert float(diff) > float(same) + 0.1

    def test_ring_key_rotation_invariant(self, rng):
        pts = ring_scene(rng)
        v = jnp.ones(len(pts), bool)
        d1 = scancontext.descriptor(jnp.asarray(pts), v)
        d2 = scancontext.descriptor(jnp.asarray(pts @ yaw_rot(1.0).T), v)
        k1, k2 = scancontext.ring_key(d1), scancontext.ring_key(d2)
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=0.08)

    def test_retrieve(self, rng):
        pts = ring_scene(rng)
        v = jnp.ones(len(pts), bool)
        d = scancontext.descriptor(jnp.asarray(pts), v)
        key = scancontext.ring_key(d)
        keys = jnp.stack([key + 0.5, key, key + 1.0])
        dists = scancontext.retrieve(key, keys, jnp.asarray([True, True, False]))
        assert int(jnp.argmin(dists)) == 1
        assert not np.isfinite(float(dists[2]))


class TestICP:
    def test_recovers_known_transform_exact(self, rng):
        # same samples on both sides: must recover the transform exactly
        pts = ring_scene(rng, 1200)
        R = yaw_rot(0.12)
        t = np.array([0.4, -0.25, 0.1], np.float32)
        src = ((pts - t) @ R).astype(np.float32)  # inverse-transformed
        res = icp.icp(jnp.asarray(src), jnp.ones(len(src), bool),
                      jnp.asarray(pts), jnp.ones(len(pts), bool),
                      max_corr_dist=1.5, iters=15)
        got_R = np.asarray(so3.quat_to_mat(res.quat))
        np.testing.assert_allclose(got_R, R, atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.trans), t, atol=2e-2)
        assert float(res.rmse) < 0.05

    def test_resampled_surfaces_reduce_error(self, rng):
        # different samples of the same surfaces: p2p ICP shrinks the error
        pts = ring_scene(rng, 1500)
        src_raw = ring_scene(np.random.default_rng(5), 1500)
        R = yaw_rot(0.10)
        t = np.array([0.3, -0.2, 0.0], np.float32)
        src = ((src_raw - t) @ R).astype(np.float32)
        res = icp.icp(jnp.asarray(src), jnp.ones(len(src), bool),
                      jnp.asarray(pts), jnp.ones(len(pts), bool),
                      max_corr_dist=1.5, iters=30)
        err_rot = abs(float(so3.log_quat(
            so3.quat_mul(so3.quat_conj(res.quat),
                         so3.mat_to_quat(jnp.asarray(R))))[2]))
        assert err_rot < 0.06       # started at 0.10 rad
        # sparse resampled surfaces have ~1m inherent nn spacing
        assert float(res.rmse) < 1.0

    def test_masked_points_ignored(self, rng):
        pts = ring_scene(rng, 800)
        src = np.concatenate([pts, rng.uniform(-100, 100, (100, 3)).astype(np.float32)])
        valid = np.concatenate([np.ones(len(pts), bool), np.zeros(100, bool)])
        res = icp.icp(jnp.asarray(src), jnp.asarray(valid),
                      jnp.asarray(pts), jnp.ones(len(pts), bool), iters=5)
        np.testing.assert_allclose(np.asarray(res.trans), np.zeros(3), atol=1e-3)


class TestPointToPlaneICP:
    def test_normals_recover_surfaces(self, rng):
        pts = ring_scene(rng, 2000)
        nrm, ok = icp.estimate_normals(jnp.asarray(pts),
                                       jnp.ones(len(pts), bool))
        nrm, ok = np.asarray(nrm), np.asarray(ok)
        assert ok.mean() > 0.9
        # ground points (z = −2) must get ±z normals
        ground = pts[:, 2] == -2.0
        gz = np.abs(nrm[ground & ok][:, 2])
        assert np.quantile(gz, 0.1) > 0.99

    def test_beats_point_to_point_on_resampled_surfaces(self, rng):
        """The loop-closure accuracy case (VERDICT r4 #3): two different
        samplings of the same surfaces.  p2p stalls at the sampling
        distance; p2l must land the transform to sub-cm / sub-mrad."""
        pts = ring_scene(rng, 1500)
        src_raw = ring_scene(np.random.default_rng(5), 1500)
        R = yaw_rot(0.10)
        t = np.array([0.3, -0.2, 0.0], np.float32)
        src = ((src_raw - t) @ R).astype(np.float32)
        vs, vd = jnp.ones(len(src), bool), jnp.ones(len(pts), bool)
        coarse = icp.icp(jnp.asarray(src), vs, jnp.asarray(pts), vd,
                         max_corr_dist=1.5, iters=30)
        nrm, ok = icp.estimate_normals(jnp.asarray(pts), vd)
        res = icp.icp_point_to_plane(
            jnp.asarray(src), vs, jnp.asarray(pts), vd, nrm, ok,
            init_quat=coarse.quat, init_trans=coarse.trans,
            max_corr_dist=1.5, iters=8)

        def errs(r):
            e_rot = float(jnp.linalg.norm(so3.log_quat(so3.quat_mul(
                so3.quat_conj(r.quat), so3.mat_to_quat(jnp.asarray(R))))))
            e_t = float(np.linalg.norm(np.asarray(r.trans) - t))
            return e_rot, e_t

        r_p2p, t_p2p = errs(coarse)
        r_p2l, t_p2l = errs(res)
        assert r_p2l < 2e-3 and t_p2l < 0.02, (r_p2l, t_p2l)
        assert r_p2l < 0.5 * r_p2p and t_p2l < 0.5 * t_p2p, \
            ((r_p2p, t_p2p), (r_p2l, t_p2l))

    def test_noisy_resampled_still_tight(self, rng):
        pts = ring_scene(rng, 1500) + \
            rng.standard_normal((1500, 3)).astype(np.float32) * 0.02
        src_raw = ring_scene(np.random.default_rng(5), 1500) + \
            rng.standard_normal((1500, 3)).astype(np.float32) * 0.02
        R = yaw_rot(0.06)
        t = np.array([0.2, -0.15, 0.05], np.float32)
        src = ((src_raw - t) @ R).astype(np.float32)
        vs, vd = jnp.ones(len(src), bool), jnp.ones(len(pts), bool)
        coarse = icp.icp(jnp.asarray(src), vs, jnp.asarray(pts), vd,
                         max_corr_dist=1.5, iters=20)
        nrm, ok = icp.estimate_normals(jnp.asarray(pts), vd)
        res = icp.icp_point_to_plane(
            jnp.asarray(src), vs, jnp.asarray(pts), vd, nrm, ok,
            init_quat=coarse.quat, init_trans=coarse.trans, iters=8)
        e_t = float(np.linalg.norm(np.asarray(res.trans) - t))
        e_r = float(jnp.linalg.norm(so3.log_quat(so3.quat_mul(
            so3.quat_conj(res.quat), so3.mat_to_quat(jnp.asarray(R))))))
        assert e_t < 0.04 and e_r < 4e-3, (e_t, e_r)


class TestPoseGraph:
    def test_loop_closure_corrects_drift(self):
        # square loop with odometry drift; loop edge ties end to start
        K, E = 8, 16
        g = posegraph.create(K, E)
        gt = []
        yaws = [0, 0, np.pi / 2, np.pi / 2, np.pi, np.pi, -np.pi / 2, -np.pi / 2]
        pos = np.array([[0, 0, 0], [5, 0, 0], [10, 0, 0], [10, 5, 0],
                        [10, 10, 0], [5, 10, 0], [0, 10, 0], [0, 5, 0]], float)
        for k in range(K):
            q = np.array([np.cos(yaws[k] / 2), 0, 0, np.sin(yaws[k] / 2)])
            gt.append((q, pos[k]))

        rngl = np.random.default_rng(0)
        # noisy odometry chain (accumulate drift)
        est = [gt[0]]
        for k in range(1, K):
            qr, tr = _rel(gt[k - 1], gt[k])
            tr = tr + rngl.normal(0, 0.15, 3)
            q_n, t_n = _apply(est[-1], (qr, tr))
            est.append((q_n, t_n))
        for q, t in est:
            g = posegraph.add_node(g, jnp.asarray(q, jnp.float32),
                                   jnp.asarray(t, jnp.float32))
        for k in range(1, K):
            qr, tr = _rel(gt[k - 1], gt[k])
            tr = tr + rngl.normal(0, 0.15, 3)
            g = posegraph.add_edge(g, k - 1, k, jnp.asarray(qr, jnp.float32),
                                   jnp.asarray(tr, jnp.float32), 1.0)
        # strong loop edge 7→0 with the TRUE relative pose
        qr, tr = _rel(gt[7], gt[0])
        g = posegraph.add_edge(g, 7, 0, jnp.asarray(qr, jnp.float32),
                               jnp.asarray(tr, jnp.float32), 100.0)

        before = np.linalg.norm(np.asarray(g.trans[7]) - pos[7])
        g2, costs = posegraph.optimize(g, iters=8)
        after = np.linalg.norm(np.asarray(g2.trans[7]) - pos[7])
        assert after < before * 0.7
        assert float(costs[-1]) < float(costs[0])

    def test_noop_on_perfect_graph(self):
        g = posegraph.create(4, 8)
        poses = [(so3.quat_identity(), jnp.asarray([float(k), 0, 0]))
                 for k in range(3)]
        for q, t in poses:
            g = posegraph.add_node(g, q, t)
        for k in range(1, 3):
            g = posegraph.add_edge(g, k - 1, k, so3.quat_identity(),
                                   jnp.asarray([1.0, 0, 0]))
        g2, costs = posegraph.optimize(g, iters=3)
        np.testing.assert_allclose(np.asarray(g2.trans[:3]),
                                   [[0, 0, 0], [1, 0, 0], [2, 0, 0]], atol=1e-4)


def _rel(a, b):
    """relative pose a→b as numpy (quat, trans)."""
    qa, ta = a
    qb, tb = b
    qa_i = qa * np.array([1, -1, -1, -1])
    q = np.asarray(so3.quat_mul(jnp.asarray(qa_i), jnp.asarray(qb)))
    t = np.asarray(so3.quat_rotate(jnp.asarray(qa_i), jnp.asarray(tb - ta)))
    return q, t


def _apply(a, rel):
    qa, ta = a
    qr, tr = rel
    q = np.asarray(so3.quat_mul(jnp.asarray(qa), jnp.asarray(qr)))
    t = ta + np.asarray(so3.quat_rotate(jnp.asarray(qa), jnp.asarray(tr)))
    return q, t


class TestDistributedPoseGraph:
    @pytest.mark.skipif(__import__("jax").device_count() < 4,
                        reason="needs >=4 devices")
    def test_matches_single_device(self):
        from fast_limo_tpu.parallel import sharded as sh

        K, E = 8, 16
        g = posegraph.create(K, E)
        rngl = np.random.default_rng(1)
        poses = [(np.array([1.0, 0, 0, 0]), np.array([float(k), 0.1 * k, 0]))
                 for k in range(6)]
        for q, t in poses:
            g = posegraph.add_node(g, jnp.asarray(q, jnp.float32),
                                   jnp.asarray(t, jnp.float32))
        for k in range(1, 6):
            qr, tr = _rel(poses[k - 1], poses[k])
            g = posegraph.add_edge(g, k - 1, k, jnp.asarray(qr, jnp.float32),
                                   jnp.asarray(tr + rngl.normal(0, 0.05, 3),
                                               jnp.float32))
        g1, c1 = posegraph.optimize(g, iters=5)
        mesh = sh.make_mesh(4)
        g2, c2 = posegraph.optimize_distributed(g, mesh, iters=5, axis="map")
        np.testing.assert_allclose(np.asarray(g2.trans), np.asarray(g1.trans),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-4)
