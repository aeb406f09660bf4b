"""GPS position priors: pose-graph unary factors + SLAM wiring.

The reference's loop branch adds GPS factors to its GTSAM graph
(README.md:152-159); here they are unary position priors in the dense-GN
pose graph (models/posegraph.py), assumed pre-converted to the odometry
world frame.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.models import posegraph
from fast_limo_tpu.ops import so3


def _chain_with_drift(n=8, step=2.0, drift=0.05):
    """True poses on a line; initial estimates accumulate linear drift."""
    true_pos = np.stack([np.arange(n) * step, np.zeros(n), np.zeros(n)], 1)
    est_pos = true_pos + np.stack(
        [np.zeros(n), np.arange(n) * drift, np.zeros(n)], 1)
    qid = np.array([1.0, 0, 0, 0], np.float32)
    g = posegraph.create(16, 32)
    for k in range(n):
        g = posegraph.add_node(g, jnp.asarray(qid),
                               jnp.asarray(est_pos[k], jnp.float32))
    # odometry edges measured from the TRUE poses (identity rotations)
    for k in range(1, n):
        g = posegraph.add_edge(
            g, k - 1, k, jnp.asarray(qid),
            jnp.asarray(true_pos[k] - true_pos[k - 1], jnp.float32), 1.0)
    return g, true_pos, est_pos


class TestGPSPriors:
    def test_priors_pull_drift_out(self):
        g, true_pos, est_pos = _chain_with_drift()
        n = len(true_pos)
        for k in (3, 5, 7):
            g = posegraph.add_prior(
                g, k, jnp.asarray(true_pos[k], jnp.float32), 50.0)
        g2, costs = posegraph.optimize(g, iters=15)
        out = np.asarray(g2.trans[:n])
        # without priors the drifted chain is self-consistent (edges alone
        # can't see the drift); priors must pull it back to truth
        err = np.linalg.norm(out - true_pos, axis=1)
        assert err.max() < 0.02, err
        assert float(costs[-1]) < float(costs[0])

    def test_no_priors_unchanged_behavior(self):
        g, true_pos, est_pos = _chain_with_drift()
        n = len(true_pos)
        g2, _ = posegraph.optimize(g, iters=15)
        out = np.asarray(g2.trans[:n])
        # edges measured from truth are inconsistent with the drifted
        # estimates only in a gauge the graph can't observe without priors:
        # the optimized chain stays anchored at node 0 and still drifts
        assert np.linalg.norm(out[0] - est_pos[0]) < 1e-4

    def test_interp_prior_constrains_both_bracketing_nodes(self):
        """α-priors (r = (1−α)·t_a + α·t_b − p) pin the chord where the
        fix was measured — both solvers, both nodes pulled."""
        g, true_pos, est_pos = _chain_with_drift()
        n = len(true_pos)
        # fixes midway between node pairs, ON the true chord
        for k, a in ((2, 0.5), (4, 0.25), (6, 0.75)):
            p = (1 - a) * true_pos[k] + a * true_pos[k + 1]
            g = posegraph.add_prior(g, k, jnp.asarray(p, jnp.float32),
                                    50.0, alpha=a)
        for solver in ("dense", "chain"):
            g2, costs = posegraph.optimize(g, iters=15, solver=solver)
            out = np.asarray(g2.trans[:n])
            err = np.linalg.norm(out - true_pos, axis=1)
            # interp priors + consistent edges recover truth everywhere
            assert err.max() < 0.02, (solver, err)

    def test_interp_prior_alpha_zero_matches_unary(self):
        g0, true_pos, _ = _chain_with_drift()
        g1 = posegraph.add_prior(
            g0, 4, jnp.asarray(true_pos[4], jnp.float32), 50.0)
        g2 = posegraph.add_prior(
            g0, 4, jnp.asarray(true_pos[4], jnp.float32), 50.0, alpha=0.0)
        o1, _ = posegraph.optimize(g1, iters=10)
        o2, _ = posegraph.optimize(g2, iters=10)
        np.testing.assert_array_equal(np.asarray(o1.trans),
                                      np.asarray(o2.trans))

    def test_robust_edges_reject_corrupted_odometry(self):
        """One corrupted odometry edge + trusted priors: the quadratic
        solve compromises (error spread along the chain); Huber IRLS
        saturates the bad edge and recovers truth — the GTSAM
        robust-noise-model analog of the reference's loop branch."""
        n, step = 8, 2.0
        true_pos = np.stack([np.arange(n) * step, np.zeros(n), np.zeros(n)], 1)
        qid = np.array([1.0, 0, 0, 0], np.float32)
        g = posegraph.create(16, 32)
        for k in range(n):
            g = posegraph.add_node(g, jnp.asarray(qid),
                                   jnp.asarray(true_pos[k], jnp.float32))
        for k in range(1, n):
            t = true_pos[k] - true_pos[k - 1]
            if k == 4:
                t = t + np.array([0.0, 1.0, 0.0])   # corrupted edge
            g = posegraph.add_edge(g, k - 1, k, jnp.asarray(qid),
                                   jnp.asarray(t, jnp.float32), 1.0)
        for k in range(1, n):
            g = posegraph.add_prior(
                g, k, jnp.asarray(true_pos[k], jnp.float32), 5.0)
        gq, _ = posegraph.optimize(g, iters=15)
        gr, _ = posegraph.optimize(g, iters=15, robust_delta=0.05)
        err_q = np.linalg.norm(np.asarray(gq.trans[:n]) - true_pos, axis=1)
        err_r = np.linalg.norm(np.asarray(gr.trans[:n]) - true_pos, axis=1)
        # quadratic: the 1 m edge corruption leaks visibly into the poses;
        # robust: the bad edge saturates at force w·δ = 0.05 against prior
        # stiffness 5 → residual displacement ~δ·w/w_p = 0.01
        assert err_q.max() > 0.05, err_q
        assert err_r.max() < 0.02, err_r
        assert err_r.max() < 0.25 * err_q.max()

    def test_distributed_matches_single(self):
        if jax.device_count() < 2:
            pytest.skip("needs multi-device mesh")
        from jax.sharding import Mesh

        g, true_pos, _ = _chain_with_drift()
        for k in (3, 7):
            g = posegraph.add_prior(
                g, k, jnp.asarray(true_pos[k], jnp.float32), 50.0)
        g_single, costs_s = posegraph.optimize(g, iters=8)

        n_dev = min(4, jax.device_count())
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("map",))
        g_dist, costs_d = posegraph.optimize_distributed(
            g, mesh, iters=8, axis="map")
        np.testing.assert_allclose(np.asarray(g_dist.trans),
                                   np.asarray(g_single.trans), atol=1e-4)
        np.testing.assert_allclose(np.asarray(costs_d),
                                   np.asarray(costs_s), rtol=1e-4)


class TestSLAMGPS:
    def test_gps_factors_attach_and_correct(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_pipeline import small_cfg
        from test_slam import loop_seq, drive
        from fast_limo_tpu.models.slam import SLAM, LoopConfig

        cfg = small_cfg()
        cfg.tpu.max_points_per_scan = 2048
        cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 2048
        cfg.tpu.imu_batch = 64
        n = 20
        seq = loop_seq(n)
        slam = SLAM(cfg, LoopConfig(kf_dist=1.0, exclude_recent=50,
                                    gps_optimize_every=3, gps_weight=20.0))

        stamps, acc, gyro = seq.imu_stream()
        scans = [seq.scan(i) for i in range(n)]
        si = 0
        for k in range(len(stamps)):
            slam.update_imu(stamps[k], acc[k], gyro[k])
            # 2 Hz GPS at ground truth
            if k % 50 == 0:
                slam.update_gps(stamps[k], seq.traj.pos(
                    np.asarray([stamps[k]]))[0])
            while si < n and scans[si][0] <= stamps[k]:
                st, pts, traw = scans[si]
                slam.update_pointcloud(pts, traw, st)
                si += 1
        assert len(slam.gps_factors) >= 2, "no GPS factors attached"
        # factors reference valid keyframes (interp factors need i+1 too)
        for (i, pos, w, a) in slam.gps_factors:
            assert 0 <= i < len(slam.keyframes)
            assert 0 <= i + (1 if a > 0 else 0) < len(slam.keyframes)
            assert w > 0 and 0.0 <= a < 1.0


@pytest.mark.slow
class TestCorridorDegeneracyRemedy:
    """VERDICT r3 / ORACLE_CORRIDOR: the benign-corridor scene (seed 7)
    drifts ~0.23-0.28 m ATE in pure odometry — scene-geometry degeneracy
    (the f64 oracle drifts identically), not numerics.  The remedy the
    reference implies by shipping GPS factors on its loop branch
    (README.md:152-159) must rescue EXACTLY this scene: 1 Hz GPS priors
    through `SLAM.update_gps` with the default `gps_optimize_every`
    auto-optimize cadence."""

    def _corridor(self, n=48, seed=7):
        from fast_limo_tpu.io import synthetic

        return synthetic.SyntheticSequence(
            seed=seed, n_scans=n, points_per_scan=16384,
            noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3,
            traj=synthetic.Trajectory(v_forward=15.0, yaw_amp=0.5))

    def _cfg(self):
        # the bench corridor config at 16k points (bench.kitti_like_cfg
        # shapes; CPU-sized).  Synthetic world: bias-free IMU.
        import bench

        cfg = bench.kitti_like_cfg()
        cfg.tpu.max_points_per_scan = 16384
        cfg.tpu.quantize_transfer = 0.0
        return cfg

    def _run(self, with_gps: bool, n=48, seed=7):
        from fast_limo_tpu.io import synthetic
        from fast_limo_tpu.models.slam import SLAM, LoopConfig

        seq = self._corridor(n, seed)
        # straight corridor, no revisit: loop closure can't fire; keyframes
        # at the default 2 m cadence anchor the GPS priors.  2 Hz GPS +
        # auto-optimize every 5 factors ≈ a 2.5 s smoothing cadence
        # (tighter cadences rebuild the map more often, and every rebuild
        # swaps the dense organic map for sparser keyframe clouds — on a
        # degenerate corridor that ACCELERATES the between-correction
        # drift; measured: cadence 3 → kf RMSE 0.047, cadence 5 → 0.035)
        slam = SLAM(self._cfg(), LoopConfig(gps_weight=20.0,
                                            gps_optimize_every=5))
        stamps, acc, gyro = seq.imu_stream()
        scans = [seq.scan(i) for i in range(n)]
        si = 0
        last_gps = -1e9
        for k in range(len(stamps)):
            slam.update_imu(stamps[k], acc[k], gyro[k])
            if with_gps and stamps[k] - last_gps >= 0.5:
                last_gps = stamps[k]
                gt = seq.traj.pos(np.asarray([stamps[k]]))[0]
                slam.update_gps(stamps[k], gt + 0.02 * np.array([1, -1, 0.5]))
            while si < n and scans[si][0] <= stamps[k]:
                st, pts, traw = scans[si]
                slam.update_pointcloud(pts, traw, st)
                si += 1
        slam.flush()     # final smoothing pass over pending GPS factors
        est = slam.positions()
        gt = seq.traj.pos(slam.stamps())
        err = np.linalg.norm(np.asarray(est) - gt, axis=1)
        # post-flush LIVE filter pose, measured at the filter's own
        # propagation time (the world state is IMU-fresh — comparing it
        # against gt at the last SCAN stamp aliases v·Δt ≈ 0.15 m here)
        ws = slam.get_world_state()
        live_err = float(np.linalg.norm(
            ws["pos"] - seq.traj.pos(np.asarray([ws["time"]]))[0]))
        # the SLAM trajectory estimate = the (retro-smoothed) keyframe poses;
        # the dispatch-time per-scan log keeps pre-correction poses by design
        kfp = np.array([kf.pos for kf in slam.keyframes])
        kgt = seq.traj.pos(np.array([kf.stamp for kf in slam.keyframes]))
        kerr = np.linalg.norm(kfp - kgt, axis=1)
        kf_rmse = float(np.sqrt(np.mean(kerr ** 2)))
        return kf_rmse, err, live_err, slam

    def test_gps_priors_rescue_corridor_drift(self):
        kf_odo, err_odo, live_odo, _ = self._run(with_gps=False)
        # precondition: the scene really is degenerate for pure odometry.
        # The CPU drift band wanders with f32 association details (0.11 →
        # 0.13 → 0.11 across this round's kNN-layout / time-sort changes;
        # the device band in ORACLE_CORRIDOR is 0.26-0.28) — clean scenes
        # track at 0.02-0.05, so 0.09 still separates cleanly
        assert err_odo.max() > 0.09, f"scene no longer degenerate: {err_odo.max()}"
        assert kf_odo > 0.06

        kf_gps, err_gps, live_gps, slam = self._run(with_gps=True)
        assert len(slam.gps_factors) >= 5, "GPS factors did not attach"
        # smoothed trajectory pinned near the GPS accuracy floor (~0.03 m —
        # the injected fix bias), well under the pure-odometry drift.  The
        # absolute bound carries the teeth; the relative bound at 0.6 keeps
        # headroom over the floor when an env shift shrinks kf_odo
        # (measured 0.034 vs 0.082 in this env; 0.037 vs 0.114 round 4 env)
        assert kf_gps < 0.06, (kf_gps, kf_odo)
        assert kf_gps < 0.6 * kf_odo, (kf_gps, kf_odo)
        # the LIVE pose is corrected too, not just the past: the flush
        # smoothing pushes the last-keyframe delta into the filter state
        # (measured live err 0.02 gps vs 0.10 odo in this env).  The
        # pre-correction per-scan log keeps its odometry-shaped tail by
        # design — mid-run optimizes cap it near the odometry band
        assert live_gps < 0.06, (live_gps, live_odo)
        assert live_gps < 0.6 * live_odo, (live_gps, live_odo)
        assert err_gps[-1] < err_odo[-1] + 0.01, (err_gps[-1], err_odo[-1])
