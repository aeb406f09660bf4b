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
        # factors reference valid keyframes
        for (i, pos, w) in slam.gps_factors:
            assert 0 <= i < len(slam.keyframes)
            assert w > 0
