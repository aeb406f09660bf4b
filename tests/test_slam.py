"""Full SLAM with loop closure on a closed circular trajectory."""

import numpy as np
import pytest

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models.slam import SLAM, LoopConfig
from test_pipeline import small_cfg


def loop_seq(n_scans, radius=9.0, v=4.0):
    traj = synthetic.LoopTrajectory(v_forward=v, radius=radius, ramp_tau=0.8)
    world = synthetic.build_loop_world(11, radius=radius)
    return synthetic.SyntheticSequence(
        seed=11, n_scans=n_scans, points_per_scan=3000, scan_rate=5.0,
        noise_pt=0.01, noise_gyro=8e-4, noise_acc=8e-3, max_range=25.0,
        traj=traj, world=world)


def drive(slam, seq, n_scans):
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]
    si = 0
    for k in range(len(stamps)):
        slam.update_imu(stamps[k], acc[k], gyro[k])
        while si < n_scans and scans[si][0] <= stamps[k]:
            st, pts, traw = scans[si]
            slam.update_pointcloud(pts, traw, st)
            si += 1
    return slam


@pytest.mark.slow
class TestSLAMLoop:
    def test_keyframes_accumulate(self):
        cfg = small_cfg()
        cfg.tpu.max_points_per_scan = 3072
        cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 3072
        cfg.tpu.imu_batch = 64
        seq = loop_seq(10)
        slam = SLAM(cfg, LoopConfig(kf_dist=1.0, exclude_recent=50))
        drive(slam, seq, 10)
        assert len(slam.keyframes) >= 2
        kf = slam.keyframes[0]
        assert kf.desc.shape == (20, 60)
        assert kf.cloud_valid.any()

    def test_loop_closes_around_circle(self):
        cfg = small_cfg()
        cfg.tpu.max_points_per_scan = 3072
        cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 3072
        cfg.tpu.imu_batch = 64
        # ~1.25 laps of a 2πr≈56 m circle at 4 m/s, 5 Hz scans
        n = 90
        seq = loop_seq(n)
        slam = SLAM(cfg, LoopConfig(
            kf_dist=2.0, exclude_recent=8, sc_dist_thresh=0.35,
            icp_min_inliers=150, loop_weight=30.0))
        drive(slam, seq, n)

        est = slam.positions()
        ts = slam.stamps()
        gt = seq.traj.pos(ts)
        err = np.linalg.norm(est - gt, axis=1)
        assert slam.n_loops_closed >= 1, "no loop closures fired"
        ate = synthetic.ate_rmse(est, gt)
        assert ate < 1.0, f"ATE {ate:.2f} m with {slam.n_loops_closed} loops"
