"""Full SLAM with loop closure on a closed circular trajectory."""

import numpy as np
import pytest

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models.slam import SLAM, Keyframe, LoopConfig
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


class TestRebuildDensity:
    def test_post_loop_rebuild_keeps_insert_density(self):
        """The post-loop map rebuild must use the near-insert-density
        rebuild clouds, not the 1024-pt ICP clouds (round-2 weak #2: one
        loop closure silently decimated the matching map ~10×; the
        reference's octree never loses density, Mapper.cpp:88-98)."""
        from fast_limo_tpu.models import pipeline as pl

        cfg = small_cfg()
        slam = SLAM(cfg, LoopConfig(icp_points=256, rebuild_points=4096,
                                    rebuild_batch=4))
        slam.loc.state = pl.init_state(cfg)
        rng = np.random.default_rng(0)
        for k in range(5):
            icp = rng.uniform(-40, 40, (256, 3)).astype(np.float32)
            reb = rng.uniform(-40, 40, (4096, 3)).astype(np.float32)
            slam.keyframes.append(Keyframe(
                index=k, stamp=float(k), pos=np.array([4.0 * k, 0, 0]),
                quat=np.array([1.0, 0, 0, 0]),
                desc=np.zeros((20, 60), np.float32),
                ring_key=np.zeros(20, np.float32),
                cloud=icp, cloud_valid=np.ones(256, bool),
                rebuild_cloud=reb, rebuild_valid=np.ones(4096, bool)))

        slam._rebuild_map()
        dense = int(slam.loc.state.map.num_points)

        # legacy fallback: no rebuild clouds → rebuild from ICP clouds
        for kf in slam.keyframes:
            kf.rebuild_cloud = kf.rebuild_valid = None
        slam._rebuild_step = None
        slam._rebuild_map()
        sparse = int(slam.loc.state.map.num_points)

        assert sparse > 0
        assert dense > 4 * sparse, (dense, sparse)


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

    def test_keyframe_cloud_pose_pairing_multi_scan_drain(self):
        """Two scans dispatched in ONE drain (IMU coverage jump) must each
        keep their OWN cloud/descriptor — the round-2 weak spot paired the
        older scan's pose with the NEWER scan's cloud (read off
        last_output)."""
        import jax

        cfg = small_cfg()
        cfg.tpu.max_points_per_scan = 3072
        cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 3072
        cfg.tpu.imu_batch = 128
        n = 6
        seq = loop_seq(n)
        # every scan becomes a keyframe so the pairing is fully checked
        slam = SLAM(cfg, LoopConfig(kf_dist=0.0, kf_angle=0.0,
                                    exclude_recent=50))
        stamps, acc, gyro = seq.imu_stream()
        scans = [seq.scan(i) for i in range(n)]
        # SPARSE IMU (every 50th sample ≈ 2 Hz vs 5 Hz scans): scans queue
        # uncovered, then one IMU sample covers 2-3 of them at once — the
        # multi-scan drain that mispaired cloud and pose in round 2
        si = 0
        multi_drain = False
        for k in range(0, len(stamps), 50):
            while si < n and scans[si][0] <= stamps[k]:
                st, pts, traw = scans[si]
                slam.update_pointcloud(pts, traw, st)
                si += 1
            before = len(slam.loc._raw_outputs)
            slam.update_imu(stamps[k], acc[k], gyro[k])
            multi_drain |= len(slam.loc._raw_outputs) - before >= 2
        if (len(stamps) - 1) % 50:   # cover any scans past the sparse tail
            slam.update_imu(stamps[-1], acc[-1], gyro[-1])
        slam.flush()
        assert multi_drain, "feed pattern failed to force a multi-scan drain"

        # with kf_dist=0 every dispatched scan becomes a keyframe
        assert len(slam.keyframes) == len(slam.loc._raw_outputs) >= n - 1
        # every keyframe's cloud must equal the subsample of ITS scan's own
        # scan_body, and its pose that scan's own output
        raw = slam.loc._raw_outputs
        for kf in slam.keyframes:
            epoch, out = raw[kf.scan_index]
            assert out is not None
            body, valid, pos = jax.device_get(
                (out.scan_body, out.final_valid, out.pos))
            sel = np.nonzero(np.asarray(valid))[0]
            P = slam.loop_cfg.icp_points
            if len(sel) > P:
                sel = sel[np.linspace(0, len(sel) - 1, P).astype(int)]
            want = np.asarray(body)[sel]
            got = kf.cloud[kf.cloud_valid]
            np.testing.assert_array_equal(got, want)
            np.testing.assert_allclose(kf.pos, np.asarray(pos), atol=1e-6)

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
