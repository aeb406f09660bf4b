"""Relocalization against a keyframe database + session save/load."""

import numpy as np
import pytest

from fast_limo_tpu.models import relocalize as rl
from fast_limo_tpu.models.slam import SLAM, Keyframe, LoopConfig
from fast_limo_tpu.ops import so3
import jax.numpy as jnp

from test_loop import ring_scene, yaw_rot
from test_pipeline import small_cfg
from test_slam import loop_seq, drive


def make_kf(idx, pos, yaw, cloud, rng):
    from fast_limo_tpu.models import scancontext
    q = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)], np.float32)
    desc = np.asarray(scancontext.descriptor(
        jnp.asarray(cloud), jnp.ones(len(cloud), bool)))
    return Keyframe(
        index=idx, stamp=float(idx), pos=np.asarray(pos, np.float32), quat=q,
        desc=desc,
        ring_key=np.asarray(scancontext.ring_key(jnp.asarray(desc))),
        cloud=cloud, cloud_valid=np.ones(len(cloud), bool))


class TestRelocalize:
    def test_finds_correct_keyframe_and_pose(self, rng):
        # three distinct places; query revisits place 1 with an offset
        scenes = [ring_scene(np.random.default_rng(s), 1024,
                             w1_y=8.0 + 7 * s, w2_x=-12.0 - 6 * s)
                  for s in range(3)]
        kfs = [make_kf(i, [20.0 * i, 0, 0], 0.15 * i, scenes[i], rng)
               for i in range(3)]

        yaw_q = 0.3
        t_q = np.array([0.5, -0.3, 0.0], np.float32)
        # query cloud = scene 1 observed from a pose offset by (yaw_q, t_q)
        # relative to keyframe 1's pose
        R = yaw_rot(yaw_q)
        query = ((scenes[1] - t_q) @ R).astype(np.float32)

        res = rl.relocalize(query, np.ones(len(query), bool), kfs,
                            sc_thresh=0.4)
        assert res.success
        assert res.keyframe_index == 1
        # query frame: p_kf = R(yaw_q)·p_q + t_q  ⇒  T_kf←q = (yaw_q, t_q)
        # ⇒ world pose = T_world←kf1 ∘ (yaw_q, t_q)
        want_q = so3.quat_mul(jnp.asarray(kfs[1].quat),
                              so3.exp_quat(jnp.asarray([0, 0, yaw_q])))
        got_q = jnp.asarray(res.quat)
        dq = so3.quat_mul(so3.quat_conj(got_q), want_q)
        assert float(jnp.linalg.norm(so3.log_quat(dq))) < 0.05
        want_p = np.asarray(so3.quat_rotate(jnp.asarray(kfs[1].quat),
                                            jnp.asarray(t_q))) + kfs[1].pos
        np.testing.assert_allclose(res.pos, want_p, atol=0.05)

    def test_fails_on_unknown_place(self, rng):
        kfs = [make_kf(0, [0, 0, 0], 0.0, ring_scene(rng, 1024), rng)]
        alien = rng.uniform(-30, 30, (1024, 3)).astype(np.float32)
        res = rl.relocalize(alien, np.ones(1024, bool), kfs, sc_thresh=0.2)
        assert not res.success

    def test_empty_db(self):
        res = rl.relocalize(np.zeros((10, 3), np.float32), np.ones(10, bool), [])
        assert not res.success


@pytest.mark.slow
class TestSession:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = small_cfg()
        cfg.tpu.max_points_per_scan = 3072
        cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 3072
        cfg.tpu.imu_batch = 64
        seq = loop_seq(12)
        slam = SLAM(cfg, LoopConfig(kf_dist=1.0, exclude_recent=50))
        drive(slam, seq, 12)
        n_kf = len(slam.keyframes)
        assert n_kf >= 2

        prefix = str(tmp_path / "session")
        slam.save_session(prefix)

        slam2 = SLAM(cfg)
        slam2.load_session(prefix)
        assert len(slam2.keyframes) == n_kf
        np.testing.assert_allclose(slam2.keyframes[1].pos, slam.keyframes[1].pos)
        assert int(slam2.loc.state.map.num_points) == int(slam.loc.state.map.num_points)

        # relocalize the last keyframe's cloud inside the loaded session
        kf = slam.keyframes[-1]
        res = slam2.relocalize_scan(kf.cloud, kf.cloud_valid, sc_thresh=0.5)
        assert res.success
        assert np.linalg.norm(res.pos - kf.pos) < 1.0


@pytest.mark.slow
class TestMultiSession:
    def test_relocalize_and_continue(self, tmp_path):
        """ONA-style workflow: map in session 1; a new run starts mid-route,
        relocalizes against the saved session, and keeps tracking in the
        session-1 world frame."""
        from fast_limo_tpu.io import synthetic
        from fast_limo_tpu.models import relocalize as rlz

        cfg = small_cfg()
        cfg.tpu.max_points_per_scan = 3072
        cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 3072
        cfg.tpu.imu_batch = 64

        seq = loop_seq(40)
        # ---- session 1: map the first 30 scans ----
        s1 = SLAM(cfg, LoopConfig(kf_dist=1.5, exclude_recent=50))
        drive(s1, seq, 30)
        prefix = str(tmp_path / "ona")
        s1.save_session(prefix)
        t_resume = s1.trajectory[-1]["stamp"]

        # ---- session 2: resume near the end of session 1's route ----
        s2 = SLAM(cfg, LoopConfig(kf_dist=1.5, exclude_recent=50))
        s2.load_session(prefix)

        # relocalize with a scan taken at the resume point
        stamps, acc, gyro = seq.imu_stream()
        scans = [seq.scan(i) for i in range(40)]
        st_a, pts_a, _ = scans[28]
        st0, pts0, _ = scans[29]
        res, vel = rlz.relocalize_pair(
            pts_a[:3072], np.ones(min(len(pts_a), 3072), bool),
            pts0[:3072], np.ones(min(len(pts0), 3072), bool),
            st0 - st_a, s2.keyframes, sc_thresh=0.5)
        assert res.success
        gt_p, _ = seq.gt_pose(st0)
        assert np.linalg.norm(res.pos - gt_p) < 1.5
        gt_v = seq.traj.vel(st0)
        assert np.linalg.norm(vel - gt_v) < 2.0
        rlz.apply_to_localizer(s2.loc, res, velocity=vel)

        # continue feeding the remaining sensor stream
        si = 30
        for k in range(len(stamps)):
            if stamps[k] <= st0:
                continue
            s2.update_imu(stamps[k], acc[k], gyro[k])
            while si < 40 and scans[si][0] <= stamps[k]:
                ss, pp, tt = scans[si]
                s2.update_pointcloud(pp, tt, ss)
                si += 1

        assert len(s2.trajectory) >= 8
        est = s2.positions()
        gt = seq.traj.pos(s2.stamps())
        err = np.linalg.norm(est - gt, axis=1)
        assert err[-1] < 1.2, f"session-2 errors: {err.round(2)}"
        assert err[-1] <= err.max() + 1e-6  # not diverging
