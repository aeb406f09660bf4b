"""Generic extracted-sequence reader (io/generic.py): layout round-trip,
profile configs runnable end-to-end, absolute-stamp (HESAI/LIVOX) epoch
rebasing, GPS factor flow."""

import os

import numpy as np
import pytest

from fast_limo_tpu.io import generic, synthetic
from fast_limo_tpu.models.localizer import Localizer
from fast_limo_tpu.models.slam import SLAM
from fast_limo_tpu.utils.config import Config
from test_pipeline import small_cfg

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def small_synth(n=4, pts=4096):
    return synthetic.SyntheticSequence(
        seed=6, n_scans=n, points_per_scan=pts,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3)


def test_export_read_roundtrip(tmp_path):
    seq = small_synth()
    root = str(tmp_path / "seq")
    generic.export_synthetic(root, seq, generic.VELODYNE, n_scans=3)
    g = generic.GenericSequence(root)
    assert len(g) == 3
    stamp, xyz, t_raw = g.scan(1)
    s0, p0, t0 = seq.scan(1)
    assert stamp == pytest.approx(s0)
    np.testing.assert_allclose(xyz, p0, atol=1e-6)
    np.testing.assert_allclose(t_raw, t0, atol=1e-6)   # velodyne: native == rel
    # stream is time-sorted
    kinds_times = []
    for kind, i in g.stream():
        t = {"imu": g.imu_stamps, "scan": g.scan_stamps,
             "gps": g.gps_stamps}[kind][i]
        kinds_times.append(t)
    assert kinds_times == sorted(kinds_times)


def test_sensor_time_conventions_roundtrip():
    t_rel = np.array([0.0, 0.02, 0.09])
    stamp = 12.3
    from fast_limo_tpu.models import preprocess

    for sensor in (generic.OUSTER, generic.VELODYNE, generic.HESAI,
                   generic.LIVOX):
        raw = generic.to_sensor_time(t_rel, stamp, sensor)
        t_abs = preprocess.extract_point_times(
            np.asarray(raw, np.float64), stamp, sensor, False)
        np.testing.assert_allclose(np.asarray(t_abs), stamp + t_rel, atol=1e-6)


@pytest.mark.parametrize("profile,sensor", [
    ("kitti_tpu.yaml", 1), ("utbm_tpu.yaml", 1),
    ("cat_tpu.yaml", 1), ("ona_tpu.yaml", 2)])
def test_profile_configs_run_end_to_end(tmp_path, profile, sensor):
    """Every north-star profile config executes against the documented
    sequence layout (shapes shrunk + calibration off for CPU test speed —
    the CLI runs the untouched YAMLs the same way)."""
    cfg = Config.from_yaml(os.path.join(CONFIG_DIR, profile))
    assert cfg.sensor_type == sensor
    cfg.tpu.max_points_per_scan = 4096
    cfg.tpu.map_capacity = 2 ** 15
    cfg.tpu.imu_batch = 32
    cfg.gravity_align = cfg.calibrate_accel = cfg.calibrate_gyro = False
    cfg.intrinsics.accel_bias = [0.0] * 3
    cfg.intrinsics.gyro_bias = [0.0] * 3
    cfg.filters.rate_active = False      # keep ≥1k points at 4096 test pads

    root = str(tmp_path / "seq")
    generic.export_synthetic(root, small_synth(), cfg.sensor_type, n_scans=3,
                             end_of_sweep=cfg.end_of_sweep)
    slam = SLAM(cfg, enable_loop_closure=False)
    generic.run_sequence(slam, generic.GenericSequence(root))
    traj = slam.trajectory
    assert len(traj) == 3
    for t in traj:
        assert np.all(np.isfinite(t["pos"]))
    # tracking sanity: forward motion is being estimated (full convergence
    # takes more scans than this smoke test runs)
    assert np.linalg.norm(traj[-1]["pos"] - traj[0]["pos"]) > 0.2


def test_hesai_epoch_scale_stamps_time_shift_invariant():
    """Absolute per-point seconds at real epoch scale (~1.7e9 s) must give
    the SAME trajectory as the same data near t=0: the host rebases t_raw
    to the scan epoch in f64 before any f32 cast."""
    EPOCH = 1.7e9
    cfg_a = small_cfg()
    cfg_a.sensor_type = 2
    cfg_b = small_cfg()
    cfg_b.sensor_type = 2
    seq = small_synth(n=4)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(4)]

    def run(cfg, shift):
        loc = Localizer(cfg)
        si = 0
        for k in range(len(stamps)):
            loc.update_imu(stamps[k] + shift, acc[k], gyro[k])
            while si < 4 and scans[si][0] <= stamps[k]:
                st, pts, t_rel = scans[si]
                t_raw = generic.to_sensor_time(
                    t_rel.astype(np.float64), st + shift, 2)
                loc.update_pointcloud(pts, t_raw, st + shift)
                si += 1
        return loc

    la, lb = run(cfg_a, 0.0), run(cfg_b, EPOCH)
    assert len(la.trajectory) == len(lb.trajectory) == 4
    # f64 eps at 1.7e9 s is ~2e-7 s, so stamp DIFFERENCES (epoch shifts,
    # imu offsets) carry that rounding — ulp-level pose differences are
    # expected; anything larger means the rebase is broken (pre-fix the
    # deskew integrated whole absolute seconds and diverged by meters).
    for k, (ta, tb) in enumerate(zip(la.trajectory, lb.trajectory)):
        # ~2e-7 s stamp rounding → ~3e-6 m point shifts, amplified a few ×
        # by matching/plane fits (the exact factor moved with the round-4
        # block-map hash: different summation order, same physics)
        atol = 3e-5 if k < 2 else 5e-3   # later scans: rounding feeds back
        np.testing.assert_allclose(ta["pos"], tb["pos"], atol=atol)
        np.testing.assert_allclose(ta["quat"], tb["quat"], atol=atol)
        assert tb["stamp"] - ta["stamp"] == pytest.approx(EPOCH)


def test_standstill_calibration_export(tmp_path):
    """A profile WITH IMU calibration works off the exported standstill."""
    cfg = small_cfg()
    cfg.gravity_align = cfg.calibrate_accel = cfg.calibrate_gyro = True
    cfg.imu_calib_time = 1.0
    cfg.tpu.imu_batch = 128   # post-calibration backlog lands in scan 0
    root = str(tmp_path / "seq")
    generic.export_synthetic(root, small_synth(), 1, n_scans=3,
                             standstill=1.5)
    loc = Localizer(cfg)
    generic.run_sequence(loc, generic.GenericSequence(root))
    assert loc.imu_calibrated
    assert len(loc.trajectory) == 3
    # calibrated biases ≈ 0 (the synthetic IMU is bias-free)
    assert np.linalg.norm(loc.init_bg) < 5e-3
    assert np.linalg.norm(loc.init_ba) < 5e-2


def test_gps_factors_flow_into_slam(tmp_path):
    root = str(tmp_path / "seq")
    generic.export_synthetic(root, small_synth(), 1, n_scans=4,
                             gps_every=1, gps_noise=0.05)
    g = generic.GenericSequence(root)
    assert len(g.gps_stamps) == 4
    cfg = small_cfg()
    from fast_limo_tpu.models.slam import LoopConfig

    slam = SLAM(cfg, loop_cfg=LoopConfig(kf_dist=0.1, kf_angle=0.01))
    generic.run_sequence(slam, g)
    assert len(slam.trajectory) == 4
    assert len(slam.gps_factors) >= 2   # fixes attached to keyframes
