"""IMU-rate odometry output (updateIMU → propagate → publish path).

The reference publishes world/body odometry + covariances on every IMU tick
(src/main.cpp:78-94, Localizer.cpp:401-531); here `Localizer.get_world_state`
must be fresh at IMU rate between scans, match an independent f64 oracle
propagation, and leave the scan pipeline's carried state untouched.
"""

import numpy as np

import oracle
from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models.localizer import Localizer
from test_pipeline import run_odometry, small_cfg


def _seq(n=8, seed=5):
    return synthetic.SyntheticSequence(
        seed=seed, n_scans=n, points_per_scan=4096,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3)


def _feed_scans(loc, seq, n_scans):
    """Feed IMU+scans until n_scans dispatched; return index of next IMU."""
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]
    si = k = 0
    while si < n_scans:
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < n_scans and scans[si][0] <= stamps[k]:
            st, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st)
            si += 1
        k += 1
    return (stamps, acc, gyro), k


def test_world_state_fresh_at_imu_rate():
    """Between scans the published state advances per IMU tick."""
    loc = Localizer(small_cfg())
    seq = _seq()
    (stamps, acc, gyro), k = _feed_scans(loc, seq, 4)

    poss, times = [], []
    for j in range(k, k + 8):
        loc.update_imu(stamps[j], acc[j], gyro[j])
        ws = loc.get_world_state()
        assert abs(ws["time"] - stamps[j]) < 1e-4, (ws["time"], stamps[j])
        times.append(ws["time"])
        poss.append(ws["pos"])
    # the synthetic platform moves ~8 m/s → ~8 cm per 100 Hz tick
    steps = np.linalg.norm(np.diff(np.array(poss), axis=0), axis=1)
    assert np.all(steps > 0.01), steps
    assert np.all(steps < 0.5), steps


def test_propagation_matches_f64_oracle():
    """The device propagation equals the independent NumPy f64 filter
    (oracle.predict) chained over the same pending samples."""
    loc = Localizer(small_cfg())
    seq = _seq()
    (stamps, acc, gyro), k = _feed_scans(loc, seq, 3)
    for j in range(k, k + 6):   # pending ticks past the last scan
        loc.update_imu(stamps[j], acc[j], gyro[j])

    # snapshot the scan posterior BEFORE querying
    x0 = {f: np.asarray(getattr(loc.state.x, f), float)
          for f in ("pos", "rot", "rot_LI", "t_LI", "vel", "bg", "ba", "grav")}
    P0 = np.asarray(loc.state.P, float)
    pend = [p for p in loc._imu_queue if p[0] > loc._last_consumed_stamp]
    assert len(pend) >= 6

    cfg = loc.cfg
    Q = np.diag(np.concatenate([
        np.full(3, cfg.ikfom.cov_gyro), np.full(3, cfg.ikfom.cov_acc),
        np.full(3, cfg.ikfom.cov_bias_gyro), np.full(3, cfg.ikfom.cov_bias_acc)]))
    s, P = x0, P0
    prev_t = loc._last_consumed_stamp
    for (ts, a, g) in pend:           # identity imu extrinsics/sm, zero corr
        dt = ts - prev_t
        if dt <= 0.0 or dt > 0.1:     # Localizer.cpp:702 clamp
            dt = 1.0 / 200.0
        s, P = oracle.predict(s, P, a, g, dt, Q)
        prev_t = ts

    ws = loc.get_world_state()
    np.testing.assert_allclose(ws["pos"], s["pos"], atol=2e-4)
    np.testing.assert_allclose(ws["quat"], s["rot"], atol=1e-5)
    v_body = oracle.qmat(s["rot"]).T @ s["vel"]
    np.testing.assert_allclose(ws["vel_body"], v_body, atol=2e-4)
    # published covariances use the propagated P too
    pose_cov = loc.get_pose_covariance()
    np.testing.assert_allclose(pose_cov[0:3, 0:3], P[0:3, 0:3],
                               rtol=1e-3, atol=1e-7)
    twist_cov = loc.get_twist_covariance()
    np.testing.assert_allclose(twist_cov[0:3, 0:3], P[12:15, 12:15],
                               rtol=1e-3, atol=1e-7)


def test_query_does_not_perturb_trajectory():
    """Interleaving IMU-rate queries must not change the scan trajectory
    (the propagation is a pure read; samples are re-consumed by scan_step)."""
    seq = _seq(n=6, seed=9)
    cfg = small_cfg()
    ref = run_odometry(cfg, seq, 6)

    loc = Localizer(small_cfg())
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(6)]
    si = 0
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        loc.get_world_state()
        loc.get_pose_covariance()
        while si < 6 and scans[si][0] <= stamps[k]:
            st, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st)
            si += 1

    assert len(loc.trajectory) == len(ref.trajectory) == 6
    for ta, tb in zip(loc.trajectory, ref.trajectory):
        np.testing.assert_array_equal(ta["pos"], tb["pos"])
        np.testing.assert_array_equal(ta["quat"], tb["quat"])


def test_no_pending_falls_back_to_scan_state():
    """With no samples past the last scan the query returns the carried
    posterior (and never dispatches the propagation step)."""
    loc = Localizer(small_cfg())
    seq = _seq()
    _feed_scans(loc, seq, 3)
    # drain: consume every queued sample into a dispatched scan by clearing
    loc._imu_queue.clear()
    ws = loc.get_world_state()
    np.testing.assert_array_equal(ws["pos"], np.asarray(loc.state.x.pos))
    assert loc._prop_step is None  # fallback never built/dispatched it


def test_imu_overflow_preintegration_matches_large_batch():
    """A batch overflowing tpu.imu_batch is pre-integrated through the prop
    step; the trajectory must match a run whose batch cap holds everything
    (same algebra, different association order → tight f32 tolerance)."""
    seq = _seq(n=5, seed=21)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(5)]

    def run(imu_batch, delay_first):
        cfg = small_cfg()
        cfg.tpu.imu_batch = imu_batch
        loc = Localizer(cfg)
        si = 0
        for k in range(len(stamps)):
            loc.update_imu(stamps[k], acc[k], gyro[k])
            while si < 5 and scans[si][0] <= stamps[k]:
                # hold back the first scan so 40+ samples accumulate
                if delay_first and si == 0 and stamps[k] < 0.45:
                    break
                st, pts, traw = scans[si]
                loc.update_pointcloud(pts, traw, st)
                si += 1
        return loc

    big = run(128, True)      # all samples fit one scan batch
    small = run(32, True)     # overflow path: pre-integration kicks in
    assert len(big.trajectory) == len(small.trajectory) == 5
    for ta, tb in zip(big.trajectory, small.trajectory):
        np.testing.assert_allclose(ta["pos"], tb["pos"], atol=2e-3)
        np.testing.assert_allclose(ta["quat"], tb["quat"], atol=2e-4)
