"""Sensor-realism options of the synthetic world (VERDICT r4 #7): spinning
ring geometry with azimuth-coupled firing times, range-dependent dropout,
IMU bias random walk — and the engine tracking through all of them."""

import numpy as np
import pytest

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models.localizer import Localizer

from test_pipeline import small_cfg


def realistic_seq(n_scans=10, points=4096):
    return synthetic.SyntheticSequence(
        seed=3, n_scans=n_scans, points_per_scan=points,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3,
        ring_beams=64, sensor_height=1.73, dropout=0.15,
        bias_walk_gyro=2e-4, bias_walk_acc=2e-3)


class TestRingGeometry:
    def test_elevations_quantized_to_beams(self):
        seq = realistic_seq()
        stamp, pts, _t = seq.scan(2)
        # body-frame-at-firing-time points: elevations must cluster on the
        # 64 discrete beams (the scan() output is already sensor-frame)
        el = np.arctan2(pts[:, 2], np.hypot(pts[:, 0], pts[:, 1]))
        lo, hi = seq.beam_fov
        spacing = (hi - lo) / (seq.ring_beams - 1)
        k = np.round((el - lo) / spacing)
        resid = np.abs(el - (lo + k * spacing))
        # noise_pt adds ~0.01 m jitter ≈ 1-2 mrad at 10 m; beam tolerance
        # is 0.25·spacing ≈ 1.9 mrad — quantization must dominate
        assert np.quantile(resid, 0.9) < 0.4 * spacing
        # and the beams are POPULATED (not one ring)
        assert len(np.unique(np.clip(k, 0, 63))) > 20

    def test_firing_times_azimuth_coupled(self):
        seq = realistic_seq()
        stamp, pts, t_rel = seq.scan(2)
        az = np.arctan2(pts[:, 1], pts[:, 0]) % (2 * np.pi)
        want = az / (2 * np.pi) / seq.scan_rate
        # pts are in the firing-time sensor frame, so azimuth/period must
        # reproduce the firing time almost exactly (noise_pt jitters
        # azimuth by ~1 mrad → ~0.02 ms)
        err = np.abs(want - t_rel)
        err = np.minimum(err, 1.0 / seq.scan_rate - err)   # 2π wrap
        assert np.quantile(err, 0.95) < 2e-4, np.quantile(err, 0.95)

    def test_dropout_thins_far_returns(self):
        # points_per_scan above the on-beam candidate count, so the return
        # counts are dropout-limited, not cap-limited
        base = synthetic.SyntheticSequence(seed=3, n_scans=4,
                                           points_per_scan=65536,
                                           ring_beams=64, sensor_height=1.73)
        drop = synthetic.SyntheticSequence(seed=3, n_scans=4,
                                           points_per_scan=65536,
                                           ring_beams=64, sensor_height=1.73,
                                           dropout=0.6)
        _s0, p0, _ = base.scan(1)
        _s1, p1, _ = drop.scan(1)
        assert len(p1) < len(p0)
        # survivors skew nearer than the undropped population
        assert (np.median(np.linalg.norm(p1, axis=1))
                < np.median(np.linalg.norm(p0, axis=1)) + 1e-6)

    def test_deterministic(self):
        seq = realistic_seq()
        s1, p1, t1 = seq.scan(3)
        s2, p2, t2 = seq.scan(3)
        assert s1 == s2
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(t1, t2)

    def test_legacy_draws_unchanged(self):
        """All realism knobs off → bit-identical to the legacy sequence
        (the new draws are gated, never reordered)."""
        a = synthetic.SyntheticSequence(seed=5, n_scans=3,
                                        points_per_scan=2048)
        _s, pa, ta = a.scan(1)
        sa, aa, ga = a.imu_stream()
        b = synthetic.SyntheticSequence(seed=5, n_scans=3,
                                        points_per_scan=2048,
                                        ring_beams=0, dropout=0.0,
                                        bias_walk_gyro=0.0)
        _s, pb, tb = b.scan(1)
        sb, ab, gb = b.imu_stream()
        np.testing.assert_array_equal(pa, pb)
        np.testing.assert_array_equal(ta, tb)
        np.testing.assert_array_equal(aa, ab)
        np.testing.assert_array_equal(ga, gb)


@pytest.mark.slow
def test_engine_tracks_realistic_sensor():
    """End-to-end: ring geometry + azimuth-time coupling + dropout + bias
    walk — the engine must still track to cm-level ATE (the band VERDICT r4
    #7 asks to stay within 2× of the uniform-sampling bands)."""
    cfg = small_cfg()
    cfg.tpu.max_points_per_scan = 4096
    cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 4096
    n = 12
    seq = realistic_seq(n_scans=n, points=4096)
    loc = Localizer(cfg)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n)]
    si = 0
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < n and scans[si][0] <= stamps[k]:
            st, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st)
            si += 1
    est = loc.positions()
    gt = seq.traj.pos(loc.stamps())
    ate = synthetic.ate_rmse(est, gt)
    assert ate < 0.08, f"realistic-sensor ATE {ate:.3f} m"
