"""Preprocessing filters, time extraction/sorting, voxel downsample."""

import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.models import preprocess
from fast_limo_tpu.ops import voxel


def run_pre(points, t_raw, valid, stamp=0.0, imu_stamp=0.105, **kw):
    args = dict(sensor_type=preprocess.VELODYNE, end_of_sweep=False,
                crop_active=False, crop_min=[-1, -1, -1], crop_max=[1, 1, 1],
                dist_active=False, min_dist=4.0,
                rate_active=False, rate_value=4,
                fov_active=False, fov_angle=np.pi,
                time_offset=False)
    args.update(kw)
    return preprocess.preprocess_scan(
        jnp.asarray(points), jnp.asarray(t_raw), jnp.asarray(valid),
        jnp.asarray(stamp), jnp.asarray(imu_stamp), **args)


class TestFilters:
    def test_crop_box_negative(self, rng):
        pts = np.array([[0.5, 0.5, 0.5], [3.0, 0, 0], [-2, -2, 0]], np.float32)
        _, _, valid, _ = run_pre(pts, np.zeros(3, np.float32), np.ones(3, bool),
                                 crop_active=True)
        assert int(jnp.sum(valid)) == 2  # the inside-box point removed

    def test_min_dist(self):
        pts = np.array([[1, 0, 0], [10, 0, 0]], np.float32)
        _, _, valid, _ = run_pre(pts, np.zeros(2, np.float32), np.ones(2, bool),
                                 dist_active=True, min_dist=4.0)
        assert int(jnp.sum(valid)) == 1

    def test_rate_sampling_uses_original_index(self):
        pts = np.ones((8, 3), np.float32)
        _, _, valid, _ = run_pre(pts, np.zeros(8, np.float32), np.ones(8, bool),
                                 rate_active=True, rate_value=4)
        assert int(jnp.sum(valid)) == 2  # indices 0 and 4

    def test_fov(self):
        pts = np.array([[1, 0, 0], [-1, 0.01, 0], [0, 1, 0]], np.float32)
        _, _, valid, _ = run_pre(pts, np.zeros(3, np.float32), np.ones(3, bool),
                                 fov_active=True, fov_angle=np.pi / 2 * 0.9)
        assert int(jnp.sum(valid)) == 1  # only the forward point

    def test_nan_removed(self):
        pts = np.array([[1, 0, 0], [np.nan, 0, 0]], np.float32)
        _, _, valid, _ = run_pre(pts, np.zeros(2, np.float32), np.ones(2, bool))
        assert int(jnp.sum(valid)) == 1


class TestTimeHandling:
    def test_sorted_by_time(self, rng):
        N = 50
        t = rng.uniform(0, 0.1, N).astype(np.float32)
        pts = rng.normal(size=(N, 3)).astype(np.float32)
        p_s, t_s, valid, scan_end = run_pre(pts, t, np.ones(N, bool))
        tv = np.asarray(t_s)[np.asarray(valid)]
        assert np.all(np.diff(tv) >= 0)
        assert float(scan_end) == np.max(tv)

    def test_velodyne_relative(self):
        t = np.array([0.0, 0.05], np.float32)
        pts = np.ones((2, 3), np.float32)
        _, t_s, _, _ = run_pre(pts, t, np.ones(2, bool), stamp=100.0)
        np.testing.assert_allclose(np.asarray(t_s), [100.0, 100.05], atol=1e-5)

    def test_ouster_nanoseconds(self):
        t = np.array([0.0, 5e7], np.float32)  # 0, 50ms in ns
        pts = np.ones((2, 3), np.float32)
        _, t_s, _, _ = run_pre(pts, t, np.ones(2, bool), stamp=10.0,
                               sensor_type=preprocess.OUSTER)
        np.testing.assert_allclose(np.asarray(t_s), [10.0, 10.05], atol=1e-5)

    def test_end_of_sweep_flips_sign(self):
        t = np.array([0.0, 0.05], np.float32)
        pts = np.ones((2, 3), np.float32)
        _, t_s, _, _ = run_pre(pts, t, np.ones(2, bool), stamp=100.0,
                               end_of_sweep=True)
        # times run backwards from the stamp and get re-sorted ascending
        np.testing.assert_allclose(np.asarray(t_s), [99.95, 100.0], atol=1e-5)

    def test_time_offset_clamped_nonpositive(self):
        t = np.array([0.0, 0.1], np.float32)
        pts = np.ones((2, 3), np.float32)
        # imu behind the last point → offset negative, applied
        _, t_s, _, scan_end = run_pre(pts, t, np.ones(2, bool), stamp=0.0,
                                      imu_stamp=0.05, time_offset=True)
        want_off = 0.05 - 0.1 - 1e-4
        np.testing.assert_allclose(float(scan_end), 0.1 + want_off, atol=1e-6)
        # imu ahead → offset would be positive → clamped to 0
        _, _, _, scan_end2 = run_pre(pts, t, np.ones(2, bool), stamp=0.0,
                                     imu_stamp=0.5, time_offset=True)
        np.testing.assert_allclose(float(scan_end2), 0.1, atol=1e-6)


class TestVoxelDownsample:
    def test_centroids(self):
        pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3],   # leaf (0,0,0)
                        [1.2, 0.1, 0.1]], np.float32)        # leaf (1,0,0)
        out, valid = voxel.voxel_downsample(jnp.asarray(pts), jnp.ones(3, bool), 1.0)
        assert int(jnp.sum(valid)) == 2
        got = np.sort(np.asarray(out)[np.asarray(valid)], axis=0)
        want = np.sort(np.array([[0.2, 0.2, 0.2], [1.2, 0.1, 0.1]], np.float32), axis=0)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_count_matches_numpy(self, rng):
        pts = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
        out, valid = voxel.voxel_downsample(jnp.asarray(pts), jnp.ones(500, bool), 0.5)
        want = len(np.unique(np.floor(pts / 0.5).astype(int), axis=0))
        assert int(jnp.sum(valid)) == want

    def test_invalid_ignored(self, rng):
        pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        v = np.zeros(100, bool)
        out, valid = voxel.voxel_downsample(jnp.asarray(pts), jnp.asarray(v), 0.5)
        assert int(jnp.sum(valid)) == 0


class TestIMU:
    def test_dt_clamp(self):
        stamps = jnp.asarray([0.005, 0.005, 0.5])  # repeat → dt 0; gap 0.495>0.1
        acc = jnp.zeros((3, 3))
        gyro = jnp.zeros((3, 3))
        a, w, dt = preprocess.imu_to_baselink(
            acc, gyro, stamps, jnp.asarray(0.0), jnp.zeros(3),
            R_imu2bl=jnp.eye(3), t_imu2bl=jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(dt), [0.005, 1 / 200, 1 / 200], atol=1e-9)

    def test_lever_arm(self):
        # constant rotation about z, offset imu: centripetal term only
        w0 = np.array([0.0, 0.0, 1.0])
        t_off = np.array([1.0, 0.0, 0.0])
        acc = jnp.zeros((1, 3))
        gyro = jnp.asarray(w0)[None]
        a, w, dt = preprocess.imu_to_baselink(
            acc, gyro, jnp.asarray([0.01]), jnp.asarray(0.0), jnp.asarray(w0),
            R_imu2bl=jnp.eye(3), t_imu2bl=jnp.asarray(t_off))
        # a = w × (w × (-t)) = w × (w × (-x̂)) = (0,0,1)×(0,-(-1),0)... compute:
        want = np.cross(w0, np.cross(w0, -t_off))
        np.testing.assert_allclose(np.asarray(a[0]), want, atol=1e-6)
