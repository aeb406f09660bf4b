"""Input validation + map eviction + evaluation utils."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.models import mapper, preprocess
from fast_limo_tpu.utils import evaluation, validation


class TestValidation:
    def test_velodyne_relative_ok(self):
        validation.check_pointcloud(np.zeros((10, 3)), np.linspace(0, 0.1, 10), 1)

    def test_velodyne_absolute_rejected(self):
        with pytest.raises(validation.PointcloudStructureError):
            validation.check_pointcloud(
                np.zeros((10, 3)), np.full(10, 1.6e9), preprocess.VELODYNE)

    def test_ouster_ns(self):
        validation.check_pointcloud(
            np.zeros((4, 3)), np.array([0, 1e7, 5e7, 9e7]), preprocess.OUSTER)

    def test_hesai_needs_abs_near_stamp(self):
        validation.check_pointcloud(
            np.zeros((2, 3)), np.array([100.0, 100.05]), preprocess.HESAI, stamp=100.0)
        with pytest.raises(validation.PointcloudStructureError):
            validation.check_pointcloud(
                np.zeros((2, 3)), np.array([0.0, 0.05]), preprocess.HESAI, stamp=100.0)

    def test_bad_shapes(self):
        with pytest.raises(validation.PointcloudStructureError):
            validation.check_pointcloud(np.zeros((10, 4)), np.zeros(10), 1)
        with pytest.raises(validation.PointcloudStructureError):
            validation.check_pointcloud(np.zeros((10, 3)), np.zeros(9), 1)

    def test_unknown_sensor(self):
        with pytest.raises(validation.PointcloudStructureError):
            validation.check_pointcloud(np.zeros((2, 3)), np.zeros(2), 7)

    def test_imu(self):
        validation.check_imu(np.zeros(3), np.zeros(3))
        with pytest.raises(ValueError):
            validation.check_imu(np.array([np.nan, 0, 0]), np.zeros(3))


class TestEviction:
    def test_evicts_far_voxels(self, rng):
        m = mapper.create(4096, 2)
        near = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
        far = rng.uniform(50, 60, (200, 3)).astype(np.float32)
        pts = np.concatenate([near, far])
        m = mapper.insert(m, jnp.asarray(pts), jnp.ones(400, bool), voxel_size=0.5)
        n0 = int(m.num_points)
        m2 = mapper.evict_far(m, jnp.zeros(3), 10.0, voxel_size=0.5)
        assert 0 < int(m2.num_points) < n0
        # everything near the origin survives
        _, sq, valid = mapper.knn(m2, jnp.asarray(near[:20]), voxel_size=0.5, k=1)
        assert bool(jnp.all(valid[:, 0]))
        # far region gone
        _, _, valid_far = mapper.knn(m2, jnp.asarray(far[:20]), voxel_size=0.5, k=1)
        assert not bool(jnp.any(valid_far))

    def test_reinsert_after_evict(self, rng):
        m = mapper.create(1024, 1)
        pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        m = mapper.insert(m, jnp.asarray(pts), jnp.ones(100, bool), voxel_size=0.5)
        m = mapper.evict_far(m, jnp.asarray([100.0, 0, 0]), 1.0, voxel_size=0.5)
        assert int(m.num_points) == 0
        m = mapper.insert(m, jnp.asarray(pts), jnp.ones(100, bool), voxel_size=0.5)
        assert int(m.num_points) > 0


class TestEvaluation:
    def test_ate_zero_for_identical(self, rng):
        p = rng.normal(size=(50, 3))
        assert evaluation.ate_rmse(p, p) < 1e-12

    def test_ate_alignment_removes_rigid_offset(self, rng):
        p = rng.normal(size=(50, 3)) * 10
        R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        q = p @ R.T + np.array([5, -3, 2.0])
        assert evaluation.ate_rmse(q, p) < 1e-9

    def test_rpe(self, rng):
        p = np.cumsum(rng.normal(size=(100, 3)), axis=0)
        drift = p + np.linspace(0, 1, 100)[:, None] * np.array([1.0, 0, 0])
        r = evaluation.rpe(drift, p, delta=10)
        assert r["rmse"] == pytest.approx(10 / 99, rel=1e-6)

    def test_tum_roundtrip(self, tmp_path, rng):
        n = 10
        stamps = np.arange(n, dtype=float)
        pos = rng.normal(size=(n, 3))
        quat = rng.normal(size=(n, 4))
        quat /= np.linalg.norm(quat, axis=1, keepdims=True)
        p = str(tmp_path / "t.tum")
        evaluation.save_tum(p, stamps, pos, quat)
        s2, p2, q2 = evaluation.load_tum(p)
        np.testing.assert_allclose(p2, pos, atol=1e-5)
        np.testing.assert_allclose(q2, quat, atol=1e-5)
