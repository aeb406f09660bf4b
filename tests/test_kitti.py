"""KITTI raw reader on generated fixture files."""

import os

import numpy as np
import pytest

from fast_limo_tpu.io import kitti


def make_drive(tmp_path, n_scans=3, n_imu=12):
    root = tmp_path / "drive"
    (root / "velodyne_points" / "data").mkdir(parents=True)
    (root / "oxts" / "data").mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = "2011-09-26 13:02:{:02d}.{:09d}"

    with open(root / "velodyne_points" / "timestamps.txt", "w") as f:
        for i in range(n_scans):
            f.write(base.format(25 + i // 10, int((i % 10) * 1e8)) + "\n")
            pts = rng.normal(size=(100, 4)).astype(np.float32)
            pts.tofile(root / "velodyne_points" / "data" / f"{i:010d}.bin")

    with open(root / "oxts" / "timestamps.txt", "w") as f:
        for i in range(n_imu):
            f.write(base.format(25 + i // 100, int((i % 100) * 1e7)) + "\n")
            row = np.zeros(30)
            row[14:17] = [0.1, 0.0, 9.81]
            row[20:23] = [0.0, 0.0, 0.01 * i]
            np.savetxt(root / "oxts" / "data" / f"{i:010d}.txt", row[None])
    return str(root)


class TestKittiDrive:
    def test_load_and_stream(self, tmp_path):
        d = kitti.KittiDrive(make_drive(tmp_path))
        assert len(d) == 3
        stamp, xyz, t_rel = d.scan(0)
        assert xyz.shape[1] == 3
        assert np.all((t_rel >= 0) & (t_rel <= 0.1))
        stamp_i, acc, gyro = d.imu(5)
        np.testing.assert_allclose(acc, [0.1, 0.0, 9.81])
        np.testing.assert_allclose(gyro, [0.0, 0.0, 0.05])

        kinds = list(d.stream())
        assert len(kinds) == 15
        # stream is time-ordered
        stamps = []
        for kind, i in kinds:
            stamps.append(d.imu_stamps[i] if kind == "imu" else d.scan_stamps[i])
        assert all(a <= b for a, b in zip(stamps, stamps[1:]))

    def test_timestamps_parse(self, tmp_path):
        d = kitti.KittiDrive(make_drive(tmp_path))
        # float64 epoch seconds: ~1e-7 resolution at 1.3e9
        assert d.imu_stamps[1] - d.imu_stamps[0] == pytest.approx(0.01, abs=1e-6)
