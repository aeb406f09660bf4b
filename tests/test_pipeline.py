"""End-to-end odometry on the synthetic world: trajectory recovery."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models.localizer import Localizer
from fast_limo_tpu.utils.config import Config


def small_cfg() -> Config:
    cfg = Config()
    cfg.sensor_type = 1               # velodyne-style relative seconds
    cfg.gravity_align = False
    cfg.calibrate_accel = False
    cfg.calibrate_gyro = False
    cfg.time_offset = False
    cfg.end_of_sweep = False
    cfg.debug = cfg.verbose = False
    cfg.intrinsics.accel_bias = [0.0, 0.0, 0.0]
    cfg.intrinsics.gyro_bias = [0.0, 0.0, 0.0]
    cfg.filters.crop_active = True
    cfg.filters.dist_active = True
    cfg.filters.min_dist = 1.5
    cfg.filters.voxel_active = True
    cfg.filters.leafSize = [0.5, 0.5, 0.5]
    cfg.ikfom.estimate_extrinsics = False
    cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 4096
    cfg.ikfom.mapping.MAX_NUM_MATCHES = 4096
    cfg.ikfom.mapping.octree.min_extent = 0.25   # map voxel 0.5
    cfg.tpu.max_points_per_scan = 4096
    cfg.tpu.map_capacity = 2 ** 16
    cfg.tpu.map_points_per_voxel = 2
    cfg.tpu.imu_batch = 32
    cfg.tpu.hash_probes = 16
    return cfg


@pytest.fixture(scope="module")
def seq():
    return synthetic.SyntheticSequence(
        seed=3, n_scans=25, points_per_scan=4096,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3)


def run_odometry(cfg, seq, n_scans):
    loc = Localizer(cfg)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]
    si = 0
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < n_scans and scans[si][0] <= stamps[k]:
            st, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st)
            si += 1
    return loc


class TestEndToEnd:
    def test_trajectory_recovery(self, seq):
        cfg = small_cfg()
        n = 25
        loc = run_odometry(cfg, seq, n)
        assert len(loc.trajectory) == n

        est = loc.positions()
        ts = loc.stamps()
        gt = seq.traj.pos(ts)
        err = np.linalg.norm(est - gt, axis=1)
        # distance travelled ~ 8 m/s * 2.5 s = 20 m; demand sub-1% drift-scale err
        assert err[-1] < 0.25, f"final error {err[-1]:.3f} m (errs={err.round(3)})"
        ate = synthetic.ate_rmse(est, gt)
        assert ate < 0.15, f"ATE {ate:.3f} m"

    def test_matches_found_after_first_scan(self, seq):
        cfg = small_cfg()
        loc = run_odometry(cfg, seq, 4)
        assert loc.trajectory[1]["n_pc2match"] > 200
        assert int(loc.state.map.num_points) > 1000

    def test_covariance_stays_finite_spd(self, seq):
        cfg = small_cfg()
        loc = run_odometry(cfg, seq, 6)
        P = np.asarray(loc.state.P)
        assert np.all(np.isfinite(P))
        assert np.all(np.linalg.eigvalsh((P + P.T) / 2) > -1e-6)
