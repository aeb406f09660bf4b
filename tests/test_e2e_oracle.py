"""Full-pipeline f64 oracle test: the f32 JAX scan step must track the
independent NumPy float64 replica (tests/pipeline_oracle.py) stage for stage
over a whole trajectory.

The oracle consumes the EXACT packed arrays the Localizer ships to the
device (recorded via a subclass), so any disagreement isolates to the device
program — deskew, downsample, kNN/plane/gates, iterated update, insert —
not the host-side batching.
"""

import numpy as np
import pytest

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models.localizer import Localizer

import pipeline_oracle as po
from test_pipeline import small_cfg


class RecordingLocalizer(Localizer):
    """Captures the packed per-scan inputs + the initial device state via
    the stable ``Localizer.on_dispatch`` capture hook (the supported way to
    observe the exact per-scan device payload on every dispatch path)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.records = []
        self.init_snap = None
        self.on_dispatch = lambda sp, ip: self.records.append(
            (np.array(sp, copy=True), np.array(ip, copy=True)))

    def _init_device_state(self, first_stamp):
        super()._init_device_state(first_stamp)
        x = self.state.x
        self.init_snap = {
            "x": {f: np.asarray(getattr(x, f), np.float64)
                  for f in ("pos", "rot", "rot_LI", "t_LI", "vel",
                            "bg", "ba", "grav")},
            "P": np.asarray(self.state.P, np.float64),
            "last_prop_time": float(self.state.last_prop_time),
        }



def e2e_cfg(estimate_extrinsics=False):
    cfg = small_cfg()
    cfg.tpu.knn_refresh = "always"        # reference-exact re-match/iteration
    cfg.tpu.knn_neighborhood = 27
    cfg.tpu.quantize_transfer = 0.0
    # the robust dynamic-object gate is an additive divergence (no reference
    # counterpart); the oracle pins REFERENCE-EXACT matching semantics
    cfg.ikfom.mapping.DYNAMIC_GATE = 0.0
    cfg.ikfom.estimate_extrinsics = estimate_extrinsics
    return cfg


def run_pair(cfg, n_scans=40, seed=3):
    seq = synthetic.SyntheticSequence(
        seed=seed, n_scans=n_scans, points_per_scan=cfg.tpu.max_points_per_scan,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3)
    loc = RecordingLocalizer(cfg)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]
    si = 0
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < n_scans and scans[si][0] <= stamps[k]:
            st, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st)
            si += 1
    # FAIL LOUDLY if the capture hook ever disconnects from the dispatch
    # path again (round-4 regression: a transfer refactor silently broke a
    # monkey-patch-based recorder and the oracle ran on zero records)
    assert len(loc.records) == n_scans, (
        f"on_dispatch hook recorded {len(loc.records)}/{n_scans} scans — "
        "the Localizer capture hook is disconnected from the dispatch path")

    orc = po.OracleLIO(cfg, loc.init_snap["x"], loc.init_snap["P"],
                       loc.init_snap["last_prop_time"])
    oracle_out = [orc.scan_step(sp, ip) for (sp, ip) in loc.records]
    return loc, orc, oracle_out


@pytest.mark.parametrize("estimate_extrinsics", [False, True])
def test_full_pipeline_tracks_f64_oracle(estimate_extrinsics):
    """Per-scan pose agreement within an f32 tolerance budget over 40 scans
    (~55 m of travel), plus exact-ish agreement of the discrete decisions
    (match counts, map growth)."""
    cfg = e2e_cfg(estimate_extrinsics)
    n = 40
    loc, orc, oout = run_pair(cfg, n_scans=n)
    traj = loc.trajectory

    pos_err = np.array([np.linalg.norm(t["pos"] - o["pos"])
                        for t, o in zip(traj, oout)])
    quat_err = np.array([min(np.abs(t["quat"] - o["quat"]).max(),
                             np.abs(t["quat"] + o["quat"]).max())
                         for t, o in zip(traj, oout)])
    # f32 budget: sub-cm-scale per scan on a ~55 m trajectory.  The residual
    # disagreement is gate flips — borderline plane-validity decisions that
    # land differently in f32 vs f64 on the sparse early map — feeding back
    # through the correspondence set; the first two scans (map built but
    # geometry identical) agree to ~1e-5.
    budget = 3e-2 if estimate_extrinsics else 2e-2   # extr DOF: looser early
    assert pos_err[1] < 1e-4, f"scan-1 pos err {pos_err[1]:.2e}"
    assert pos_err.max() < budget, f"pos err {pos_err.round(5)}"
    assert pos_err.mean() < 8e-3, f"mean pos err {pos_err.mean():.4f}"
    assert quat_err.max() < 2e-3, f"quat err {quat_err.round(6)}"

    # discrete decisions: downsampled-count / match-count / map growth agree
    # up to rare f32-vs-f64 voxel-boundary flips
    for t, o in zip(traj, oout):
        assert abs(t["n_pc2match"] - o["n_pc2match"]) <= 0.02 * o["n_pc2match"], \
            (t["n_pc2match"], o["n_pc2match"])
    jax_map = int(loc.state.map.num_points)
    assert abs(jax_map - orc.map.num_points) <= 0.01 * orc.map.num_points, \
        (jax_map, orc.map.num_points)


def test_oracle_is_self_consistent():
    """The oracle itself must track ground truth (sanity: it is a working
    f64 LIO, not just a mirror of the JAX code)."""
    cfg = e2e_cfg(False)
    n = 25
    seq = synthetic.SyntheticSequence(
        seed=3, n_scans=n, points_per_scan=cfg.tpu.max_points_per_scan,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3)
    loc, orc, oout = run_pair(cfg, n_scans=n)
    stamps = np.array([t["stamp"] for t in loc.trajectory])
    gt = seq.traj.pos(stamps)
    est = np.array([o["pos"] for o in oout])
    ate = synthetic.ate_rmse(est, gt)
    assert ate < 0.15, f"oracle ATE {ate:.3f} m"
