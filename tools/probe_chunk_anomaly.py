"""Instrumented replay for the scan_chunk anomaly (ROADMAP lever: chunked
dispatch measured 78 scans/s first epoch then ~40 steady-state).

Replays the bench stream with a chosen chunk size and reports, per epoch:
  * wall scans/s,
  * host time inside _pack_scan (numpy packing),
  * host time inside jnp.asarray (transfer enqueue),
  * host time inside the jitted call (dispatch enqueue),
  * blocking time at the epoch mark (device/transfer backlog).

Usage:  tools/tpu_run.sh 1200 python tools/probe_chunk_anomaly.py [chunk]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from fast_limo_tpu.io import synthetic  # noqa: E402
from fast_limo_tpu.models.localizer import Localizer  # noqa: E402


class InstrumentedLocalizer(Localizer):
    """Times the three host phases of each chunk dispatch."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.t_pack = 0.0
        self.t_transfer = 0.0
        self.t_call = 0.0
        self.n_calls = 0

    def _dispatch_chunk(self, scans):
        cfg = self.cfg
        if self.state is None:
            self._init_device_state(scans[0].stamp)
        elif self.epoch is None:
            self._anchor_epoch(scans[0].stamp)
        C = self.chunk
        N = cfg.tpu.max_points_per_scan
        K = cfg.tpu.imu_batch
        sdtype = np.int16 if cfg.tpu.quantize_transfer > 0 else np.float32
        t0 = time.perf_counter()
        scan_packs = np.zeros((C, N, 4), sdtype)
        imu_packs = np.zeros((C, K, 8), np.float32)
        epochs = []
        for i, scan in enumerate(scans):
            scan_packs[i], imu_packs[i] = self._pack_scan(scan)
            epochs.append(self.epoch)
        t1 = time.perf_counter()
        sp = jnp.asarray(scan_packs)
        ip = jnp.asarray(imu_packs)
        t2 = time.perf_counter()
        self.state, out = self.scan_step(self.state, sp, ip)
        t3 = time.perf_counter()
        self.t_pack += t1 - t0
        self.t_transfer += t2 - t1
        self.t_call += t3 - t2
        self.n_calls += 1
        self.last_output = out
        self._raw_outputs.append((tuple(epochs), out))
        self._bound_retention()

    def _dispatch(self, scan):
        t0 = time.perf_counter()
        scan_pack, imu_pack = None, None
        if self.state is None:
            self._init_device_state(scan.stamp)
        scan_pack, imu_pack = self._pack_scan(scan)
        t1 = time.perf_counter()
        sp = jnp.asarray(scan_pack)
        ip = jnp.asarray(imu_pack)
        t2 = time.perf_counter()
        self.state, out = self.scan_step(self.state, sp, ip)
        t3 = time.perf_counter()
        self.t_pack += t1 - t0
        self.t_transfer += t2 - t1
        self.t_call += t3 - t2
        self.n_calls += 1
        self.last_output = out
        self._raw_outputs.append((self.epoch, out))
        self._bound_retention()


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_warm, n_epochs, epoch_len = 8, 12, 32
    n_scans = n_warm + n_epochs * epoch_len
    cfg = bench.kitti_like_cfg()
    cfg.tpu.scan_chunk = chunk
    # long probe (392 scans ≈ 580 m at 15 m/s): needs a longer world than
    # the default 400 m corridor
    seq = synthetic.SyntheticSequence(
        seed=7, n_scans=n_scans, points_per_scan=32768,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3,
        traj=synthetic.Trajectory(v_forward=15.0, yaw_amp=0.5),
        world=synthetic.build_world(7, extent=700.0, n_wall_pts=260_000,
                                    n_ground_pts=260_000))
    loc = InstrumentedLocalizer(cfg)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]

    si = 0
    marks = []
    phase = []  # (pack, transfer, call) cumulative at each mark
    block_ms = []
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < n_scans and scans[si][0] <= stamps[k]:
            st_, pts, traw = scans[si]
            if si >= n_warm and (si - n_warm) % epoch_len == 0:
                tb = time.perf_counter()
                jax.block_until_ready(loc.state)
                block_ms.append(1000 * (time.perf_counter() - tb))
                marks.append(time.perf_counter())
                phase.append((loc.t_pack, loc.t_transfer, loc.t_call))
            loc.update_pointcloud(pts, traw, st_)
            si += 1
    loc.flush()
    tb = time.perf_counter()
    jax.block_until_ready(loc.state)
    block_ms.append(1000 * (time.perf_counter() - tb))
    marks.append(time.perf_counter())
    phase.append((loc.t_pack, loc.t_transfer, loc.t_call))

    print(f"chunk={chunk} calls={loc.n_calls} device={jax.devices()[0]}")
    print("epoch scans/s | pack ms | xfer ms | call ms | block@mark ms (per scan)")
    for i in range(len(marks) - 1):
        dt = marks[i + 1] - marks[i]
        dp = [(phase[i + 1][j] - phase[i][j]) * 1000 / epoch_len
              for j in range(3)]
        print(f"  {epoch_len / dt:6.1f}     | {dp[0]:5.2f}   | {dp[1]:5.2f}  "
              f"| {dp[2]:5.2f}   | {block_ms[i + 1] / epoch_len:6.2f}")


if __name__ == "__main__":
    main()
