"""Async ingestion (io/stream.py): the reference's AsyncSpinner callback
model — producers never block, dispatch thread drains in order, and the
result is exactly the synchronous replay (dispatch is coverage-gated, so
interleaving cannot change which IMU batch each scan consumes)."""

import threading
import time

import numpy as np

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.io.stream import AsyncIngest
from fast_limo_tpu.models.localizer import Localizer
from tests.test_pipeline import run_odometry, small_cfg


def test_async_matches_synchronous():
    n = 10
    seq = synthetic.SyntheticSequence(
        seed=3, n_scans=n, points_per_scan=4096,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3)
    sync_loc = run_odometry(small_cfg(), seq, n)
    sync_pos = sync_loc.positions()

    loc = Localizer(small_cfg())
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n)]

    with AsyncIngest(loc) as ingest:
        def imu_producer():
            for k in range(len(stamps)):
                ingest.push_imu(stamps[k], acc[k], gyro[k])
                if k % 50 == 0:
                    time.sleep(0.001)

        def scan_producer():
            for st, pts, traw in scans:
                ingest.push_scan(pts, traw, st)
                time.sleep(0.002)

        t1 = threading.Thread(target=imu_producer)
        t2 = threading.Thread(target=scan_producer)
        t1.start(); t2.start()
        t1.join(); t2.join()

    assert ingest.imu_dropped == 0
    assert len(ingest) == 0
    async_pos = loc.positions()
    assert len(async_pos) == len(sync_pos) == n
    np.testing.assert_array_equal(async_pos, sync_pos)


def test_ring_overrun_is_counted_not_fatal():
    class SlowEngine:
        def update_imu(self, *a):
            time.sleep(0.005)

        def update_pointcloud(self, *a):
            pass

    ingest = AsyncIngest(SlowEngine(), imu_capacity=8)
    for k in range(200):
        ingest.push_imu(k * 0.01, np.zeros(3), np.zeros(3))
    # either some got dropped (ring full while the consumer slept) or the
    # consumer kept up — never an exception, count always consistent
    assert ingest.imu_dropped >= 0
    ingest._stop.set()
    ingest._wake.set()
    ingest._thread.join(timeout=5.0)
