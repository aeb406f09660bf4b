"""CLI surface (the reference's ROS-node analog, src/main.cpp): the --async
ingestion path must reproduce the synchronous replay exactly — dispatch is
coverage-gated, so producer/consumer interleaving cannot change which IMU
batch each scan consumes."""

import numpy as np
import pytest

from fast_limo_tpu import cli


@pytest.mark.slow
def test_cli_async_matches_sync(tmp_path):
    out_s = str(tmp_path / "sync.tum")
    out_a = str(tmp_path / "async.tum")
    cli.main(["synthetic", "--scans", "6", "--no-loop", "--out", out_s])
    cli.main(["synthetic", "--scans", "6", "--no-loop", "--async",
              "--out", out_a])
    s = np.loadtxt(out_s)
    a = np.loadtxt(out_a)
    assert s.shape == a.shape == (6, 8)
    np.testing.assert_array_equal(a, s)
