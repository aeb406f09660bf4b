"""True multi-HOST evidence: 2 `jax.distributed` processes × 4 virtual CPU
devices forming ONE 8-device mesh (SURVEY.md §4's prescribed CI topology for
N≥2-host logic).  Process-spanning meshes exercise code single-process
meshes never touch — distributed init, cross-process (Gloo) collectives
inside the sharded scan step, and sharded checkpoint save/restore across the
process boundary — so equality against the single-process 8-device mesh is
the strongest multi-host correctness statement available without a pod."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

import __graft_entry__ as ge

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(tmp_path, n_procs=2, local_devices=4, scans=3,
                   timeout=600):
    port = _free_port()
    out = str(tmp_path / "dist_out.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(n_procs):
        worker = os.path.join(REPO, "fast_limo_tpu", "parallel",
                              "_dist_worker.py")
        procs.append(subprocess.Popen(
            [sys.executable, worker,
             "--process-id", str(pid), "--num-processes", str(n_procs),
             "--port", str(port), "--local-devices", str(local_devices),
             "--scans", str(scans), "--out", out],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{logs[i][-4000:]}")
    return np.load(out), logs


@needs_devices
@pytest.mark.slow
class TestMultiProcessMesh:
    def test_two_process_mesh_matches_single_process(self, tmp_path):
        scans = 3
        data, logs = _spawn_workers(tmp_path, scans=scans)
        assert int(data["n_processes"]) == 2
        assert int(data["n_devices"]) == 8
        # the workers' own cross-process checkpoint roundtrip must hold
        assert bool(data["roundtrip_ok"]), logs[0][-2000:]
        assert bool(data["ok_2d"]), logs[0][-2000:]

        # single-PROCESS 8-device mesh, same config and batches
        from fast_limo_tpu.parallel import sharded

        mesh = sharded.make_mesh(8)
        cfg = ge._tiny_cfg(n_pts=512, map_cap=1024, n_shards=8)
        step, state = sharded.build_sharded_scan_step(cfg, mesh)
        positions = []
        for i in range(scans):
            state, out = step(state, ge._example_batch(cfg, seed=i))
            positions.append(np.asarray(out.pos))
        state, out = step(state, ge._example_batch(cfg, seed=999))

        # cross-process Gloo collectives may reassociate reductions, so
        # allow f32 noise; the trajectories must agree to far below any
        # physical tolerance
        np.testing.assert_allclose(
            data["positions"], np.stack(positions), atol=1e-5)
        np.testing.assert_allclose(
            data["final_pos"], np.asarray(out.pos), atol=1e-5)
        assert int(data["num_points"]) == int(state.map.num_points)
