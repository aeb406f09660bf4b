"""Batched multi-session (fleet) scan step: vmap equivalence + idle masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models import pipeline as pl
from fast_limo_tpu.models.localizer import Localizer
from fast_limo_tpu.parallel import batched

from test_pipeline import small_cfg


def _make_batches(cfg, seed, n_scans):
    """Run a Localizer over a synthetic sequence, capturing its ScanBatches."""
    seq = synthetic.SyntheticSequence(
        seed=seed, n_scans=n_scans, points_per_scan=cfg.tpu.max_points_per_scan,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3,
        traj=synthetic.Trajectory(v_forward=5.0, yaw_amp=0.3))
    loc = Localizer(cfg)
    captured = []
    N, K = cfg.tpu.max_points_per_scan, cfg.tpu.imu_batch

    def on_dispatch(scan_pack, imu_pack):
        # rebuild the logical ScanBatch from the stable capture hook's
        # (N,4)/(K,8) host packs (layout: build_scan_step_packed docstring)
        sp = np.array(scan_pack, np.float32, copy=True)
        ip = np.array(imu_pack, np.float32, copy=True)
        captured.append(pl.ScanBatch(
            points=jnp.asarray(sp[:, :3]), t_raw=jnp.asarray(sp[:, 3]),
            valid=jnp.arange(N) < int(ip[0, 7]),
            stamp=jnp.zeros((), jnp.float32),
            epoch_shift=jnp.asarray(ip[2, 7]),
            imu_acc=jnp.asarray(ip[:, 0:3]), imu_gyro=jnp.asarray(ip[:, 3:6]),
            imu_stamp=jnp.asarray(ip[:, 6]),
            imu_valid=jnp.arange(K) < int(ip[1, 7])))

    loc.on_dispatch = on_dispatch
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_scans)]
    si = 0
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < n_scans and scans[si][0] <= stamps[k]:
            st, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st)
            si += 1
    assert len(captured) == n_scans, (
        f"on_dispatch hook recorded {len(captured)}/{n_scans} scans — "
        "the Localizer capture hook is disconnected from the dispatch path")
    return captured, loc


class TestBatched:
    def test_matches_single_session(self):
        cfg = small_cfg()
        cfg.tpu.max_points_per_scan = 2048
        cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 2048
        n = 4
        batches_a, loc_a = _make_batches(cfg, seed=3, n_scans=n)
        batches_b, loc_b = _make_batches(cfg, seed=9, n_scans=n)
        assert len(batches_a) == len(batches_b) == n

        # both the batched fleet and the single-session references start
        # from pl.init_state over the SAME captured batches, so the vmapped
        # path must reproduce each session's trajectory (vmap changes XLA
        # fusion → f32 rounding, which the iterated filter amplifies to the
        # several-cm level over a few scans; equivalence is at trajectory
        # tolerance, not bitwise).
        step = batched.build_batched_scan_step(cfg, donate=False)
        states = batched.init_batched_state(cfg, 2)
        active = jnp.ones(2, bool)
        poss = []
        for k in range(n):
            bb = batched.stack_batches([batches_a[k], batches_b[k]])
            states, outs = step(states, bb, active)
            poss.append(np.asarray(outs.pos))
        poss = np.stack(poss)  # (n, 2, 3)

        # reference: single-session jitted steps over the same batches
        inner = pl.build_scan_step(cfg, donate=False)
        for idx, batches in enumerate((batches_a, batches_b)):
            s = pl.init_state(cfg)
            for k in range(n):
                s, out = inner(s, batches[k])
                np.testing.assert_allclose(
                    poss[k, idx], np.asarray(out.pos), rtol=0, atol=0.15)

    def test_inactive_session_state_frozen(self):
        cfg = small_cfg()
        cfg.tpu.max_points_per_scan = 2048
        cfg.ikfom.mapping.MAX_NUM_PC2MATCH = 2048
        batches, _ = _make_batches(cfg, seed=3, n_scans=2)

        step = batched.build_batched_scan_step(cfg, donate=False)
        states = batched.init_batched_state(cfg, 2)
        noop = batched.noop_batch(cfg)
        bb = batched.stack_batches([batches[0], noop])
        states2, _ = step(states, bb, jnp.asarray([True, False]))

        # session 1 must be bit-identical to its initial state
        s1_before = batched.select_session(states, 1)
        s1_after = batched.select_session(states2, 1)
        for a, b in zip(jax.tree_util.tree_leaves(s1_before),
                        jax.tree_util.tree_leaves(s1_after)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # session 0 must have moved (map grew)
        s0_after = batched.select_session(states2, 0)
        assert int(s0_after.map.num_points) > 0
