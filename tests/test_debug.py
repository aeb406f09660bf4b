"""cfg.debug-gated output surface (src/main.cpp:198-203, ROSutils.hpp:216-252).

The reference, with ``debug: true``, additionally publishes the original
(pre-deskew) cloud, the deskewed cloud, and per-match marker data.  Here the
same intermediates ride the jitted ScanOutput as a ``DebugOutput`` subtree —
present only when ``cfg.debug`` is set, at literally zero cost otherwise
(the flag gates at trace time, so the debug-off program never contains them).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.io import synthetic
from fast_limo_tpu.models import pipeline as pl
from tests.test_pipeline import run_odometry, small_cfg


def _seq(n=6):
    return synthetic.SyntheticSequence(
        seed=5, n_scans=n, points_per_scan=4096,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3)


def test_debug_off_has_no_debug_and_no_cost():
    cfg_off, cfg_on = small_cfg(), small_cfg()
    cfg_on.debug = True

    step_off = pl.build_scan_step(cfg_off, donate=False, jit=False)
    step_on = pl.build_scan_step(cfg_on, donate=False, jit=False)
    s = pl.init_state(cfg_off)
    N, K = cfg_off.tpu.max_points_per_scan, cfg_off.tpu.imu_batch
    rng = np.random.default_rng(0)
    b = pl.ScanBatch(
        points=jnp.asarray(rng.uniform(-20, 20, (N, 3)), jnp.float32),
        t_raw=jnp.asarray(rng.uniform(0, 0.1, N), jnp.float32),
        valid=jnp.ones(N, bool),
        stamp=jnp.asarray(0.0, jnp.float32),
        epoch_shift=jnp.asarray(0.1, jnp.float32),
        imu_acc=jnp.asarray(rng.normal(0, 0.1, (K, 3)) + [0, 0, 9.81], jnp.float32),
        imu_gyro=jnp.asarray(rng.normal(0, 0.01, (K, 3)), jnp.float32),
        imu_stamp=jnp.asarray(np.linspace(0.01, 0.105, K), jnp.float32),
        imu_valid=jnp.ones(K, bool),
    )

    jaxpr_off = jax.make_jaxpr(step_off)(s, b)
    jaxpr_on = jax.make_jaxpr(step_on)(s, b)
    # debug-off: no DebugOutput subtree, strictly smaller program
    _, out_off = step_off(s, b)
    assert out_off.debug is None
    assert len(jaxpr_off.jaxpr.eqns) < len(jaxpr_on.jaxpr.eqns)

    # the debug plumbing must not perturb the estimate: identical state math
    s_off, o_off = step_off(s, b)
    s_on, o_on = step_on(s, b)
    np.testing.assert_array_equal(np.asarray(o_off.pos), np.asarray(o_on.pos))
    np.testing.assert_array_equal(np.asarray(o_off.quat), np.asarray(o_on.quat))
    np.testing.assert_array_equal(np.asarray(s_off.P), np.asarray(s_on.P))


def test_debug_surface_contents():
    cfg = small_cfg()
    cfg.debug = True
    n = 5
    loc = run_odometry(cfg, _seq(n), n)
    dbg = loc.last_output.debug
    assert dbg is not None
    N = cfg.tpu.max_points_per_scan
    Q = cfg.ikfom.mapping.MAX_NUM_PC2MATCH

    assert dbg.orig_points.shape == (N, 3)
    assert dbg.deskewed.shape == (N, 3)
    assert dbg.match_planes.shape == (Q, 4)
    assert dbg.match_keep.shape == (Q,)
    assert dbg.match_dist.shape == (Q,)

    # degeneracy-guard telemetry (round-4 semantics): gersh_min is a real
    # finite conditioning scalar; guard_fired is the EXACT min-eigenvalue
    # < D predicate (ADVICE r3: the Gershgorin bound fires on ordinary
    # geometry and carries no guard signal)
    g = float(dbg.gersh_min)
    assert np.isfinite(g)
    me = float(dbg.min_eig)
    assert me >= g - 1e-3 * max(1.0, abs(g))   # eig ≥ its Gershgorin bound
    assert bool(dbg.guard_fired) == (me < cfg.ikfom.degeneracy_thresh)
    # well-constrained synthetic geometry: the guard must NOT fire
    assert not bool(dbg.guard_fired)

    keep = np.asarray(dbg.match_keep)
    n_keep = int(keep.sum())
    # matches exist and agree with the scan's reported match count bound
    assert 0 < n_keep <= int(loc.trajectory[-1]["n_pc2match"])
    # kept matches: unit-ish normals and small point-to-plane distances
    planes = np.asarray(dbg.match_planes)[keep]
    dist = np.asarray(dbg.match_dist)[keep]
    np.testing.assert_allclose(np.linalg.norm(planes[:, :3], axis=1), 1.0,
                               atol=1e-3)
    assert np.all(np.isfinite(dist))
    assert np.percentile(np.abs(dist), 95) < 0.5  # converged residuals

    # deskewed cloud is a rigid-ish correction of the original: same count,
    # displacements bounded by motion over one sweep
    ov = np.asarray(dbg.orig_valid)
    dv = np.asarray(dbg.deskewed_valid)
    np.testing.assert_array_equal(ov, dv)
    disp = np.linalg.norm(
        np.asarray(dbg.deskewed)[ov] - np.asarray(dbg.orig_points)[ov], axis=1)
    assert np.max(disp) < 5.0
