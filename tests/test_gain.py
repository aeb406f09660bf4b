"""ops/gain — the fused iEKF gain kernel vs its jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.ops import gain as gain_op


def _case(rng, n_rows=400, zero_dims=(), scale_decades=3.0, R=1e-3):
    """Build realistic sufficient statistics + a filter-like covariance."""
    col_scale = np.geomspace(1.0, 10.0 ** scale_decades, gain_op.M)
    H = rng.standard_normal((n_rows, gain_op.M)) * col_scale[None, :]
    for z in zero_dims:
        H[:, z] = 0.0
    r = rng.standard_normal(n_rows) * 0.1
    HTH = H.T @ H
    HTh = H.T @ r
    # covariance: SPD with decades of spread + slight asymmetry (like f32 P)
    Q = rng.standard_normal((gain_op.NS, gain_op.NS))
    P = Q @ Q.T * 1e-4 + np.diag(
        np.geomspace(1e-6, 1.0, gain_op.NS))
    P = P + rng.standard_normal((gain_op.NS, gain_op.NS)) * 1e-9
    return (jnp.asarray(HTH, jnp.float32), jnp.asarray(HTh, jnp.float32),
            jnp.asarray(P, jnp.float32), R)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _compare(case, err_ratio=12.0, floor=2e-5):
    """Kernel error vs f64 truth must be comparable to the f32 LAPACK path's
    (both are f32 algorithms with different rounding; neither is 'exact')."""
    HTH, HTh, P, R = case
    K64 = gain_op.gain_reference(
        jnp.asarray(HTH, jnp.float64), jnp.asarray(HTh, jnp.float64),
        jnp.asarray(P, jnp.float64), R)
    K32 = gain_op.gain_reference(HTH, HTh, P, R)
    Kk = gain_op.gain_tpu(HTH, HTh, P, R, interpret=True)

    for part, (t64, t32, tk) in enumerate(zip(K64, K32, Kk)):
        t64, t32, tk = map(np.asarray, (t64, t32, tk))
        s = np.max(np.abs(t64)) + 1e-12
        e32 = np.max(np.abs(t32 - t64)) / s
        ek = np.max(np.abs(tk - t64)) / s
        assert ek <= err_ratio * e32 + floor, \
            f"part {part}: kernel err {ek:.2e} vs lapack err {e32:.2e}"


def test_full_rank(rng):
    _compare(_case(rng))


def test_zero_extrinsic_dims(rng):
    """estimate_extrinsics=False: columns 6..12 exactly zero."""
    _compare(_case(rng, zero_dims=range(6, 12)))


def test_all_zero_measurements(rng):
    HTH = jnp.zeros((gain_op.M, gain_op.M), jnp.float32)
    HTh = jnp.zeros((gain_op.M,), jnp.float32)
    P = jnp.asarray(np.diag(np.geomspace(1e-6, 1.0, gain_op.NS)), jnp.float32)
    Kx, Kh, K = gain_op.gain_tpu(HTH, HTh, P, 1e-3, interpret=True)
    assert np.all(np.asarray(Kx) == 0)
    assert np.all(np.asarray(Kh) == 0)
    assert np.all(np.asarray(K) == 0)


def test_wide_dynamic_range(rng):
    _compare(_case(rng, scale_decades=4.5))


def test_dispatch_runs(rng):
    """gain() picks a path and returns finite values on this backend."""
    HTH, HTh, P, R = _case(rng)
    Kx, Kh, K = gain_op.gain(HTH, HTh, P, R)
    assert np.all(np.isfinite(np.asarray(Kx)))
    assert np.all(np.isfinite(np.asarray(Kh)))
    assert np.all(np.isfinite(np.asarray(K)))


def test_e2e_trajectory_with_kernel_math(monkeypatch):
    """Full 25-scan odometry with the PALLAS gain math (interpret mode):
    the kernel's Gauss-Jordan rounding must not drift the filter."""
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline import small_cfg, run_odometry
    from fast_limo_tpu.io import synthetic

    monkeypatch.setattr(
        gain_op, "gain",
        lambda HTH, HTh, P, R: gain_op.gain_tpu(
            HTH.astype(jnp.float32), HTh.astype(jnp.float32),
            P.astype(jnp.float32), R, interpret=True))

    seq = synthetic.SyntheticSequence(
        seed=3, n_scans=25, points_per_scan=4096,
        noise_pt=0.01, noise_gyro=5e-4, noise_acc=5e-3)
    cfg = small_cfg()
    cfg.ikfom.estimate_extrinsics = True   # the numerically hardest config
    loc = run_odometry(cfg, seq, 20)
    est = loc.positions()
    gt = seq.traj.pos(loc.stamps())
    err = np.linalg.norm(est - gt, axis=1)
    assert err[-1] < 0.3, f"final error {err[-1]:.3f} m (errs={err.round(3)})"
