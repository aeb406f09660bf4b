"""ops/hstats — fused measurement-statistics kernel vs the jnp h_rows path."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import hstats, s2, so3


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _case(rng, N=1000, keep_frac=0.7):
    f32 = jnp.float32
    pc = jnp.asarray(rng.standard_normal((N, 3)) * 20, f32)
    n = rng.standard_normal((N, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n_abcd = jnp.asarray(
        np.concatenate([n, rng.standard_normal((N, 1))], 1), f32)
    keep = jnp.asarray(rng.random(N) < keep_frac)
    x = st.NavState(
        pos=jnp.asarray(rng.standard_normal(3) * 5, f32),
        rot=so3.quat_normalize(jnp.asarray(rng.standard_normal(4), f32)),
        rot_LI=so3.quat_normalize(
            jnp.asarray([1.0, 0.01, -0.02, 0.005], f32)),
        t_LI=jnp.asarray([0.1, -0.05, 0.2], f32),
        vel=jnp.zeros(3, f32), bg=jnp.zeros(3, f32), ba=jnp.zeros(3, f32),
        grav=s2.project(jnp.asarray([0.0, 0.0, -9.81], f32)))
    return pc, n_abcd, keep, x


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / (np.abs(a).max() + 1e-12)


@pytest.mark.parametrize("ee", [True, False])
def test_kernel_matches_reference(rng, ee):
    pc, n_abcd, keep, x = _case(rng)
    r_HTH, r_HTh = hstats.hstats_reference(pc, n_abcd, keep, x, ee)
    X = hstats.pack_inputs(pc, n_abcd, keep)
    k_HTH, k_HTh = hstats.hstats_tpu(
        X, hstats.pack_scalars(x), estimate_extrinsics=ee, interpret=True)
    assert _rel(r_HTH, k_HTH) < 2e-5
    assert _rel(r_HTh, k_HTh) < 2e-5
    if not ee:
        # extrinsic blocks exactly zero in both
        assert np.all(np.asarray(k_HTH)[6:, :] == 0)
        assert np.all(np.asarray(k_HTh)[6:] == 0)


def test_padding_inert(rng):
    """pack_inputs pads N to a multiple of 128 with keep=0 — padded rows
    must contribute nothing."""
    pc, n_abcd, keep, x = _case(rng, N=1000)   # pads to 1024
    X = hstats.pack_inputs(pc, n_abcd, keep)
    assert X.shape == (8 * 8, 128)
    pc2 = jnp.concatenate([pc, jnp.ones((24, 3), jnp.float32) * 1e3])
    n2 = jnp.concatenate([n_abcd, jnp.ones((24, 4), jnp.float32)])
    k2 = jnp.concatenate([keep, jnp.zeros(24, bool)])
    X2 = hstats.pack_inputs(pc2, n2, k2)
    a = hstats.hstats_tpu(X, hstats.pack_scalars(x),
                          estimate_extrinsics=True, interpret=True)
    b = hstats.hstats_tpu(X2, hstats.pack_scalars(x),
                          estimate_extrinsics=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-6)


def test_reference_matches_measurement_module(rng):
    """hstats_reference IS the measurement-module math (same H, h)."""
    from fast_limo_tpu.models import measurement  # noqa: F401  (parity anchor)

    pc, n_abcd, keep, x = _case(rng, N=500)
    HTH, HTh = hstats.hstats_reference(pc, n_abcd, keep, x, True)
    # rebuild from explicit rows
    glob = so3.quat_rotate(x.rot, pc) + x.pos
    dist = jnp.sum(n_abcd[:, :3] * glob, axis=-1) + n_abcd[:, 3]
    n = n_abcd[:, :3]
    Rinv = so3.quat_to_mat(so3.quat_conj(x.rot))
    C = n @ Rinv.T
    A = jnp.cross(pc, C)
    RLIinv = so3.quat_to_mat(so3.quat_conj(x.rot_LI))
    p_lidar = (pc - x.t_LI) @ RLIinv.T
    B = jnp.cross(p_lidar, C @ RLIinv.T)
    H = jnp.where(keep[:, None], jnp.concatenate([n, A, B, C], -1), 0.0)
    h = jnp.where(keep, -dist, 0.0)
    np.testing.assert_allclose(np.asarray(HTH), np.asarray(H.T @ H), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(HTh), np.asarray(H.T @ h), rtol=1e-5)
