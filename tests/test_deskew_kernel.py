"""ops/deskew_kernel — the fused deskew launch vs the jnp reference chain
(models/deskew.deskew), including the searchsorted frame-selection
semantics (rightmost frame at ties, left clip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.models import deskew as dsk
from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import deskew_kernel, s2, so3


@pytest.fixture
def rng():
    return np.random.default_rng(9)


def _frames(rng, K=17, n_valid=None):
    n_valid = K if n_valid is None else n_valid
    times = np.sort(rng.uniform(0.0, 0.1, K)).astype(np.float32)
    q = rng.standard_normal((K, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    valid = np.arange(K) < n_valid
    return dsk.Frames(
        time=jnp.asarray(times),
        pos=jnp.asarray(rng.uniform(-5, 5, (K, 3)), jnp.float32),
        rot=jnp.asarray(q),
        vel=jnp.asarray(rng.uniform(-2, 2, (K, 3)), jnp.float32),
        bg=jnp.asarray(rng.normal(0, 0.01, (K, 3)), jnp.float32),
        ba=jnp.asarray(rng.normal(0, 0.05, (K, 3)), jnp.float32),
        grav=jnp.broadcast_to(jnp.asarray([0, 0, -9.81], jnp.float32), (K, 3)),
        w=jnp.asarray(rng.normal(0, 0.3, (K, 3)), jnp.float32),
        a=jnp.asarray(rng.normal(0, 1.0, (K, 3)) + [0, 0, 9.81], jnp.float32),
        valid=jnp.asarray(valid),
    )


def _case(rng, N=1000, K=17, n_valid=None):
    frames = _frames(rng, K, n_valid)
    pts = jnp.asarray(rng.uniform(-30, 30, (N, 3)), jnp.float32)
    # point times spanning before/inside/after the frame window, plus exact
    # frame-time ties (the searchsorted rightmost-of-equal edge)
    t = rng.uniform(-0.01, 0.12, N).astype(np.float32)
    t[:K] = np.asarray(frames.time)        # exact ties
    valid = jnp.asarray(rng.random(N) < 0.9)
    q_ext = so3.quat_normalize(jnp.asarray([1.0, 0.02, -0.01, 0.03], jnp.float32))
    t_ext = jnp.asarray([0.1, -0.05, 0.2], jnp.float32)
    x_last = st.identity(jnp.float32)._replace(
        rot=so3.quat_normalize(jnp.asarray(rng.standard_normal(4), jnp.float32)),
        pos=jnp.asarray(rng.uniform(-5, 5, 3), jnp.float32),
        grav=s2.project(jnp.asarray([0, 0, -9.81], jnp.float32)))
    return pts, jnp.asarray(t), valid, frames, x_last, q_ext, t_ext


def _compare(case):
    pts, t, valid, frames, x_last, q_ext, t_ext = case
    want_xt2, want_w = dsk.deskew(pts, t, valid, frames, x_last, q_ext, t_ext)
    got_xt2, got_w = deskew_kernel.deskew_tpu(
        pts, t, valid, frames, x_last.rot, x_last.pos, q_ext, t_ext,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_xt2), np.asarray(want_xt2),
                               rtol=1e-4, atol=2e-4)


def test_matches_jnp_deskew(rng):
    _compare(_case(rng))


def test_matches_with_invalid_frame_tail(rng):
    _compare(_case(rng, K=33, n_valid=12))


def test_matches_unpadded_lane_multiple(rng):
    _compare(_case(rng, N=1280))


def test_regressed_frame_time_no_double_select(rng):
    """A regressed IMU stamp (imu_to_baselink's dt clamp anticipates them)
    must not let a point satisfy two interval masks and double-accumulate
    frame parameters: the kernel cummax-es the times, making the regressed
    frame an empty interval — equal to the jnp path on cummax'd times."""
    pts, t, valid, frames, x_last, q_ext, t_ext = _case(rng, N=512, K=17)
    times = np.array(frames.time)
    times[5] = times[2] - 0.005        # regression mid-buffer
    frames_bad = frames._replace(time=jnp.asarray(times))
    got_xt2, _ = deskew_kernel.deskew_tpu(
        pts, t, valid, frames_bad, x_last.rot, x_last.pos, q_ext, t_ext,
        interpret=True)
    assert np.isfinite(np.asarray(got_xt2)).all()
    frames_mono = frames._replace(
        time=jnp.asarray(np.maximum.accumulate(times)))
    want_xt2, _ = dsk.deskew(pts, t, valid, frames_mono, x_last, q_ext, t_ext)
    np.testing.assert_allclose(np.asarray(got_xt2), np.asarray(want_xt2),
                               rtol=1e-4, atol=2e-4)


def test_nan_inputs_on_invalid_lanes_stay_masked(rng):
    """Raw sensor NaN points are masked invalid (not removed) by
    preprocess; the kernel must not leak NaN through its masking."""
    pts, t, valid, frames, x_last, q_ext, t_ext = _case(rng)
    pts = np.array(pts)
    valid = np.array(valid)
    bad = np.zeros(len(pts), bool)
    bad[::17] = True
    pts[bad] = np.nan
    t = np.array(t)
    t[bad[: len(t)]] = np.nan
    valid = valid & ~bad
    got_xt2, got_w = deskew_kernel.deskew_tpu(
        jnp.asarray(pts), jnp.asarray(t), jnp.asarray(valid), frames,
        x_last.rot, x_last.pos, q_ext, t_ext, interpret=True)
    assert np.isfinite(np.asarray(got_xt2)).all()
    assert np.isfinite(np.asarray(got_w)).all()
    want_xt2, _ = dsk.deskew(jnp.asarray(pts), jnp.asarray(t),
                             jnp.asarray(valid), frames, x_last, q_ext, t_ext)
    np.testing.assert_allclose(np.asarray(got_xt2), np.asarray(want_xt2),
                               rtol=1e-4, atol=2e-4)
