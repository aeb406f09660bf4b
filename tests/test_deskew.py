"""Deskew: vectorized searchsorted + forward integration vs analytic motion."""

import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.models import deskew as dsk
from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import so3


def make_frames(times, poses, vels, ws, accs, grav):
    K = len(times)
    return dsk.Frames(
        time=jnp.asarray(times),
        pos=jnp.asarray([p for p, q in poses]),
        rot=jnp.asarray([q for p, q in poses]),
        vel=jnp.asarray(vels),
        bg=jnp.zeros((K, 3)),
        ba=jnp.zeros((K, 3)),
        grav=jnp.broadcast_to(jnp.asarray(grav), (K, 3)),
        w=jnp.asarray(ws),
        a=jnp.asarray(accs),
        valid=jnp.ones(K, bool),
    )


def ident_state(pos=(0, 0, 0)):
    x = st.identity(jnp.float64)
    return x._replace(pos=jnp.asarray(pos, jnp.float64))


class TestForwardState:
    def test_constant_velocity(self):
        # frame at t=0, vel v, no rotation, gravity compensated by accel
        g = np.array([0, 0, -9.809])
        frames = make_frames(
            [0.0], [((0, 0, 0), (1, 0, 0, 0))], [(1.0, 2.0, 0.0)],
            [(0, 0, 0)], [-g], g)
        q, p = dsk.forward_state(frames, jnp.asarray([0]), jnp.asarray([0.1]))
        np.testing.assert_allclose(np.asarray(p[0]), [0.1, 0.2, 0.0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(q[0]), [1, 0, 0, 0], atol=1e-9)

    def test_rotation_integration(self):
        g = np.array([0, 0, -9.809])
        w = np.array([0, 0, np.pi])  # half-turn/s about z
        frames = make_frames([0.0], [((0, 0, 0), (1, 0, 0, 0))], [(0, 0, 0)],
                             [w], [-g], g)
        q, p = dsk.forward_state(frames, jnp.asarray([0]), jnp.asarray([0.5]))
        want = so3.exp_quat(jnp.asarray(w * 0.5))
        np.testing.assert_allclose(np.asarray(q[0]), np.asarray(want), atol=1e-9)

    def test_frame_selection(self):
        g = np.array([0, 0, -9.809])
        # two frames: second starts at x=10
        frames = make_frames(
            [0.0, 0.1],
            [((0, 0, 0), (1, 0, 0, 0)), ((10, 0, 0), (1, 0, 0, 0))],
            [(0, 0, 0), (0, 0, 0)], [(0, 0, 0)] * 2, [-g] * 2, g)
        q, p = dsk.forward_state(frames, jnp.asarray([0, 1]), jnp.asarray([0.05, 0.15]))
        np.testing.assert_allclose(np.asarray(p), [[0, 0, 0], [10, 0, 0]], atol=1e-9)


class TestDeskew:
    def test_static_points_identity(self):
        # no motion: deskewed Xt2 points == lidar points (identity extrinsics)
        g = np.array([0, 0, -9.809])
        frames = make_frames([0.0], [((0, 0, 0), (1, 0, 0, 0))], [(0, 0, 0)],
                             [(0, 0, 0)], [-g], g)
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)))
        t = jnp.full(10, 0.05)
        p2, pw = dsk.deskew(pts, t, jnp.ones(10, bool), frames, ident_state(),
                            so3.quat_identity(jnp.float64), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(p2), np.asarray(pts), atol=1e-9)

    def test_translating_sensor_compensation(self):
        # sensor moves +x at 1 m/s; a fixed world point at (5,0,0).
        # point observed at t: p_lidar = (5 - t, 0, 0).
        g = np.array([0, 0, -9.809])
        frames = make_frames([0.0], [((0, 0, 0), (1, 0, 0, 0))], [(1, 0, 0)],
                             [(0, 0, 0)], [-g], g)
        ts = np.array([0.02, 0.05, 0.08])
        pts = np.stack([5.0 - ts, np.zeros(3), np.zeros(3)], axis=1)
        # Xt2 = state at t=0.1 → pos (0.1,0,0)
        x_last = ident_state((0.1, 0, 0))._replace(vel=jnp.asarray([1.0, 0, 0]))
        p2, pw = dsk.deskew(jnp.asarray(pts), jnp.asarray(ts), jnp.ones(3, bool),
                            frames, x_last, so3.quat_identity(jnp.float64), jnp.zeros(3))
        # world position recovered exactly, Xt2-frame = world − 0.1
        np.testing.assert_allclose(np.asarray(pw), np.tile([5.0, 0, 0], (3, 1)), atol=1e-7)
        np.testing.assert_allclose(np.asarray(p2), np.tile([4.9, 0, 0], (3, 1)), atol=1e-7)

    def test_extrinsics_applied(self):
        g = np.array([0, 0, -9.809])
        frames = make_frames([0.0], [((0, 0, 0), (1, 0, 0, 0))], [(0, 0, 0)],
                             [(0, 0, 0)], [-g], g)
        t_ext = jnp.asarray([1.0, 2.0, 3.0])
        pts = jnp.zeros((1, 3))
        p2, pw = dsk.deskew(pts, jnp.asarray([0.0]), jnp.ones(1, bool), frames,
                            ident_state(), so3.quat_identity(jnp.float64), t_ext)
        np.testing.assert_allclose(np.asarray(pw[0]), [1, 2, 3], atol=1e-9)
