"""IMU process model f / df_dx / df_dw.

Behavioral counterpart of `IKFoM::get_f/df_dx/df_dw` (use-ikfom.cpp:43-84),
with the same block layout over the flattened 24-dim dynamics and the 23-dim
error state (see models/state.py docstring for the index map).
"""

from __future__ import annotations

import jax.numpy as jnp

from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import s2, so3


def f(x: st.NavState, acc, gyro):
    """Flattened dynamics (24,): d(pos)=vel, d(rot)=ω−bg, d(vel)=R(a−ba)+g."""
    out = jnp.zeros(st.FLAT_DIM, dtype=x.dtype)
    omega = gyro - x.bg
    a_inertial = so3.quat_rotate(x.rot, acc - x.ba)
    out = out.at[0:3].set(x.vel)
    out = out.at[3:6].set(omega)
    out = out.at[12:15].set(a_inertial + x.grav)
    return out


def df_dx(x: st.NavState, acc, gyro):
    """(24, 23) Jacobian of f w.r.t. the error state (use-ikfom.cpp:57-73)."""
    J = jnp.zeros((st.FLAT_DIM, st.ERR_DIM), dtype=x.dtype)
    I3 = jnp.eye(3, dtype=x.dtype)
    R = so3.quat_to_mat(x.rot)
    J = J.at[0:3, st.VEL:st.VEL + 3].set(I3)                                  # dpos/dvel
    J = J.at[12:15, st.ROT:st.ROT + 3].set(-R @ so3.hat(acc - x.ba))          # dvel/drot
    J = J.at[12:15, st.BA:st.BA + 3].set(-R)                                  # dvel/dba
    # dvel/dgrav via the S2 chart: grav_matrix = S2_Mx(grav, 0) (use-ikfom.cpp:67-70)
    J = J.at[12:15, st.GRAV:st.GRAV + 2].set(
        s2.Mx(x.grav, jnp.zeros(2, dtype=x.dtype)))
    J = J.at[3:6, st.BG:st.BG + 3].set(-I3)                                   # drot/dbg
    return J


def df_dw(x: st.NavState, acc, gyro):
    """(24, 12) Jacobian of f w.r.t. noise [ng, na, nbg, nba] (use-ikfom.cpp:76-84)."""
    J = jnp.zeros((st.FLAT_DIM, st.NOISE_DIM), dtype=x.dtype)
    I3 = jnp.eye(3, dtype=x.dtype)
    R = so3.quat_to_mat(x.rot)
    J = J.at[12:15, 3:6].set(-R)    # dvel/na
    J = J.at[3:6, 0:3].set(-I3)     # drot/ng
    J = J.at[15:18, 6:9].set(I3)    # dbg/nbg
    J = J.at[18:21, 9:12].set(I3)   # dba/nba
    return J


def process_noise_Q(cov_gyro, cov_acc, cov_bias_gyro, cov_bias_acc, dtype=jnp.float32):
    """12×12 diagonal Q (Localizer.cpp:588-592)."""
    d = jnp.concatenate([
        jnp.full(3, cov_gyro, dtype=dtype),
        jnp.full(3, cov_acc, dtype=dtype),
        jnp.full(3, cov_bias_gyro, dtype=dtype),
        jnp.full(3, cov_bias_acc, dtype=dtype),
    ])
    return jnp.diag(d)
