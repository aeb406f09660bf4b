"""The 23-DOF navigation state manifold.

State composition mirrors `state_ikfom` (use-ikfom.hpp:12-21):
``pos(3) ⊕ rot(SO3) ⊕ offset_R_L_I(SO3) ⊕ offset_T_L_I(3) ⊕ vel(3) ⊕ bg(3) ⊕
ba(3) ⊕ grav(S2: 2 DOF, 3 dims)``.

Error/covariance indexing (23 dims) and flattened-dynamics indexing (24 dims)
follow the MTK submanifold layout the esekf engine relies on
(mtk/build_manifold.hpp:90-229):

==============  =========  =========
block           error idx  f/dim idx
==============  =========  =========
pos             0:3        0:3
rot (SO3)       3:6        3:6
offset_R (SO3)  6:9        6:9
offset_T        9:12       9:12
vel             12:15      12:15
bg              15:18      15:18
ba              18:21      18:21
grav (S2)       21:23      21:24
==============  =========  =========
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fast_limo_tpu.ops import s2, so3

ERR_DIM = 23      # error-state dimension (n)
FLAT_DIM = 24     # flattened dynamics dimension (m)
NOISE_DIM = 12    # process noise dimension (ng, na, nbg, nba)

# error-state block offsets
POS, ROT, EXT_R, EXT_T, VEL, BG, BA, GRAV = 0, 3, 6, 9, 12, 15, 18, 21
SO3_IDXS = (ROT, EXT_R)   # SO3 blocks needing chart corrections (esekfom.hpp:1659)
S2_IDX = GRAV             # S2 block (esekfom.hpp:1678)


class NavState(NamedTuple):
    """Pytree navigation state. Quaternions are (w,x,y,z)."""

    pos: jnp.ndarray      # (3,)
    rot: jnp.ndarray      # (4,) world←baselink quaternion
    rot_LI: jnp.ndarray   # (4,) baselink←lidar quaternion (offset_R_L_I)
    t_LI: jnp.ndarray     # (3,) baselink←lidar translation (offset_T_L_I)
    vel: jnp.ndarray      # (3,) world-frame velocity
    bg: jnp.ndarray       # (3,) gyro bias
    ba: jnp.ndarray       # (3,) accel bias
    grav: jnp.ndarray     # (3,) gravity vector, |grav| == s2.S2_LENGTH

    @property
    def dtype(self):
        return self.pos.dtype


def identity(dtype=jnp.float32, gravity: float = 9.81) -> NavState:
    return NavState(
        pos=jnp.zeros(3, dtype),
        rot=so3.quat_identity(dtype),
        rot_LI=so3.quat_identity(dtype),
        t_LI=jnp.zeros(3, dtype),
        vel=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        grav=s2.project(jnp.array([0.0, 0.0, -gravity], dtype)),
    )


def boxplus(x: NavState, dx) -> NavState:
    """x ⊞ dx with dx a 23-vector (MTK compound boxplus)."""
    return NavState(
        pos=x.pos + dx[POS:POS + 3],
        rot=so3.boxplus(x.rot, dx[ROT:ROT + 3]),
        rot_LI=so3.boxplus(x.rot_LI, dx[EXT_R:EXT_R + 3]),
        t_LI=x.t_LI + dx[EXT_T:EXT_T + 3],
        vel=x.vel + dx[VEL:VEL + 3],
        bg=x.bg + dx[BG:BG + 3],
        ba=x.ba + dx[BA:BA + 3],
        grav=s2.boxplus(x.grav, dx[GRAV:GRAV + 2]),
    )


def boxminus(x: NavState, x0: NavState):
    """23-vector chart difference x ⊟ x0."""
    return jnp.concatenate([
        x.pos - x0.pos,
        so3.boxminus(x.rot, x0.rot),
        so3.boxminus(x.rot_LI, x0.rot_LI),
        x.t_LI - x0.t_LI,
        x.vel - x0.vel,
        x.bg - x0.bg,
        x.ba - x0.ba,
        s2.boxminus(x.grav, x0.grav),
    ])


def oplus_flat(x: NavState, f, dt) -> NavState:
    """x.oplus(f, dt) with f the 24-dim flattened dynamics (esekfom.hpp:287).

    Per-submanifold: vect += f*dt; SO3: q∘exp(f*dt); S2: rotate by exp(f*dt).
    """
    return NavState(
        pos=x.pos + f[0:3] * dt,
        rot=so3.boxplus(x.rot, f[3:6] * dt),
        rot_LI=so3.boxplus(x.rot_LI, f[6:9] * dt),
        t_LI=x.t_LI + f[9:12] * dt,
        vel=x.vel + f[12:15] * dt,
        bg=x.bg + f[15:18] * dt,
        ba=x.ba + f[18:21] * dt,
        grav=s2.oplus(x.grav, f[21:24] * dt),
    )


def as_vector(x: NavState):
    """Debug/serialization flattening: pos(3) rot(4) rotLI(4) tLI(3) vel(3) bg(3) ba(3) grav(3)."""
    return jnp.concatenate([x.pos, x.rot, x.rot_LI, x.t_LI, x.vel, x.bg, x.ba, x.grav])


def from_vector(v, cls=NavState) -> NavState:
    return cls(pos=v[0:3], rot=v[3:7], rot_LI=v[7:11], t_LI=v[11:14],
               vel=v[14:17], bg=v[17:20], ba=v[20:23], grav=v[23:26])
