"""Fused deskew kernel: the whole motion-compensation chain in ONE launch.

The jnp deskew (models/deskew.py — reference hot loop #1,
Localizer.cpp:822-843 + State::update) costs ~0.46 ms on the v5e for 32k
points: a searchsorted pass, SEVEN small frame-table gathers, the
Rodrigues/quaternion chain, and two frame changes — each a handful of µs
of math inside ~6 µs XLA fusions, plus inter-stage glue.  This kernel runs
it all on VMEM-resident channel tiles:

1. per-point frame selection WITHOUT searchsorted or gathers: for each of
   the K (≈33) frames, a mask ``T_k ≤ t < T_{k+1}`` accumulates that
   frame's ~17 parameters into per-point channels (K × 17 masked adds —
   pure VPU work; duplicate frame times resolve to the rightmost frame,
   matching ``searchsorted(side="right") − 1`` with the left clip),
2. one vectorized forward integration (exp-quat via the cos/sinc Taylor
   pair, quaternion compose + rotate) and the extrinsic/world/Xt2 frame
   changes with scalar-constant rotations.

Bit-compatible semantics with models/deskew.deskew (same formulas, same
branch structure; f32 association differs — parity-tested to 1e-5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_LANES = 128
_FW = 24          # frame-table row width (17 used, padded)
# invalid-frame time sentinel: large FINITE value, not inf — the masked
# accumulation computes 0·T for non-selected frames, and 0·inf is NaN
# (poisons every point); any point time is ≪ 1e30 so the masks behave
# identically
_T_SENTINEL = 1e30


def _cos_sinc_ch(x2):
    """Channelwise cos/sinc pair — so3's MTK implementation is pure
    elementwise jnp and lowers inside Pallas, so reuse it (a fix to the
    MTK semantics there must reach this kernel)."""
    from fast_limo_tpu.ops import so3

    return so3._cos_sinc_sqrt(x2)


def _kernel(X_ref, F_ref, sc_ref, out_ref, *, Nr: int, K: int):
    f32 = jnp.float32
    ch = lambda i: X_ref[i * Nr:(i + 1) * Nr, :]
    px, py, pz, t, vld = ch(0), ch(1), ch(2), ch(3), ch(4)

    s = [sc_ref[0, i] for i in range(15)]
    ew, ex, ey, ez = s[0], s[1], s[2], s[3]          # q_ext
    etx, ety, etz = s[4], s[5], s[6]                 # t_ext
    iw, ix, iy, iz = s[7], s[8], s[9], s[10]         # conj(x_last.rot)
    lx, ly, lz = s[11], s[12], s[13]                 # x_last.pos

    # ---- per-point frame parameters via masked accumulation ----
    # frame scalars come from SMEM (native scalar loads; VMEM row extracts
    # measured ~0.7 ms for the same loop)
    zero = px * 0.0
    acc = [zero] * 17       # [t_k, pos3, rot4, vel3, a0w3, weff3]
    for k in range(K):
        Tk = F_ref[k, 0]
        Tn = F_ref[k + 1, 0] if k + 1 < K else jnp.float32(_T_SENTINEL)
        if k == 0:
            m = (t < Tn).astype(f32)                 # left clip to frame 0
        else:
            m = ((t >= Tk) & (t < Tn)).astype(f32)
        for j in range(17):
            acc[j] = acc[j] + m * F_ref[k, j]
    tk = acc[0]
    fpx, fpy, fpz = acc[1], acc[2], acc[3]
    qw, qx, qy, qz = acc[4], acc[5], acc[6], acc[7]
    vx, vy, vz = acc[8], acc[9], acc[10]
    awx, awy, awz = acc[11], acc[12], acc[13]        # world accel incl. grav
    wx, wy, wz = acc[14], acc[15], acc[16]           # bias-corrected gyro

    # ---- forward integration to the point time ----
    dt = t - tk
    gx, gy, gz = wx * dt, wy * dt, wz * dt
    n2 = gx * gx + gy * gy + gz * gz
    c, sinc = _cos_sinc_ch(0.25 * n2)                # scale = 1/2
    sw = c
    sx, sy, sz = 0.5 * sinc * gx, 0.5 * sinc * gy, 0.5 * sinc * gz
    # q = q0 ⊗ exp(ω dt)
    rw = qw * sw - qx * sx - qy * sy - qz * sz
    rx = qw * sx + qx * sw + qy * sz - qz * sy
    ry = qw * sy - qx * sz + qy * sw + qz * sx
    rz = qw * sz + qx * sy - qy * sx + qz * sw
    # p_i = pos + vel·dt + ½·a₀·dt²
    h2 = 0.5 * dt * dt
    pix = fpx + vx * dt + awx * h2
    piy = fpy + vy * dt + awy * h2
    piz = fpz + vz * dt + awz * h2

    # ---- lidar → baselink (constant rotation) ----
    def rotm(w, a, b, cq):
        return (1 - 2 * (b * b + cq * cq), 2 * (a * b - w * cq), 2 * (a * cq + w * b),
                2 * (a * b + w * cq), 1 - 2 * (a * a + cq * cq), 2 * (b * cq - w * a),
                2 * (a * cq - w * b), 2 * (b * cq + w * a), 1 - 2 * (a * a + b * b))

    E = rotm(ew, ex, ey, ez)
    bx = E[0] * px + E[1] * py + E[2] * pz + etx
    by = E[3] * px + E[4] * py + E[5] * pz + ety
    bz = E[6] * px + E[7] * py + E[8] * pz + etz

    # ---- baselink → world with the per-point quaternion:
    # v' = v + 2w(q×v) + 2q×(q×v) ----
    cx1 = ry * bz - rz * by
    cy1 = rz * bx - rx * bz
    cz1 = rx * by - ry * bx
    cx2 = ry * cz1 - rz * cy1
    cy2 = rz * cx1 - rx * cz1
    cz2 = rx * cy1 - ry * cx1
    wxp = bx + 2.0 * (rw * cx1 + cx2) + pix
    wyp = by + 2.0 * (rw * cy1 + cy2) + piy
    wzp = bz + 2.0 * (rw * cz1 + cz2) + piz

    # ---- world → Xt2 (constant rotation by conj(x_last.rot)) ----
    I = rotm(iw, ix, iy, iz)
    dx0, dy0, dz0 = wxp - lx, wyp - ly, wzp - lz
    x2c = I[0] * dx0 + I[1] * dy0 + I[2] * dz0
    y2c = I[3] * dx0 + I[4] * dy0 + I[5] * dz0
    z2c = I[6] * dx0 + I[7] * dy0 + I[8] * dz0

    # SELECT, not multiply: invalid lanes can carry NaN/inf inputs (raw
    # sensor NaN points are masked invalid by preprocess, not removed) and
    # NaN·0 = NaN would leak through a multiplicative mask
    keep = vld > 0
    zero = jnp.zeros_like(px)       # a true 0 (px·0 would be NaN on NaN lanes)
    out_ref[0 * Nr:1 * Nr, :] = jnp.where(keep, x2c, zero)
    out_ref[1 * Nr:2 * Nr, :] = jnp.where(keep, y2c, zero)
    out_ref[2 * Nr:3 * Nr, :] = jnp.where(keep, z2c, zero)
    out_ref[3 * Nr:4 * Nr, :] = jnp.where(keep, wxp, zero)
    out_ref[4 * Nr:5 * Nr, :] = jnp.where(keep, wyp, zero)
    out_ref[5 * Nr:6 * Nr, :] = jnp.where(keep, wzp, zero)


@functools.partial(jax.jit, static_argnames=("interpret",))
def deskew_tpu(points, t_pts, valid, frames, x_last_rot, x_last_pos,
               q_ext, t_ext, *, interpret: bool = False):
    """Fused deskew.  Returns ``(pts_xt2 (N,3), pts_world (N,3))`` — the
    contract of models/deskew.deskew.  ``frames`` is a deskew.Frames."""
    from fast_limo_tpu.ops import so3

    f32 = jnp.float32
    N = points.shape[0]
    pad = (-N) % _LANES
    Nr = (N + pad) // _LANES
    K = frames.time.shape[0]

    def chanpad(x):
        x = x.astype(f32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros(pad, f32)])
        return x.reshape(Nr, _LANES)

    X = jnp.concatenate([
        chanpad(points[:, 0]), chanpad(points[:, 1]), chanpad(points[:, 2]),
        chanpad(t_pts), chanpad(valid.astype(f32))])

    # frame table: per-frame constants precomputed OUTSIDE (cheap K-sized
    # math): [T_k, pos3, rot4, vel3, a0_world3(incl grav), w_eff3].
    # cummax makes the times monotone: the interval masks assume ascending
    # frame times, and a REGRESSED IMU stamp (which imu_to_baselink's dt
    # clamp anticipates) would otherwise satisfy two masks at once and
    # double-accumulate parameters; with cummax a regressed frame becomes
    # an empty interval (never selected) — searchsorted on non-monotone
    # input is undefined anyway, so safety, not parity, is the contract
    T = jnp.where(frames.valid, frames.time, _T_SENTINEL).astype(f32)
    T = jax.lax.cummax(T)
    w_eff = frames.w - frames.bg
    a0w = so3.quat_rotate(frames.rot, frames.a - frames.ba) + frames.grav
    F = jnp.zeros((K, _FW), f32)
    F = F.at[:, 0].set(T)
    F = F.at[:, 1:4].set(frames.pos.astype(f32))
    F = F.at[:, 4:8].set(frames.rot.astype(f32))
    F = F.at[:, 8:11].set(frames.vel.astype(f32))
    F = F.at[:, 11:14].set(a0w.astype(f32))
    F = F.at[:, 14:17].set(w_eff.astype(f32))

    q_inv = so3.quat_conj(x_last_rot)
    sc = jnp.concatenate([
        q_ext.astype(f32), t_ext.astype(f32), q_inv.astype(f32),
        x_last_pos.astype(f32), jnp.zeros(2, f32)])[None, :]     # (1,16)

    out = pl.pallas_call(
        functools.partial(_kernel, Nr=Nr, K=K),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((K, _FW), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6 * Nr, _LANES), f32),
        interpret=interpret,
    )(X, F, sc)

    flat = out.reshape(6, Nr * _LANES)[:, :N]
    pts_xt2 = jnp.stack([flat[0], flat[1], flat[2]], axis=1)
    pts_world = jnp.stack([flat[3], flat[4], flat[5]], axis=1)
    return pts_xt2, pts_world
