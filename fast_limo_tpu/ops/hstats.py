"""Fused measurement-statistics kernel: H rows + HᵀH/Hᵀh in ONE launch.

Per update iteration the measurement model (models/measurement.py h_rows +
h_stats; reference Mapper::match world-transform Mapper.cpp:71-72 +
Localizer::calculate_H Localizer.cpp:537-577) is ~15 XLA fusions over
(N,3)/(N,12) arrays — on the tunneled v5e that is ~0.1-0.15 ms of fixed
fusion latency per iteration for ~2 MFLOP of math.  This kernel computes
the whole chain

    glob  = R·p + t                       (world-frame queries)
    dist  = n·glob + d                    (plane residual, Plane.cpp:50-56)
    C     = Rᵀ·n ;  A = p × C
    B     = (R_LIᵀ(p − t_LI)) × (R_LIᵀ·C) (extrinsic block, Localizer.cpp:563-572)
    H_i   = [n | A | B | C]  (keep-masked)   ;   h_i = −dist
    HᵀH   = Σ keep·H_i H_iᵀ  ;  Hᵀh = Σ keep·H_i h_i

in one launch.  Data is packed by ``pack_inputs`` into an (8·Nr, 128)
channel stack — [px py pz nx ny nz nd keep] as full (Nr,128) tiles — so all
per-point math is full-width VPU elementwise work and the 12×12/12
sufficient statistics are 90 tile reductions.  All packed inputs are
x-INDEPENDENT: the per-iteration call re-sends only 14 state scalars via
SMEM, and the certified frozen-correspondence pack (measurement.
make_h_model) is built once per scan, outside the iteration loop.

`hstats_reference` mirrors the exact jnp semantics for parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import so3

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

M = 12


def hstats_reference(pc, n_abcd, keep, x: st.NavState, estimate_extrinsics):
    """Plain-jnp sufficient statistics (same math as measurement.h_rows)."""
    glob = so3.quat_rotate(x.rot, pc) + x.pos
    dist = jnp.sum(n_abcd[:, :3] * glob, axis=-1) + n_abcd[:, 3]
    n = n_abcd[:, :3]
    Rinv = so3.quat_to_mat(so3.quat_conj(x.rot))
    C = n @ Rinv.T
    A = jnp.cross(pc, C)
    RLIinv = so3.quat_to_mat(so3.quat_conj(x.rot_LI))
    p_lidar = (pc - x.t_LI) @ RLIinv.T
    B = jnp.cross(p_lidar, C @ RLIinv.T)
    if estimate_extrinsics:
        H = jnp.concatenate([n, A, B, C], axis=-1)
    else:
        H = jnp.concatenate([n, A, jnp.zeros_like(B), jnp.zeros_like(C)],
                            axis=-1)
    H = jnp.where(keep[:, None], H, 0.0)
    h = jnp.where(keep, -dist, 0.0)
    return H.T @ H, H.T @ h


def rot_mat(w, a, b, c):
    """3×3 rotation entries (scalars) of quaternion (w,a,b,c)."""
    return (1 - 2 * (b * b + c * c), 2 * (a * b - w * c), 2 * (a * c + w * b),
            2 * (a * b + w * c), 1 - 2 * (a * a + c * c), 2 * (b * c - w * a),
            2 * (a * c - w * b), 2 * (b * c + w * a), 1 - 2 * (a * a + b * b))


def glob_math(px, py, pz, s):
    """World-frame query tiles ``R·p + t`` from the 14 state scalars."""
    R00, R01, R02, R10, R11, R12, R20, R21, R22 = rot_mat(
        s[0], s[1], s[2], s[3])
    tx, ty, tz = s[4], s[5], s[6]
    return (R00 * px + R01 * py + R02 * pz + tx,
            R10 * px + R11 * py + R12 * pz + ty,
            R20 * px + R21 * py + R22 * pz + tz)


def stats_math(chans, s, *, estimate_extrinsics: bool, with_glob: bool = False,
               glob=None):
    """The full per-iteration statistics chain on register values.

    ``chans`` = 8 (Nr,128) channel tiles [px py pz nx ny nz nd keep];
    ``s`` = 14 state scalars [rot(wxyz), pos, rot_LI(wxyz), t_LI].
    Returns ``(HᵀH (M,M), Hᵀh (M,))``; with ``with_glob`` additionally the
    world-frame query tiles ``(gx, gy, gz)``.  ``glob`` skips the in-place
    recompute when the caller already has the tiles (the window re-match
    kernel needs them BEFORE the stats).  Shared by the single-call kernel
    below and the whole-loop update kernel."""
    px, py, pz, nx, ny, nz, nd, keep = chans
    qw, qx, qy, qz = s[0], s[1], s[2], s[3]
    ew, ex, ey, ez = s[7], s[8], s[9], s[10]
    lx, ly, lz = s[11], s[12], s[13]

    R00, R01, R02, R10, R11, R12, R20, R21, R22 = rot_mat(qw, qx, qy, qz)
    E00, E01, E02, E10, E11, E12, E20, E21, E22 = rot_mat(ew, ex, ey, ez)

    # glob = R p + t ; dist = n·glob + d
    if glob is None:
        glob = glob_math(px, py, pz, s)
    gx, gy, gz = glob
    dist = nx * gx + ny * gy + nz * gz + nd

    # C = Rᵀ n
    cx = R00 * nx + R10 * ny + R20 * nz
    cy = R01 * nx + R11 * ny + R21 * nz
    cz = R02 * nx + R12 * ny + R22 * nz
    # A = p × C
    ax = py * cz - pz * cy
    ay = pz * cx - px * cz
    az = px * cy - py * cx

    if estimate_extrinsics:
        # p_lidar = R_LIᵀ (p − t_LI) ; Cl = R_LIᵀ C ; B = p_lidar × Cl
        ux, uy, uz = px - lx, py - ly, pz - lz
        plx = E00 * ux + E10 * uy + E20 * uz
        ply = E01 * ux + E11 * uy + E21 * uz
        plz = E02 * ux + E12 * uy + E22 * uz
        clx = E00 * cx + E10 * cy + E20 * cz
        cly = E01 * cx + E11 * cy + E21 * cz
        clz = E02 * cx + E12 * cy + E22 * cz
        bx = ply * clz - plz * cly
        by = plz * clx - plx * clz
        bz = plx * cly - ply * clx
        cols = [nx, ny, nz, ax, ay, az, bx, by, bz, cx, cy, cz]
    else:
        # extrinsic columns are exactly zero — skip their reductions
        cols = [nx, ny, nz, ax, ay, az] + [None] * 6

    cols = [None if c is None else c * keep for c in cols]   # exact row mask
    hneg = -dist * keep

    # upper-triangular pairwise reductions over full (Nr,128) tiles
    zero = jnp.sum(px * 0.0)
    rows = []
    for j in range(M):
        rows.append(jnp.stack([
            jnp.sum(cols[j] * cols[k])
            if (k >= j and cols[j] is not None and cols[k] is not None)
            else zero
            for k in range(M)]))
    upper = jnp.stack(rows)                              # (M,M) upper incl diag
    rI = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    cI = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    diag = jnp.where(rI == cI, upper, 0.0)
    HTH = upper + upper.T - diag
    HTh = jnp.stack([
        jnp.sum(cols[j] * hneg) if cols[j] is not None else zero
        for j in range(M)])
    if with_glob:
        return HTH, HTh, (gx, gy, gz)
    return HTH, HTh


def _kernel(X_ref, sc_ref, HTH_ref, HTh_ref,
            *, estimate_extrinsics: bool, Nr: int):
    # 8 stacked (Nr,128) channels: px py pz nx ny nz nd keep.  Full-tile 2-D
    # layout — a 1-D (N,) vector occupies one sublane of each vreg (⅛ VPU
    # utilization; measured ~6× slower end-to-end).
    chans = tuple(X_ref[i * Nr:(i + 1) * Nr, :] for i in range(8))
    s = [sc_ref[0, i] for i in range(14)]
    HTH, HTh = stats_math(chans, s, estimate_extrinsics=estimate_extrinsics)
    HTH_ref[:, :] = HTH
    HTh_ref[0, :] = HTh


def pack_inputs(pc, n_abcd, keep):
    """Pack the x-independent kernel inputs into one (8·Nr, 128) channel
    stack [px py pz nx ny nz nd keep] — done ONCE per scan (the per-iteration
    call only re-sends the 14 state scalars)."""
    f32 = jnp.float32
    N = pc.shape[0]
    pad = (-N) % 128
    if pad:
        pc = jnp.concatenate([pc.astype(f32), jnp.zeros((pad, 3), f32)])
        n_abcd = jnp.concatenate([n_abcd.astype(f32), jnp.zeros((pad, 4), f32)])
        keep = jnp.concatenate([keep, jnp.zeros(pad, bool)])
    Nr = (N + pad) // 128
    chans = [pc[:, 0], pc[:, 1], pc[:, 2],
             n_abcd[:, 0], n_abcd[:, 1], n_abcd[:, 2], n_abcd[:, 3],
             keep.astype(f32)]
    return jnp.concatenate([c.astype(f32).reshape(Nr, 128) for c in chans])


@functools.partial(jax.jit, static_argnames=("estimate_extrinsics",
                                             "interpret"))
def hstats_tpu(X, sc, *, estimate_extrinsics: bool,
               interpret: bool = False):
    """Fused statistics from ``pack_inputs``-packed channels.

    X (8·Nr, 128) f32, sc (1,16) f32 SMEM = [rot(wxyz), pos, rot_LI(wxyz),
    t_LI, pad²].  Returns (HᵀH (12,12), Hᵀh (12,)).
    """
    Nr = X.shape[0] // 8
    HTH, HTh = pl.pallas_call(
        functools.partial(_kernel, estimate_extrinsics=estimate_extrinsics,
                          Nr=Nr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((M, M), jnp.float32),
                   jax.ShapeDtypeStruct((1, M), jnp.float32)),
        interpret=interpret,
    )(X, sc)
    return HTH, HTh[0]


def pack_scalars(x: st.NavState):
    """(1,16) SMEM row for hstats_tpu from the current iterate."""
    f32 = jnp.float32
    return jnp.concatenate([
        x.rot.astype(f32), x.pos.astype(f32), x.rot_LI.astype(f32),
        x.t_LI.astype(f32), jnp.zeros(2, f32)])[None, :]
