"""Fused iEKF update-iteration body: everything between ``h_model`` and the
while-loop bookkeeping as ONE Pallas TPU kernel.

Motivation (measured on tunneled v5e, tools/profile_update.py): after the
fused gain kernel (ops/gain.py) the remaining per-iteration cost was ~0.3 ms
of pure fusion latency — ``_chart_project_P`` (~20 tiny dynamic-update-slice
fusions), ``boxplus``/``boxminus``, the Gershgorin guard, ``dx_`` assembly and
the conditional ``_final_P`` chain are each a handful of microseconds of math
wrapped in ~6 µs XLA dispatch.  Inside one kernel the same algebra is
register-resident: one launch per iteration.

The kernel computes, from ``(HᵀH, Hᵀh, P_prop, dx = x ⊟ x_prop, x, x_prop)``
— exactly the body of ``models/iekf.update_iterated`` (reference
esekfom.hpp:1650-1819):

    J₁      = chart-projection block-diagonal (A(dx)ᵀ blocks + S2 Nx·Mx)
    dx_new  = J₁·dx        ;  P_it = J₁·P·J₁ᵀ          (esekfom.hpp:1657-1697)
    K_x,K_h = gain(HᵀH, Hᵀh, P_it, R)                   (ops/gain.py algebra)
    dx_     = K_h + K_x·dx_new[:12] − dx_new
    x_next  = x ⊞ guard(dx_)   (EXACT degeneracy guard via in-kernel 6×6
              Jacobi eigh — `jacobi_guard_head`; no atan needed)
    P_fin   = J₂·(A·P_it·Aᵀ + R·K·Kᵀ)·J₂ᵀ, A = I − [K_x|0]   (Joseph form —
              PSD-preserving under f32 gain error; see iekf._final_P)
    gersh   = Gershgorin lower bound on eig(HᵀH[0:6,0:6]) — telemetry only
              (on real bench geometry the bound is hugely negative on every
              scan while the true eigenvalues are fine, so the round-2
              certify-or-fallback design silently ran the jnp eigh path
              every iteration; measured via tools/oracle_corridor.py)

``boxminus`` stays OUTSIDE the kernel because quaternion/S2 log needs atan2,
which Mosaic does not lower; it depends only on kernel inputs so it costs a
couple of fusions per iteration, not per-element work.

All small manifold math (A_matrix, exp, quat products, S2 charts) is
re-implemented here in kernel-safe form — no dynamic_update_slice, no
scatter, no 2D→1D reshape, no atan — mirroring ops/so3.py / ops/s2.py
exactly (MTK semantics, mtk/types/{SOn,S2}.hpp, mtkmath.hpp:236-247).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops.gain import gain_math

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

M = 12    # observed dims
NS = 23   # error-state dims
XF = 26   # flattened state dims (pos3 rot4 rotLI4 tLI3 vel3 bg3 ba3 grav3)
_TOL = 1e-5            # MTK::tolerance<f32> (mtkmath.hpp:121-122)
S2_LEN = 98090.0 / 10000.0


# ---------------------------------------------------------------------------
# kernel-safe manifold math (tiny stacks + dots only)
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _hat3(v):
    z = jnp.zeros_like(v[0])
    return jnp.stack([
        jnp.stack([z, -v[2], v[1]]),
        jnp.stack([v[2], z, -v[0]]),
        jnp.stack([-v[1], v[0], z]),
    ])


def _A_matrix(v):
    """MTK::A_matrix (mtkmath.hpp:236-247), kernel-safe clone of so3.A_matrix."""
    n2 = jnp.sum(v * v)
    n = jnp.sqrt(n2)
    safe_n2 = jnp.where(n2 > _TOL * _TOL, n2, 1.0)
    K = _hat3(v)
    K2 = _dot(K, K)
    c1 = jnp.where(n >= _TOL, (1.0 - jnp.cos(n)) / safe_n2, 0.5)
    c2 = jnp.where(
        n >= _TOL,
        (1.0 - jnp.sin(n) / jnp.where(n > 0, n, 1.0)) / safe_n2, 1.0 / 6.0)
    I = jnp.eye(3, dtype=jnp.float32)
    out = I + c1 * K + c2 * K2
    return jnp.where(n < _TOL, I, out)


def _cos_sinc_sqrt(x2):
    """Clone of so3._cos_sinc_sqrt (MTK::cos_sinc_sqrt, mtkmath.hpp:143-174)."""
    eps = jnp.finfo(jnp.float32).eps
    taylor_bound = float(eps ** 0.25)
    x2s = jnp.maximum(x2, 0.0)
    x = jnp.sqrt(x2s)
    safe_x = jnp.where(x2s >= taylor_bound, x, 1.0)
    cos_big = jnp.cos(safe_x)
    sinc_big = jnp.sin(safe_x) / safe_x
    inv = [1 / 3.0, 1 / 4.0, 1 / 5.0, 1 / 6.0, 1 / 7.0, 1 / 8.0]
    cosi = jnp.ones_like(x2s)
    sinc = jnp.ones_like(x2s)
    term = -0.5 * x2s
    for i in range(3):
        cosi = cosi + term
        term = term * inv[2 * i]
        sinc = sinc + term
        term = term * (-inv[2 * i + 1]) * x2s
    use_big = x2s >= taylor_bound
    return jnp.where(use_big, cos_big, cosi), jnp.where(use_big, sinc_big, sinc)


def _exp_quat(v, scale=0.5):
    """so3.exp_quat clone: (w, xyz) as a (4,) stack."""
    norm2 = jnp.sum(v * v)
    c, sinc = _cos_sinc_sqrt(scale * scale * norm2)
    s = sinc * scale
    return jnp.stack([c, s * v[0], s * v[1], s * v[2]])


def _quat_mul(q, p):
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    pw, px, py, pz = p[0], p[1], p[2], p[3]
    return jnp.stack([
        qw * pw - qx * px - qy * py - qz * pz,
        qw * px + qx * pw + qy * pz - qz * py,
        qw * py - qx * pz + qy * pw + qz * px,
        qw * pz + qx * py - qy * px + qz * pw,
    ])


def _quat_to_mat(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)]),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)]),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]),
    ])


def _bx(vec):
    """s2.Bx clone (S2_typ=1 chart, S2.hpp:215-231), (3,2)."""
    x, y, z = vec[0], vec[1], vec[2]
    L = jnp.float32(S2_LEN)
    denom_raw = L + x
    singular = denom_raw <= _TOL
    denom = jnp.where(singular, 1.0, denom_raw)
    B = jnp.stack([
        jnp.stack([-y, -z]),
        jnp.stack([L - y * y / denom, -z * y / denom]),
        jnp.stack([-z * y / denom, L - z * z / denom]),
    ]) / L
    # fixed-frame fallback built from traced zeros (a jnp.array literal would
    # be a captured constant, which pallas_call rejects)
    o = jnp.zeros_like(x)
    l = o + 1.0
    Bs = jnp.stack([jnp.stack([o, o]), jnp.stack([o, -l]), jnp.stack([l, o])])
    return jnp.where(singular, Bs, B)


def _nx_yy(vec):
    """s2.Nx_yy clone: Bxᵀ·hat(vec)/L² (S2.hpp:259-264), (2,3)."""
    return _dot(_bx(vec).T, _hat3(vec)) / jnp.float32(S2_LEN * S2_LEN)


def _bx_dot(B, delta2):
    """(3,2)·(2,) as scalar arithmetic — Mosaic's tiny-matvec relayout path
    is broken for mixed scalar-built × lane-sliced operands (measured:
    'Invalid relayout … vector<1x3xf32>'), so expand it by hand."""
    d0, d1 = delta2[0], delta2[1]
    return jnp.stack([B[0, 0] * d0 + B[0, 1] * d1,
                      B[1, 0] * d0 + B[1, 1] * d1,
                      B[2, 0] * d0 + B[2, 1] * d1])


def _mx(vec, delta2):
    """s2.Mx clone (S2.hpp:266-280 incl. the integer-division exp quirk), (3,2)."""
    B = _bx(vec)
    Bu = _bx_dot(B, delta2)
    small = jnp.sqrt(delta2[0] * delta2[0] + delta2[1] * delta2[1]) < _TOL
    hv = _hat3(vec)
    M_small = -_dot(hv, B)
    M_big = -_dot(_dot(hv, _A_matrix(Bu).T), B)
    return jnp.where(small, M_small, M_big)


def _s2_boxplus(vec, delta2):
    """s2.boxplus clone: exp(Bx·delta)·vec."""
    Bu = _bx_dot(_bx(vec), delta2)
    R = _quat_to_mat(_exp_quat(Bu))
    return jnp.stack([
        R[0, 0] * vec[0] + R[0, 1] * vec[1] + R[0, 2] * vec[2],
        R[1, 0] * vec[0] + R[1, 1] * vec[1] + R[1, 2] * vec[2],
        R[2, 0] * vec[0] + R[2, 1] * vec[1] + R[2, 2] * vec[2],
    ])


def _block_J(A_rot, A_ext, res2):
    """Block-diagonal (23,23): I, A_rot at 3:6, A_ext at 6:9, res2 at 21:23.

    Placement via constant iota selectors (Mosaic has no
    dynamic_update_slice): J = I + Σ Sᵀ(B−I)S.
    """
    f32 = jnp.float32
    eyeN = (jax.lax.broadcasted_iota(jnp.int32, (NS, NS), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (NS, NS), 1)).astype(f32)

    def sel(rows, start):
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, NS), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, NS), 1)
        return (c == r + start).astype(f32)

    S_rot, S_ext, S_g = sel(3, 3), sel(3, 6), sel(2, 21)
    I3 = jnp.eye(3, dtype=f32)
    I2 = jnp.eye(2, dtype=f32)
    return (eyeN
            + _dot(S_rot.T, _dot(A_rot - I3, S_rot))
            + _dot(S_ext.T, _dot(A_ext - I3, S_ext))
            + _dot(S_g.T, _dot(res2 - I2, S_g)))


def _jacobi_eigh6(A, sweeps: int = 5):
    """Symmetric 6×6 eigendecomposition by cyclic Jacobi — kernel-safe.

    Jacobi rotations are pure algebra (t from the quadratic, c = rsqrt),
    no atan — so the reference's eigh degeneracy guard
    (esekfom.hpp:1736-1744) can run INSIDE a Mosaic kernel.  ``sweeps``
    cyclic sweeps (15 rotations each) give far-below-f32 off-diagonal
    residue for 6×6 (quadratic convergence).  Returns ``(w (6,), V (6,6))``
    with A = V·diag(w)·Vᵀ, V orthogonal (columns are eigenvectors),
    eigenvalues unordered."""
    f32 = jnp.float32
    r6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 0)
    c6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 1)
    eye6 = (r6 == c6).astype(f32)
    iv = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)[:, 0]    # (6,)
    V = eye6
    for _ in range(sweeps):
        for p in range(5):
            for q in range(p + 1, 6):
                row_p = jnp.sum(jnp.where(r6 == p, A, 0.0), axis=0)   # (6,)
                row_q = jnp.sum(jnp.where(r6 == q, A, 0.0), axis=0)
                app, aqq, apq = row_p[p], row_q[q], row_p[q]
                small = jnp.abs(apq) <= 1e-30
                safe_apq = jnp.where(small, 1.0, apq)
                tau = (aqq - app) / (2.0 * safe_apq)
                sgn = jnp.where(tau < 0, -1.0, 1.0)
                t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(small, 0.0, t)
                cth = jax.lax.rsqrt(1.0 + t * t)
                sth = t * cth
                ep = (iv == p).astype(f32)
                eq = (iv == q).astype(f32)
                G = (eye6
                     + (cth - 1.0) * (ep[:, None] * ep[None, :]
                                      + eq[:, None] * eq[None, :])
                     + sth * (ep[:, None] * eq[None, :])
                     - sth * (eq[:, None] * ep[None, :]))
                A = _dot(G.T, _dot(A, G))
                V = _dot(V, G)
    w = jnp.sum(jnp.where(r6 == c6, A, 0.0), axis=1)
    return w, V


def _sort_eig6(w, V):
    """Sort eigen-pairs ascending by eigenvalue (bubble network, 15 exact
    compare-exchanges).  The reference guard's row-zeroing quirk makes the
    result depend on eigenvalue ORDER, and eigh/Eigen sort ascending — so
    the kernel must too."""
    f32 = jnp.float32
    r6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 0)
    c6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 1)
    iv = jax.lax.broadcasted_iota(jnp.int32, (6, 1), 0)[:, 0]
    for rnd in range(5):
        for j in range(5 - rnd):
            wj, wj1 = w[j], w[j + 1]
            swap = wj > wj1
            lo = jnp.where(swap, wj1, wj)
            hi = jnp.where(swap, wj, wj1)
            w = jnp.where(iv == j, lo, jnp.where(iv == j + 1, hi, w))
            colj = jnp.sum(jnp.where(c6 == j, V, 0.0), axis=1)
            colj1 = jnp.sum(jnp.where(c6 == j + 1, V, 0.0), axis=1)
            newj = jnp.where(swap, colj1, colj)
            newj1 = jnp.where(swap, colj, colj1)
            V = jnp.where(c6 == j, newj[:, None],
                          jnp.where(c6 == j + 1, newj1[:, None], V))
    return w, V


def jacobi_guard_head(H6, dx6, D):
    """The degeneracy guard (esekfom.hpp:1736-1744 intent) on the 6-dim
    pose head, in-kernel: the spectral projector ``V·diag(m)·Vᵀ·dx6``
    (m = eigenvalue ≥ D mask) — sign/basis-invariant, identical to
    models/iekf._degeneracy_guard's eigh branch (see its docstring for the
    documented divergence from the reference's sign-dependent row quirk).
    The near-singular ``prod(w) < 1e-20`` branch zeroes components by
    ascending-eigenvalue index, hence the sort.

    Returns ``(guarded_dx6 (6,), min_eig ())`` — min_eig is the exact
    smallest eigenvalue of the pose block, the telemetry behind
    DebugOutput.guard_fired (min_eig < D ⇔ the guard zeroed something;
    the Gershgorin bound is hugely negative on ordinary geometry and
    carries no signal — ADVICE r3)."""
    w, V = _sort_eig6(*_jacobi_eigh6(H6))
    m = (w >= D).astype(jnp.float32)
    # column-vector matmuls (a (6,6)@(6,) matvec mixing scalar-built and
    # lane-sliced operands hits the Mosaic relayout bug — see _bx_dot)
    g = _dot(V * m[None, :], _dot(V.T, dx6[:, None]))[:, 0]
    # explicit product: Mosaic has no reduce_prod lowering
    w_prod = w[0] * w[1] * w[2] * w[3] * w[4] * w[5]
    use_I = w_prod < 1e-20
    g = jnp.where(use_I, m * dx6, g)
    min_eig = jnp.min(w)
    # all-pass must be bit-clean (the projector equals I only up to FP noise)
    return jnp.where(min_eig >= D, dx6, g), min_eig


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _iter_core(HTH, HTh, P, dx, state_scalars, gp, inv_R, guard_D=None):
    """One full update-iteration's algebra as pure register math.

    ``state_scalars`` = (pos, rot, rot_LI, t_LI, vel, bg, ba, grav) as
    scalar-built stacks; ``P`` is P_prop; ``dx`` = x ⊟ x_prop (NS,).
    Returns ``(xn (XF,), Pf (NS,NS), dx_ (NS,), gersh_min (), min_eig ())``
    (min_eig = +inf when ``guard_D is None`` — no eigensolve ran).

    ``guard_D=None`` (single-iteration kernel): the fast-path identity-
    degeneracy-guard assumption — the caller must check ``gersh_min`` and
    fall back when it cannot certify.  With ``guard_D`` set (whole-loop
    kernel): the EXACT reference guard runs in-kernel via the Jacobi eigh
    (`jacobi_guard_head`); the boxplus uses the guarded head while the
    convergence vector dx_ and the J₂ chart arguments stay pre-guard
    (esekfom.hpp:1749-1756 tests convergence on the unguarded update)."""
    f32 = jnp.float32
    pos, rot, rot_LI, t_LI, vel, bg, ba, grav = state_scalars

    # ---- chart projection J₁ (iekf._chart_project_P) ----
    A1 = _A_matrix(dx[3:6]).T
    A2 = _A_matrix(dx[6:9]).T
    res2 = _dot(_nx_yy(grav), _mx(gp, dx[21:23]))
    J1 = _block_J(A1, A2, res2)
    dx_new = _dot(J1, dx)                             # (NS,)
    P_it = _dot(_dot(J1, P), J1.T)                    # (NS, NS)

    # ---- gain (shared algebra with ops/gain.py) ----
    K_x, K_h, K = gain_math(HTH, HTh, P_it[:, 0:M], inv_R)

    # ---- dx_ = K_h + (K_x_full − I)·dx_new ----
    dx_ = K_h + _dot(K_x, dx_new[0:M]) - dx_new       # (NS,)

    # ---- Gershgorin lower bound on eig(HᵀH[0:6,0:6]) ----
    r6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 0)
    c6 = jax.lax.broadcasted_iota(jnp.int32, (6, 6), 1)
    H6 = HTH[0:6, 0:6]
    diag6 = jnp.sum(jnp.where(r6 == c6, H6, 0.0), axis=1)
    radii = jnp.sum(jnp.abs(H6), axis=1) - jnp.abs(diag6)
    gersh = jnp.min(diag6 - radii)

    # ---- boxplus ----
    # dx_ leaves the vector domain here: lane-sliced (3,) segments added to
    # scalar-built stacks hit the same Mosaic relayout bug as _bx_dot, so
    # extract once into scalars.
    d = [dx_[i] for i in range(NS)]
    dr = jnp.stack(d[3:6])        # rot delta (scalar-built)
    if guard_D is None:
        # fast path: assume guard == identity (caller certifies via gersh)
        dh = d[0:6]
        dr_plus = dr
        min_eig = jnp.asarray(jnp.inf, f32)
    else:
        # exact in-kernel reference guard on the 6-dim pose head
        head, min_eig = jacobi_guard_head(HTH[0:6, 0:6], jnp.stack(d[0:6]),
                                          guard_D)
        dh = [head[i] for i in range(6)]
        dr_plus = jnp.stack(dh[3:6])
    de = jnp.stack(d[6:9])        # extrinsic-rot delta
    dg = jnp.stack(d[21:23])      # grav delta
    rot_n = _quat_mul(rot, _exp_quat(dr_plus))
    rot_LI_n = _quat_mul(rot_LI, _exp_quat(de))
    grav_n = _s2_boxplus(grav, dg)
    xn = jnp.stack([
        pos[0] + dh[0], pos[1] + dh[1], pos[2] + dh[2],
        rot_n[0], rot_n[1], rot_n[2], rot_n[3],
        rot_LI_n[0], rot_LI_n[1], rot_LI_n[2], rot_LI_n[3],
        t_LI[0] + d[9], t_LI[1] + d[10], t_LI[2] + d[11],
        vel[0] + d[12], vel[1] + d[13], vel[2] + d[14],
        bg[0] + d[15], bg[1] + d[16], bg[2] + d[17],
        ba[0] + d[18], ba[1] + d[19], ba[2] + d[20],
        grav_n[0], grav_n[1], grav_n[2],
    ])

    # ---- terminal covariance in JOSEPH form (iekf._final_P): exact for
    # any gain and PSD-preserving — the reference's optimal-gain shortcut
    # L − K_x·P loses definiteness under f32 gain error (see iekf.py) ----
    rN = jax.lax.broadcasted_iota(jnp.int32, (NS, NS), 0)
    cN = jax.lax.broadcasted_iota(jnp.int32, (NS, NS), 1)
    eyeNN = (rN == cN).astype(f32)
    # A = I − [K_x | 0]: subtract K_x into the first M columns
    rS = jax.lax.broadcasted_iota(jnp.int32, (M, NS), 0)
    cS = jax.lax.broadcasted_iota(jnp.int32, (M, NS), 1)
    S_M = (cS == rS).astype(f32)                      # (M, NS) col selector
    Afull = eyeNN - _dot(K_x, S_M)                    # (NS, NS)
    M0 = _dot(_dot(Afull, P_it), Afull.T) \
        + (1.0 / inv_R) * _dot(K, K.T)
    A3 = _A_matrix(dr).T
    A4 = _A_matrix(de).T
    res2f = _dot(_nx_yy(grav_n), _mx(gp, dg))
    J2 = _block_J(A3, A4, res2f)
    Pf = _dot(_dot(J2, M0), J2.T)
    return xn, 0.5 * (Pf + Pf.T), dx_, gersh, min_eig


def _body_kernel(HTH_ref, HTh_ref, P_ref, dx_ref, sc_ref,
                 xn_ref, Pf_ref, dxp_ref, gm_ref):
    # flattened state x + x_prop.grav + 1/R + D from SMEM
    xs = [sc_ref[0, i] for i in range(XF)]
    state_scalars = (
        jnp.stack(xs[0:3]), jnp.stack(xs[3:7]), jnp.stack(xs[7:11]),
        jnp.stack(xs[11:14]), jnp.stack(xs[14:17]), jnp.stack(xs[17:20]),
        jnp.stack(xs[20:23]), jnp.stack(xs[23:26]))
    gp = jnp.stack([sc_ref[0, XF + i] for i in range(3)])   # x_prop.grav
    inv_R = sc_ref[0, XF + 3]
    D = sc_ref[0, XF + 4]

    xn, Pf, dx_, gersh, min_eig = _iter_core(
        HTH_ref[:, :], HTh_ref[0, :], P_ref[:, :], dx_ref[0, :],
        state_scalars, gp, inv_R, guard_D=D)
    xn_ref[0, :] = xn
    Pf_ref[:, :] = Pf
    dxp_ref[0, :] = dx_
    gm_ref[0, 0] = gersh
    gm_ref[0, 1] = min_eig


@functools.partial(jax.jit, static_argnames=("interpret",))
def update_body_tpu(HTH, HTh, P, x: st.NavState, x_prop: st.NavState, R, D,
                    *, interpret: bool = False):
    """One fused update-iteration body on TPU, incl. the EXACT degeneracy
    guard (in-kernel Jacobi eigh — see `jacobi_guard_head`).

    Returns ``(x_next (NavState), P_fin (23,23), dx_ (23,), gersh_min (),
    min_eig ())`` — gersh_min is conditioning telemetry only (the round-2
    design used it to certify a guard-free fast path, but on the real bench
    geometry the Gershgorin bound is hugely negative on EVERY scan while
    the true eigenvalues are fine, so certification never engaged and every
    iteration paid the jnp eigh fallback; the in-kernel guard removes that
    path entirely); min_eig is the exact smallest pose-block eigenvalue
    from the in-kernel Jacobi solve (min_eig < D ⇔ the guard zeroed
    directions).
    """
    f32 = jnp.float32
    dx = st.boxminus(x, x_prop).astype(f32)
    sc = jnp.concatenate([
        st.as_vector(x).astype(f32), x_prop.grav.astype(f32),
        jnp.asarray(1.0 / R, f32)[None], jnp.asarray(D, f32)[None],
        jnp.zeros(1, f32)])[None, :]  # (1,32)

    xn, Pf, dxp, gm = pl.pallas_call(
        _body_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 2), memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, XF), f32),
                   jax.ShapeDtypeStruct((NS, NS), f32),
                   jax.ShapeDtypeStruct((1, NS), f32),
                   jax.ShapeDtypeStruct((1, 2), f32)),
        interpret=interpret,
    )(HTH.astype(f32), HTh.astype(f32)[None, :], P.astype(f32), dx[None, :],
      sc)
    return st.from_vector(xn[0]), Pf, dxp[0], gm[0, 0], gm[0, 1]
