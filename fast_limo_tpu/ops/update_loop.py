"""Whole iterated-update loop as ONE Pallas TPU launch.

The round-2 profile (ROADMAP.md) shows the iterated update at ~1.5 ms/scan
— launch-overhead dominated: per masked iteration the pipeline pays two
Pallas launches (hstats + update body), a boxminus fusion chain, and the
``lax.cond`` glue, while the math itself is ~0.01 ms.  This kernel runs ALL
``MAX_NUM_ITERS+1`` masked iterations of `iekf.update_iterated` — including
the per-iteration measurement statistics (ops/hstats.stats_math over the
frozen-correspondence channel pack) and the fused iteration body
(ops/update_body._iter_core) — in a single launch (reference loop:
esekfom.hpp:1620-1823).

In-kernel boxminus.  The iterate-vs-prior chart difference needs SO3/S2
logs, whose reference forms use ``atan2`` — which Mosaic does not lower.
Between update iterations the rotation/gravity corrections are small (the
loop converges at LIMITS=1e-3 rad), so the kernel evaluates
``atan(z) = z − z³/3 + … + z¹³/13`` (|err| < 6e-11 at z = 0.25, far below
f32 rounding) and certifies validity with ``z² ≤ 0.0625`` (half-angle
≤ ~14°, i.e. correction ≤ ~28°).  When the certificate fails, the caller
re-runs the exact jnp loop (true atan2) via ``lax.cond`` — identical
semantics, paid only on genuinely abnormal scans.

In-kernel degeneracy guard.  Unlike the single-iteration kernel (whose
Gershgorin certificate merely detects the degenerate case), this kernel
runs the reference's eigh guard EXACTLY via an in-kernel 6×6 Jacobi
eigensolve with ascending sort (ops/update_body.jacobi_guard_head) —
degenerate scans stay on the fast path.

In-kernel re-match certificate (round 5, ``with_cert``).  The pack's 9th
channel carries per-query squared stability margins (models/measurement.py
docstring: voxel-band, kNN-set, close-gate and dynamic-gate margins); each
iteration the kernel measures every point's world-frame displacement from
the frozen-resolve pose (iteration 0's glob — the iterate STARTS at
x_prop, where the correspondences were resolved) and ANDs
``disp² < margin²`` into ``ok``.  While the certificate holds, a full
per-iteration re-match would reproduce the frozen correspondences and
gates exactly, so the frozen pack IS the reference's re-match-every-
iteration semantics; when it fails the caller re-runs the exact
per-iteration loop (whose own certified fast path falls back to a true
re-gather per iteration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops.hstats import stats_math
from fast_limo_tpu.ops.update_body import (
    NS, M, XF, _TOL, _bx, _iter_core, _quat_mul)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_Z2_MAX = 0.0625        # atan-series validity: z = tan(θ/2) ≤ 0.25


def _atan_series(z):
    """atan(z) for |z| ≤ 0.25 (odd series to z¹³; |err| < 6e-11)."""
    z2 = z * z
    acc = jnp.float32(1.0 / 13.0)
    for c in (1.0 / 11.0, 1.0 / 9.0, 1.0 / 7.0, 1.0 / 5.0, 1.0 / 3.0, 1.0):
        acc = jnp.float32(c) - z2 * acc
    return z * acc


def _quat_conj(q):
    return jnp.stack([q[0], -q[1], -q[2], -q[3]])


def _log_quat(q):
    """so3.log_quat clone (MTK SO3 log) with series atan; returns (vec, ok)."""
    w = q[0]
    vx, vy, vz = q[1], q[2], q[3]
    n2 = vx * vx + vy * vy + vz * vz
    n = jnp.sqrt(n2)
    wa = jnp.abs(w)
    z = n / jnp.maximum(wa, 1e-30)
    ok = z * z <= _Z2_MAX
    angle = 2.0 * _atan_series(z)
    sgn = jnp.where(w < 0, -1.0, 1.0)
    small = n <= _TOL
    safe_w = jnp.where(wa > 1e-30, w, 1.0)
    fac = jnp.where(small, 2.0 / safe_w, sgn * angle / jnp.maximum(n, 1e-30))
    return jnp.stack([fac * vx, fac * vy, fac * vz]), ok


def _s2_boxminus(vec, other):
    """s2.boxminus clone (S2.hpp:144-167) with series atan; (res2, ok).

    ``vec``/``other`` are the current/prior gravity vectors (3,) stacks;
    the angle between them is micro-radians per iteration, so the series
    regime z ≤ 0.25 (≈28°) is certified, never assumed."""
    # hv = other × vec ; v_sin = |vec × other| = |hv| ; v_cos = vec·other
    hx = other[1] * vec[2] - other[2] * vec[1]
    hy = other[2] * vec[0] - other[0] * vec[2]
    hz = other[0] * vec[1] - other[1] * vec[0]
    v_sin = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    v_cos = vec[0] * other[0] + vec[1] * other[1] + vec[2] * other[2]
    z = v_sin / jnp.maximum(v_cos, 1e-30)
    ok = (v_cos > 0) & (z * z <= _Z2_MAX)
    theta = _atan_series(z)
    # res = θ/v_sin · Bx(other)ᵀ · hv  (→ 0 smoothly as v_sin → 0)
    fac = jnp.where(v_sin > _TOL, theta / jnp.maximum(v_sin, 1e-30),
                    1.0 / jnp.maximum(v_cos, 1e-30))
    B = _bx(other)                                        # (3,2)
    r0 = B[0, 0] * hx + B[1, 0] * hy + B[2, 0] * hz
    r1 = B[0, 1] * hx + B[1, 1] * hy + B[2, 1] * hz
    return jnp.stack([fac * r0, fac * r1]), ok


def _boxminus(xn, xp):
    """st.boxminus clone on (XF,)-stacked states; returns ((NS,), ok)."""
    d = [xn[i] - xp[i] for i in range(XF)]
    q = jnp.stack([xn[3 + i] for i in range(4)])
    qp = jnp.stack([xp[3 + i] for i in range(4)])
    drot, ok1 = _log_quat(_quat_mul(_quat_conj(qp), q))
    e = jnp.stack([xn[7 + i] for i in range(4)])
    ep = jnp.stack([xp[7 + i] for i in range(4)])
    dext, ok2 = _log_quat(_quat_mul(_quat_conj(ep), e))
    g = jnp.stack([xn[23 + i] for i in range(3)])
    gp = jnp.stack([xp[23 + i] for i in range(3)])
    dgrav, ok3 = _s2_boxminus(g, gp)
    dx = jnp.stack([
        d[0], d[1], d[2],                    # pos
        drot[0], drot[1], drot[2],
        dext[0], dext[1], dext[2],
        d[11], d[12], d[13],                 # t_LI
        d[14], d[15], d[16],                 # vel
        d[17], d[18], d[19],                 # bg
        d[20], d[21], d[22],                 # ba
        dgrav[0], dgrav[1],
    ])
    return dx, ok1 & ok2 & ok3


def _loop_kernel(X_ref, P_ref, sc_ref, xn_ref, Pf_ref, aux_ref,
                 *, estimate_extrinsics: bool, Nr: int, max_iters: int,
                 with_cert: bool):
    f32 = jnp.float32
    chans = tuple(X_ref[i * Nr:(i + 1) * Nr, :] for i in range(8))
    m2 = X_ref[8 * Nr:9 * Nr, :] if with_cert else None
    xp = [sc_ref[0, i] for i in range(XF)]           # x_prop flattened
    inv_R = sc_ref[0, XF]
    limit = sc_ref[0, XF + 1]
    D = sc_ref[0, XF + 2]
    gp = jnp.stack(xp[23:26])                        # x_prop.grav
    P = P_ref[:, :]

    # loop state (the iterate starts AT x_prop, so dx starts exactly 0)
    x = jnp.stack(xp)                                # (XF,)
    dx = jnp.zeros((NS,), f32)
    P_out = P
    done = jnp.asarray(False)
    ok = jnp.asarray(True)
    t = jnp.asarray(0, jnp.int32)
    nit = jnp.asarray(0, jnp.int32)
    gersh_min = jnp.asarray(jnp.inf, f32)
    min_eig = jnp.asarray(jnp.inf, f32)

    g0 = None
    for it in range(max_iters + 1):
        xs = [x[i] for i in range(XF)]
        state_scalars = (
            jnp.stack(xs[0:3]), jnp.stack(xs[3:7]), jnp.stack(xs[7:11]),
            jnp.stack(xs[11:14]), jnp.stack(xs[14:17]), jnp.stack(xs[17:20]),
            jnp.stack(xs[20:23]), jnp.stack(xs[23:26]))
        hs = xs[3:7] + xs[0:3] + xs[7:11] + xs[11:14]   # rot pos rotLI tLI
        if with_cert:
            HTH, HTh, glob = stats_math(
                chans, hs, estimate_extrinsics=estimate_extrinsics,
                with_glob=True)
            if it == 0:
                # the iterate STARTS at x_prop == the frozen-resolve pose,
                # so iteration 0's glob IS the resolve-time glob0
                g0 = glob
            else:
                disp2 = ((glob[0] - g0[0]) ** 2 + (glob[1] - g0[1]) ** 2
                         + (glob[2] - g0[2]) ** 2)
                bad = jnp.sum(jnp.where(disp2 >= m2, 1.0, 0.0))
                ok = ok & (done | (bad == 0.0))
        else:
            HTH, HTh = stats_math(chans, hs,
                                  estimate_extrinsics=estimate_extrinsics)
        xn, Pf, dx_, gersh, me = _iter_core(
            HTH, HTh, P, dx, state_scalars, gp, inv_R, guard_D=D)

        conv = jnp.max(jnp.abs(dx_)) <= limit
        t_next = t + conv.astype(jnp.int32)
        done_now = (t_next > 1) | (it == max_iters)

        dx_next, bm_ok = _boxminus(xn, xp)

        # masked commits: a finished loop freezes everything
        x = jnp.where(done, x, xn)
        dx = jnp.where(done, dx, dx_next)
        P_out = jnp.where(~done & done_now, Pf, P_out)
        t = jnp.where(done, t, t_next)
        nit = jnp.where(done, nit, it + 1)
        ok = ok & (done | bm_ok)
        gersh_min = jnp.where(done, gersh_min, jnp.minimum(gersh_min, gersh))
        min_eig = jnp.where(done, min_eig, jnp.minimum(min_eig, me))
        done = done | done_now

    xn_ref[0, :] = x
    Pf_ref[:, :] = P_out
    aux_ref[0, 0] = nit.astype(f32)
    aux_ref[0, 1] = ok.astype(f32)
    aux_ref[0, 2] = gersh_min
    aux_ref[0, 3] = min_eig


@functools.partial(jax.jit, static_argnames=(
    "estimate_extrinsics", "max_iters", "with_cert", "interpret"))
def update_loop_tpu(X, P, x_prop: st.NavState, R, D, limit, *,
                    max_iters: int, estimate_extrinsics: bool,
                    with_cert: bool = False, interpret: bool = False):
    """All masked update iterations in one launch.

    ``X`` is the frozen-correspondence channel pack (hstats.pack_inputs);
    with ``with_cert`` a 9th channel block carries the per-query squared
    re-match stability margins (measurement.make_h_model).
    Returns ``(x_next (NavState), P_fin (23,23), n_iters (), ok (),
    gersh_min (), min_eig ())`` — the degeneracy guard runs EXACTLY
    in-kernel (Jacobi eigh), so ``ok`` certifies the atan-series regime of
    the in-kernel boxminus AND (with_cert) the re-match stability of every
    iteration; when False the caller must re-run the exact per-iteration
    jnp loop.  ``gersh_min`` is conditioning telemetry (the Gershgorin
    lower bound on the pose block, min over active iterations); ``min_eig``
    is the exact smallest pose-block eigenvalue over active iterations
    (min_eig < D ⇔ the guard zeroed directions).
    """
    f32 = jnp.float32
    Nr = X.shape[0] // (9 if with_cert else 8)
    sc = jnp.concatenate([
        st.as_vector(x_prop).astype(f32),
        jnp.asarray(1.0 / R, f32)[None],
        jnp.asarray(limit, f32)[None],
        jnp.asarray(D, f32)[None],
        jnp.zeros(3, f32)])[None, :]                  # (1, 32)

    xn, Pf, aux = pl.pallas_call(
        functools.partial(_loop_kernel,
                          estimate_extrinsics=estimate_extrinsics,
                          Nr=Nr, max_iters=max_iters, with_cert=with_cert),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 4), memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, XF), f32),
                   jax.ShapeDtypeStruct((NS, NS), f32),
                   jax.ShapeDtypeStruct((1, 4), f32)),
        interpret=interpret,
    )(X.astype(f32), P.astype(f32), sc)

    n_iters = aux[0, 0].astype(jnp.int32)
    ok = aux[0, 1] > 0
    return st.from_vector(xn[0]), Pf, n_iters, ok, aux[0, 2], aux[0, 3]
