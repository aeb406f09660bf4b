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

In-kernel EXACT window re-match (round 5).  With a window pack
(`pack_window`) the kernel runs, per iteration, the full re-match over
each query's frozen candidate WINDOW (top-W of its 8-block cube, W =
measurement.window_size(k), resolved once at the predicted pose): true
distances at the current
iterate, exact k-smallest selection (ties → lowest slot, like lax.top_k),
a fresh in-kernel plane fit (ops/plane_kernel.fit_math), the close /
dynamic-object gates, and the MAX_NUM_MATCHES cap (inclusive point-order
cumsum via two triangular matmuls + a row-prefix chain).  This IS the
reference's re-match-every-iteration semantics (use-ikfom.cpp:10-31)
whenever the per-query staleness certificates hold — the same certs as
measurement._stale_mask: no candidate from outside the window can enter
the top-k (gap d_W − d_k vs displacement) and block crossings keep
coverage (voxel_size − leave).  Any violation over any active iteration
sets ok=False and the caller re-runs the exact per-iteration jnp loop
(which re-gathers on staleness).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops.hstats import glob_math, stats_math
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


class Window(NamedTuple):
    """Static window re-match parameters (hashable → jit-static)."""

    k: int
    W: int
    voxel_size: float
    max_dist_plane: float
    plane_threshold: float
    max_num_matches: int
    dynamic_gate: float


def pack_window(pc, pc_valid, nbrs_w, vld_w, cnt_w):
    """((5+3W)·Nr, 128) channel stack for the window re-match loop kernel:
    [px py pz pc_valid cnt | wx0 wy0 wz0 | wx1 … ].  Window slots are
    distance-ascending from the frozen resolve, so slot j is valid ⇔
    j < cnt; invalid-slot coords are zeroed (the kernel masks by cnt).
    Bands / d_Wmax are NOT packed — the kernel re-derives them from
    iteration 0's glob (the iterate STARTS at the resolve pose)."""
    f32 = jnp.float32
    N, W, _ = nbrs_w.shape
    pad = (-N) % 128
    Nr = (N + pad) // 128

    def chanpad(x):
        x = x.astype(f32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros(pad, f32)])
        return x.reshape(Nr, 128)

    safe = jnp.where(vld_w[..., None], nbrs_w, 0.0)
    chans = [chanpad(pc[:, 0]), chanpad(pc[:, 1]), chanpad(pc[:, 2]),
             chanpad(pc_valid.astype(f32)), chanpad(cnt_w.astype(f32))]
    for j in range(W):
        chans.append(chanpad(safe[:, j, 0]))
        chans.append(chanpad(safe[:, j, 1]))
        chans.append(chanpad(safe[:, j, 2]))
    return jnp.concatenate(chans)


_BIG = 3.0e38


def _window_match_math(px, py, pz, pvld, cnt, wx, wy, wz, glob, it: int,
                       frozen, win: Window):
    """One iteration's EXACT window re-match on channel tiles.

    Returns ``(plane channels (ux,uy,uz,d), keep, badq, frozen')`` where
    ``frozen`` carries (g0, b0, band, d_wmax_d) captured at iteration 0 and
    ``badq`` is the per-query staleness (measurement._stale_mask twin)."""
    from fast_limo_tpu.ops.plane_kernel import fit_math

    f32 = jnp.float32
    k, W = win.k, win.W
    h = f32(win.voxel_size)
    gx, gy, gz = glob

    d2 = []
    for j in range(W):
        slot_ok = cnt > f32(j) + 0.5                # j < cnt (integer cnt)
        dxj, dyj, dzj = gx - wx[j], gy - wy[j], gz - wz[j]
        d2.append(jnp.where(slot_ok, dxj * dxj + dyj * dyj + dzj * dzj,
                            f32(_BIG)))

    if it == 0:
        dmax = d2[0]
        for j in range(1, W):
            dmax = jnp.maximum(dmax, d2[j])
        b0 = []
        band = []
        for g in (gx, gy, gz):
            v = jnp.floor(g / h)
            b = jnp.floor((v - 1.0) * 0.5)
            lo = (2.0 * b + 1.0) * h
            b0.append(b)
            band.append((lo, lo + 2.0 * h))
        frozen = ((gx, gy, gz), tuple(b0), tuple(band), jnp.sqrt(dmax))

    # ---- exact k-smallest selection (ties → lowest slot, like top_k) ----
    taken = [jnp.zeros_like(gx) > 0 for _ in range(W)]
    sxs, sys_, szs, svs = [], [], [], []
    kth = None
    for _i in range(k):
        m = jnp.where(taken[0], f32(_BIG), d2[0])
        for j in range(1, W):
            m = jnp.minimum(m, jnp.where(taken[j], f32(_BIG), d2[j]))
        found = jnp.zeros_like(gx) > 0
        sx = jnp.zeros_like(gx)
        sy = jnp.zeros_like(gx)
        sz = jnp.zeros_like(gx)
        for j in range(W):
            pj = (~taken[j]) & (d2[j] == m) & (~found) & (m < f32(_BIG))
            taken[j] = taken[j] | pj
            found = found | pj
            sx = jnp.where(pj, wx[j], sx)
            sy = jnp.where(pj, wy[j], sy)
            sz = jnp.where(pj, wz[j], sz)
        sxs.append(sx)
        sys_.append(sy)
        szs.append(sz)
        svs.append(found.astype(f32))
        kth = m

    ux, uy, uz, dpl, good = fit_math(
        sxs, sys_, szs, svs, kth, k=k, num_match_points=k,
        max_dist_plane=win.max_dist_plane,
        plane_threshold=win.plane_threshold)
    good = good & (pvld > 0)

    if win.dynamic_gate > 0:
        ad = jnp.abs(ux * gx + uy * gy + uz * gz + dpl)
        gf = good.astype(f32)
        m1 = jnp.sum(ad * gf) / jnp.maximum(jnp.sum(gf), 1.0)
        trim = jnp.where(ad <= 3.0 * m1 + 0.05, gf, 0.0)
        m2v = jnp.sum(ad * trim) / jnp.maximum(jnp.sum(trim), 1.0)
        tau = jnp.maximum(f32(win.dynamic_gate) * m2v, f32(0.05))
        good = good & (ad <= tau)

    # ---- MAX_NUM_MATCHES cap: inclusive point-order cumsum.  Lane prefix
    # via a strictly-lower-triangular (128,128) matmul; row prefix via an
    # (Nr,Nr) triangular matmul on the row sums — exact (counts < 2^24) ----
    goodf = good.astype(f32)
    Nr = goodf.shape[0]
    rowsum = jnp.sum(goodf, axis=1, keepdims=True)               # (Nr,1)
    rT = (jax.lax.broadcasted_iota(jnp.int32, (Nr, Nr), 0)
          > jax.lax.broadcasted_iota(jnp.int32, (Nr, Nr), 1)).astype(f32)
    row_excl = jnp.dot(rT, rowsum, preferred_element_type=f32)   # (Nr,1)
    lU = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
          < jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)).astype(f32)
    lane_excl = jnp.dot(goodf, lU, preferred_element_type=f32)   # (Nr,128)
    cum = row_excl + lane_excl + goodf
    keep = good & (cum <= f32(win.max_num_matches))

    # ---- staleness certificates (trivially clean at iteration 0) ----
    if it == 0:
        badq = jnp.zeros_like(gx) > 0
    else:
        (g0x, g0y, g0z), b0, band, d_wmax_d = frozen
        ddx, ddy, ddz = gx - g0x, gy - g0y, gz - g0z
        delta = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
        kth_d = jnp.sqrt(kth)
        # the cnt<W clause is LOAD-BEARING (jnp _stale_mask twin): a
        # partial window means the whole cube is inside it — no outside-
        # window candidate exists.  Without it, sparse/frontier queries
        # (kth = BIG ≥ d_wmax = BIG) would read stale on every scan.
        cert_a = (cnt < f32(W) - 0.5) | (kth_d < d_wmax_d - delta)
        b0same = jnp.ones_like(gx) > 0
        leave = jnp.zeros_like(gx)
        for g, b, (lo, hi) in zip((gx, gy, gz), b0, band):
            v = jnp.floor(g / h)
            b0same = b0same & (jnp.floor((v - 1.0) * 0.5) == b)
            leave = jnp.maximum(leave, jnp.maximum(lo - g, g - hi))
        cert_b = kth_d < h - jnp.maximum(leave, 0.0)
        badq = (pvld > 0) & ~(cert_a & (b0same | cert_b))

    return (ux, uy, uz, dpl), keep, badq, frozen


def _loop_kernel(X_ref, P_ref, sc_ref, xn_ref, Pf_ref, aux_ref,
                 *, estimate_extrinsics: bool, Nr: int, max_iters: int,
                 window):
    f32 = jnp.float32
    if window is None:
        chans = tuple(X_ref[i * Nr:(i + 1) * Nr, :] for i in range(8))
    else:
        W = window.W
        ch = lambda i: X_ref[i * Nr:(i + 1) * Nr, :]
        px, py, pz, pvld, cnt = ch(0), ch(1), ch(2), ch(3), ch(4)
        wx = [ch(5 + 3 * j) for j in range(W)]
        wy = [ch(5 + 3 * j + 1) for j in range(W)]
        wz = [ch(5 + 3 * j + 2) for j in range(W)]
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
    bad_total = jnp.asarray(0.0, f32)

    frozen = None
    for it in range(max_iters + 1):
        xs = [x[i] for i in range(XF)]
        state_scalars = (
            jnp.stack(xs[0:3]), jnp.stack(xs[3:7]), jnp.stack(xs[7:11]),
            jnp.stack(xs[11:14]), jnp.stack(xs[14:17]), jnp.stack(xs[17:20]),
            jnp.stack(xs[20:23]), jnp.stack(xs[23:26]))
        hs = xs[3:7] + xs[0:3] + xs[7:11] + xs[11:14]   # rot pos rotLI tLI
        if window is None:
            HTH, HTh = stats_math(chans, hs,
                                  estimate_extrinsics=estimate_extrinsics)
        else:
            glob = glob_math(px, py, pz, hs)
            (ux, uy, uz, dpl), keep, badq, frozen = _window_match_math(
                px, py, pz, pvld, cnt, wx, wy, wz, glob, it, frozen, window)
            nbad = jnp.sum(badq.astype(f32))
            ok = ok & (done | (nbad == 0.0))
            bad_total = bad_total + jnp.where(done, 0.0, nbad)
            HTH, HTh = stats_math(
                (px, py, pz, ux, uy, uz, dpl, keep.astype(f32)), hs,
                estimate_extrinsics=estimate_extrinsics, glob=glob)
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
    aux_ref[0, 4] = bad_total        # stale-query telemetry (window mode)
    aux_ref[0, 5] = 0.0
    aux_ref[0, 6] = 0.0
    aux_ref[0, 7] = 0.0


@functools.partial(jax.jit, static_argnames=(
    "estimate_extrinsics", "max_iters", "window", "with_aux", "interpret"))
def update_loop_tpu(X, P, x_prop: st.NavState, R, D, limit, *,
                    max_iters: int, estimate_extrinsics: bool,
                    window: Window = None, with_aux: bool = False,
                    interpret: bool = False):
    """All masked update iterations in one launch.

    ``X`` is either the frozen-correspondence channel pack
    (hstats.pack_inputs; ``window=None`` — frozen-stats mode) or the
    window pack (`pack_window` + a `Window` parameter tuple — the EXACT
    per-iteration window re-match, module docstring).
    Returns ``(x_next (NavState), P_fin (23,23), n_iters (), ok (),
    gersh_min (), min_eig ())`` — the degeneracy guard runs EXACTLY
    in-kernel (Jacobi eigh), so ``ok`` certifies the atan-series regime of
    the in-kernel boxminus AND (window mode) the staleness certificates of
    every active iteration; when False the caller must re-run the exact
    per-iteration jnp loop.  ``gersh_min`` is conditioning telemetry (the
    Gershgorin lower bound on the pose block, min over active iterations);
    ``min_eig`` is the exact smallest pose-block eigenvalue over active
    iterations (min_eig < D ⇔ the guard zeroed directions).
    """
    f32 = jnp.float32
    Nr = X.shape[0] // (8 if window is None else 5 + 3 * window.W)
    sc = jnp.concatenate([
        st.as_vector(x_prop).astype(f32),
        jnp.asarray(1.0 / R, f32)[None],
        jnp.asarray(limit, f32)[None],
        jnp.asarray(D, f32)[None],
        jnp.zeros(3, f32)])[None, :]                  # (1, 32)

    xn, Pf, aux = pl.pallas_call(
        functools.partial(_loop_kernel,
                          estimate_extrinsics=estimate_extrinsics,
                          Nr=Nr, max_iters=max_iters, window=window),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8), memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, XF), f32),
                   jax.ShapeDtypeStruct((NS, NS), f32),
                   jax.ShapeDtypeStruct((1, 8), f32)),
        interpret=interpret,
    )(X.astype(f32), P.astype(f32), sc)

    n_iters = aux[0, 0].astype(jnp.int32)
    ok = aux[0, 1] > 0
    if with_aux:   # probes: aux[0,4] = summed stale count over iterations
        return (st.from_vector(xn[0]), Pf, n_iters, ok, aux[0, 2],
                aux[0, 3], aux)
    return st.from_vector(xn[0]), Pf, n_iters, ok, aux[0, 2], aux[0, 3]
