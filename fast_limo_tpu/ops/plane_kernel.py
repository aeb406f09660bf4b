"""Fused plane-fit kernel: centroid-PCA fit + gates in ONE launch.

The jnp `ops/plane.fit_planes` costs ~0.30 ms on the v5e for 10k queries —
a chain of small einsum/elementwise fusions over (N,k,3).  This kernel runs
the identical math on (Nr,128) channel tiles: centroid, centered 3×3
scatter, closed-form symmetric eigenvalues (trigonometric method with a
Hastings arccos polynomial — Mosaic has no acos; |err| < 2e-7 rad, far
below the gate thresholds), the largest-cross-product null vector, and all
validity gates (enough-points, kth-squared-distance, residuals, planarity
spread).

`plane.fit_planes` dispatches here on TPU f32 (kernel name "plane");
the jnp path is the identical-semantics fallback/oracle.
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


def _acos(x):
    """Hastings arccos for x ∈ [−1, 1] (|err| < 2e-7 rad; Mosaic has no
    native acos).  acos(−x) = π − acos(x) handles the negative range."""
    ax = jnp.clip(jnp.abs(x), 0.0, 1.0)
    p = jnp.float32(-0.0012624911)
    for c in (0.0066700901, -0.0170881256, 0.0308918810, -0.0501743046,
              0.0889789874, -0.2145988016, 1.5707963050):
        p = p * ax + jnp.float32(c)
    pos = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0, jnp.float32(3.14159265358979) - pos, pos)


def fit_math(nx, ny, nz, nv, kth, *, k: int, num_match_points: int,
             max_dist_plane: float, plane_threshold: float):
    """The whole fit + gates on channel-tile register values.

    ``nx/ny/nz/nv`` are k-element lists of (Nr,128) tiles (neighbor coords
    + 0/1 validity), ``kth`` the k-th squared distance tile.  Returns
    ``(ux, uy, uz, d, good)`` with coefficients zeroed where gated out.
    Shared by the standalone kernel below and the whole-loop window
    re-match kernel (ops/update_loop.py)."""
    f32 = jnp.float32

    # ---- centroid over valid neighbors (SELECT-masked: invalid slots can
    # carry inf/NaN padding and ·0 would poison the sums) ----
    zero0 = jnp.zeros_like(nx[0])
    keepj = [nv[j] > 0 for j in range(k)]
    mx = [jnp.where(keepj[j], nx[j], zero0) for j in range(k)]
    my = [jnp.where(keepj[j], ny[j], zero0) for j in range(k)]
    mz = [jnp.where(keepj[j], nz[j], zero0) for j in range(k)]
    nw = nv[0]
    for j in range(1, k):
        nw = nw + nv[j]
    n_valid = nw
    nw = jnp.maximum(nw, 1.0)
    cx, cy, cz = mx[0], my[0], mz[0]
    for j in range(1, k):
        cx = cx + mx[j]
        cy = cy + my[j]
        cz = cz + mz[j]
    cx, cy, cz = cx / nw, cy / nw, cz / nw

    # ---- centered scatter matrix (6 unique entries) ----
    m00 = m11 = m22 = m01 = m02 = m12 = jnp.zeros_like(cx)
    qxs, qys, qzs = [], [], []
    for j in range(k):
        qx = jnp.where(keepj[j], mx[j] - cx, zero0)
        qy = jnp.where(keepj[j], my[j] - cy, zero0)
        qz = jnp.where(keepj[j], mz[j] - cz, zero0)
        qxs.append(qx)
        qys.append(qy)
        qzs.append(qz)
        m00 = m00 + qx * qx
        m11 = m11 + qy * qy
        m22 = m22 + qz * qz
        m01 = m01 + qx * qy
        m02 = m02 + qx * qz
        m12 = m12 + qy * qz

    # ---- closed-form eigenvalues (plane._eigvals_sym3 semantics) ----
    p1 = m01 * m01 + m02 * m02 + m12 * m12
    q = (m00 + m11 + m22) / 3.0
    p2 = ((m00 - q) ** 2 + (m11 - q) ** 2 + (m22 - q) ** 2) + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    psafe = jnp.where(p > 0, p, 1.0)
    b00, b11, b22 = (m00 - q) / psafe, (m11 - q) / psafe, (m22 - q) / psafe
    c01, c02, c12 = m01 / psafe, m02 / psafe, m12 / psafe
    detB = (b00 * (b11 * b22 - c12 * c12)
            - c01 * (c01 * b22 - c12 * c02)
            + c02 * (c01 * c12 - b11 * c02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = _acos(r) / 3.0
    two_pi_3 = jnp.float32(2.0943951023931953)
    lmax = q + 2.0 * p * jnp.cos(phi)
    lmin = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lmid = 3.0 * q - lmax - lmin
    iso = p2 <= 0
    lmax = jnp.where(iso, q, lmax)
    lmid = jnp.where(iso, q, lmid)
    lmin = jnp.where(iso, q, lmin)

    # ---- null vector: largest cross product of rows of (M − λmin·I) ----
    a00, a11, a22 = m00 - lmin, m11 - lmin, m22 - lmin
    # rows: r0 = (a00, m01, m02), r1 = (m01, a11, m12), r2 = (m02, m12, a22)
    c01x = m01 * m12 - m02 * a11
    c01y = m02 * m01 - a00 * m12
    c01z = a00 * a11 - m01 * m01
    c02x = m01 * a22 - m02 * m12
    c02y = m02 * m02 - a00 * a22
    c02z = a00 * m12 - m01 * m02
    c12x = a11 * a22 - m12 * m12
    c12y = m12 * m02 - m01 * a22
    c12z = m01 * m12 - a11 * m02
    n01 = c01x * c01x + c01y * c01y + c01z * c01z
    n02 = c02x * c02x + c02y * c02y + c02z * c02z
    n12 = c12x * c12x + c12y * c12y + c12z * c12z
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = n02 >= n12
    bx = jnp.where(use01, c01x, jnp.where(use02, c02x, c12x))
    by = jnp.where(use01, c01y, jnp.where(use02, c02y, c12y))
    bz = jnp.where(use01, c01z, jnp.where(use02, c02z, c12z))
    bestn = jnp.maximum(jnp.maximum(n01, n02), n12)
    bestn = jnp.maximum(bestn, 0.0)
    norm = jnp.sqrt(bestn)
    okn = norm > 1e-20
    inv = 1.0 / jnp.where(okn, norm, 1.0)
    ux, uy, uz = bx * inv, by * inv, bz * inv

    # ---- d ≥ 0 sign convention ----
    d = -(ux * cx + uy * cy + uz * cz)
    flip = jnp.where(d < 0, -1.0, 1.0)
    ux, uy, uz, d = ux * flip, uy * flip, uz * flip, d * flip

    # ---- gates ----
    res_ok = jnp.ones_like(cx) > 0
    for j in range(k):
        res = qxs[j] * ux + qys[j] * uy + qzs[j] * uz
        res_ok = res_ok & (~keepj[j]
                           | (jnp.abs(res) <= jnp.float32(plane_threshold)))
    enough = n_valid >= jnp.float32(num_match_points)
    close = kth < jnp.float32(max_dist_plane)
    spread_ok = lmid > nw * jnp.float32(plane_threshold * plane_threshold)
    finite = (jnp.abs(ux) < jnp.inf) & (jnp.abs(uy) < jnp.inf) \
        & (jnp.abs(uz) < jnp.inf) & (jnp.abs(d) < jnp.inf)
    # jnp-oracle parity: the reference path's multiplicative masking lets a
    # non-finite value in ANY slot (even an invalid one) poison the row's
    # isfinite gate; the select-masked sums here are immune, so re-impose
    # the gate explicitly (only observable when num_match_points < k)
    for j in range(k):
        finite = finite & (jnp.abs(nx[j]) < jnp.inf) \
            & (jnp.abs(ny[j]) < jnp.inf) & (jnp.abs(nz[j]) < jnp.inf)
    good = enough & close & okn & res_ok & spread_ok & finite

    zero = jnp.zeros_like(cx)
    return (jnp.where(good, ux, zero), jnp.where(good, uy, zero),
            jnp.where(good, uz, zero), jnp.where(good, d, zero), good)


def _kernel(X_ref, out_ref, *, Nr: int, k: int, num_match_points: int,
            max_dist_plane: float, plane_threshold: float):
    f32 = jnp.float32
    ch = lambda i: X_ref[i * Nr:(i + 1) * Nr, :]
    # layout: k×(x,y,z) neighbor channels, k validity channels, kth sq-dist
    nx = [ch(3 * j + 0) for j in range(k)]
    ny = [ch(3 * j + 1) for j in range(k)]
    nz = [ch(3 * j + 2) for j in range(k)]
    nv = [ch(3 * k + j) for j in range(k)]
    kth = ch(4 * k)
    ux, uy, uz, d, good = fit_math(
        nx, ny, nz, nv, kth, k=k, num_match_points=num_match_points,
        max_dist_plane=max_dist_plane, plane_threshold=plane_threshold)
    out_ref[0 * Nr:1 * Nr, :] = ux
    out_ref[1 * Nr:2 * Nr, :] = uy
    out_ref[2 * Nr:3 * Nr, :] = uz
    out_ref[3 * Nr:4 * Nr, :] = d
    out_ref[4 * Nr:5 * Nr, :] = good.astype(f32)


@functools.partial(jax.jit, static_argnames=(
    "num_match_points", "max_dist_plane", "plane_threshold", "interpret"))
def fit_planes_tpu(nbrs, sq_dists, nbr_valid, *, num_match_points: int,
                   max_dist_plane: float, plane_threshold: float,
                   interpret: bool = False):
    """Fused plane fit.  Same contract as plane.fit_planes, except the
    returned n_abcd rows are ZERO for gated-out queries (the consumers —
    measurement.h_rows/hstats and the debug dump — mask by ``good`` anyway,
    and zero rows contribute nothing to HᵀH)."""
    f32 = jnp.float32
    N, k, _ = nbrs.shape
    pad = (-N) % _LANES
    Nr = (N + pad) // _LANES

    def chanpad(x):
        x = x.astype(f32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros(pad, f32)])
        return x.reshape(Nr, _LANES)

    chans = []
    for j in range(k):
        chans.append(chanpad(nbrs[:, j, 0]))
        chans.append(chanpad(nbrs[:, j, 1]))
        chans.append(chanpad(nbrs[:, j, 2]))
    for j in range(k):
        chans.append(chanpad(nbr_valid[:, j].astype(f32)))
    kth = (sq_dists[:, num_match_points - 1] if num_match_points <= k
           else jnp.full(N, jnp.finfo(f32).max))
    # NaN kth (padded/invalid) must FAIL the `kth < max_dist` gate like the
    # jnp path; replace NaN with +big
    kth = jnp.where(jnp.isnan(kth), jnp.finfo(f32).max, kth)
    chans.append(chanpad(kth))
    X = jnp.concatenate(chans)

    out = pl.pallas_call(
        functools.partial(_kernel, Nr=Nr, k=k,
                          num_match_points=num_match_points,
                          max_dist_plane=float(max_dist_plane),
                          plane_threshold=float(plane_threshold)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5 * Nr, _LANES), jnp.float32),
        interpret=interpret,
    )(X)

    flat = out.reshape(5, Nr * _LANES)[:, :N]
    n_abcd = jnp.stack([flat[0], flat[1], flat[2], flat[3]], axis=1)
    good = flat[4] > 0
    return n_abcd, good
