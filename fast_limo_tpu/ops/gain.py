"""Fused iEKF gain kernel: the whole per-iteration 12/23-dim gain algebra
as ONE Pallas TPU kernel.

Motivation (measured on tunneled v5e): every tiny XLA fusion costs ~5-7 µs
of fixed latency, so the update iteration's small linear algebra dominated
the filter — the unrolled masked-Cholesky compression was ~1.1 ms (~150
sequential fusions) and the 12×12 pivoted-LU custom call ~1.0 ms, per
iteration.  Inside one Pallas kernel the same arithmetic is a handful of
register-resident loops: one launch, ~tens of µs.

Computes, from the sufficient statistics (HᵀH, Hᵀh), the chart-projected
covariance P (23×23) and the scalar noise R — exactly the algebra of
models/iekf.py's update body (reference esekfom.hpp:1701-1709):

    L    = masked-Cholesky(HᵀH)        (unit pivots on zero diagonals)
    H̃    = Lᵀ (zero filler rows)       ;  h̃ = L⁻¹(Hᵀh), fillers zeroed
    PH̃ᵀ  = P[:, :12]·H̃ᵀ
    S    = H̃·PH̃ᵀ[:12]/R + I
    K    = PH̃ᵀ·S⁻¹/R    via Gauss-Jordan WITH PARTIAL PIVOTING on Sᵀ
                         (pivoting is load-bearing: f32 P's slight
                         asymmetry makes S slightly indefinite and
                         unpivoted factorizations drift the filter)
    K_x  = K·H̃  (23×12)  ;  K_h = K·h̃  (23,)

`gain_reference` is the pure-jnp path with identical semantics (CPU/f64
callers, parity tests); the kernel is validated against it in interpret
mode and end-to-end on-device.
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

M = 12   # observed dims (measurement Jacobian columns)
NS = 23  # error-state dims


def gain_reference(HTH, HTh, P, R):
    """Pure-jnp gain path (identical semantics; used off-TPU and as oracle).

    Returns ``(K_x (23,12), K_h (23,), K (23,12))`` — K is the raw gain for
    the COMPRESSED 12-row measurement (needed by the Joseph-form terminal
    covariance, models/iekf.py:_final_P).
    """
    from fast_limo_tpu.ops import linalg

    dtype = P.dtype
    Ht12, h_c = linalg.masked_chol_compress(HTH, HTh)
    PHt = P[:, 0:M] @ Ht12.T
    S = (Ht12 @ PHt[0:M]) / R + jnp.eye(M, dtype=dtype)
    K_ = jnp.linalg.solve(S.T, PHt.T).T / R
    return K_ @ Ht12, K_ @ h_c, K_        # K_x (23,12), K_h (23,), K (23,12)


def gain_math(A, u, Pm, inv_R):
    """The in-kernel gain algebra on register values (shared with the fused
    update-body kernel, ops/update_body.py).

    A (M,M) = HᵀH, u (M,) = Hᵀh, Pm (NS,M) = P[:, :12], inv_R scalar.
    Returns (K_x (NS,M), K_h (NS,), K (NS,M)) — K is the raw compressed-row
    gain, consumed by the Joseph-form terminal covariance.
    """
    f32 = jnp.float32

    rows = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    ivec = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)[:, 0]   # (M,) 0..M-1
    eye = (rows == cols).astype(f32)

    diag = jnp.sum(jnp.where(rows == cols, A, 0.0), axis=1)       # (M,)
    iszero = diag == 0.0
    A = jnp.where((rows == cols) & iszero[:, None], 1.0, A)
    dead = 1e-12 * jnp.max(diag)

    # ---- masked Cholesky A = L·Lᵀ (left-looking, unrolled) ----
    L = jnp.zeros((M, M), f32)
    for j in range(M):
        Lrow_j = jnp.sum(jnp.where(rows == j, L, 0.0), axis=0)    # (M,) row j
        a_j = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1)       # (M,) col j
        a_j = a_j - jnp.sum(L * Lrow_j[None, :], axis=1)
        d = a_j[j]
        alive = d > dead
        inv_p = jnp.where(alive, jax.lax.rsqrt(jnp.maximum(d, 1e-30)), 0.0)
        colv = jnp.where(ivec >= j, a_j * inv_p, 0.0)             # (M,)
        L = jnp.where(cols == j, colv[:, None], L)

    # ---- H̃ = Lᵀ (filler rows zeroed); h̃ = L⁻¹u (fillers zeroed) ----
    Ht = jnp.where(iszero[:, None], 0.0, L.T)                     # (M, M)
    h = jnp.zeros((M,), f32)
    for i in range(M):
        Lrow_i = jnp.sum(jnp.where(rows == i, L, 0.0), axis=0)    # (M,)
        acc = u[i] - jnp.sum(Lrow_i * h)
        dd = Lrow_i[i]
        inv_d = jnp.where(dd != 0.0, 1.0 / jnp.where(dd != 0.0, dd, 1.0), 0.0)
        h = jnp.where(ivec == i, acc * inv_d, h)
    h = jnp.where(iszero, 0.0, h)

    # ---- PH̃ᵀ (NS,M); S = H̃·PH̃ᵀ[:M]/R + I (M,M) ----
    PHt = jax.lax.dot_general(Pm, Ht, (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)         # (NS, M)
    PHt_top = PHt[:M]                                             # (M, M)
    S = jnp.dot(Ht, PHt_top, preferred_element_type=f32) * inv_R + eye

    # ---- Gauss-Jordan with partial pivoting on Sᵀ; RHS = PHtᵀ (M,NS) ----
    # Row moves use exact WHERE-selects, never add/subtract reconstruction:
    # an additive swap (Aug + outer(e_k, rp−rk)) cancels catastrophically
    # when a ~1e7 pivot row swaps with a ~1 row (measured: destroyed the
    # small rows entirely).
    augc = jax.lax.broadcasted_iota(jnp.int32, (M, M + NS), 1)
    augr = jax.lax.broadcasted_iota(jnp.int32, (M, M + NS), 0)
    Aug = jnp.concatenate([S.T, PHt.T], axis=1)                   # (M, M+NS)
    for k in range(M):
        colk = jnp.sum(jnp.where(augc == k, Aug, 0.0), axis=1)    # (M,)
        cand = jnp.where(ivec >= k, jnp.abs(colk), -1.0)
        piv = jnp.argmax(cand)
        onehot_p = (ivec == piv).astype(f32)                      # (M,)
        rp = jnp.sum(Aug * onehot_p[:, None], axis=0)             # row piv
        rk = jnp.sum(jnp.where(augr == k, Aug, 0.0), axis=0)      # row k
        pkv = rp[k]
        inv_pk = jnp.where(pkv != 0.0, 1.0 / jnp.where(pkv != 0.0, pkv, 1.0),
                           0.0)
        prow = rp * inv_pk                                        # normalized
        # row k ← prow, row piv ← old row k (outer where wins when piv == k)
        Aug = jnp.where(augr == k, prow[None, :],
                        jnp.where(augr == piv, rk[None, :], Aug))
        colk2 = jnp.sum(jnp.where(augc == k, Aug, 0.0), axis=1)
        factor = jnp.where(ivec == k, 0.0, colk2)
        Aug = Aug - factor[:, None] * prow[None, :]

    X = Aug[:, M:]                                                # (M, NS)
    K = X.T * inv_R                                               # (NS, M)

    K_x = jnp.dot(K, Ht, preferred_element_type=f32)              # (NS, M)
    K_h = jnp.sum(K * h[None, :], axis=1)                         # (NS,)
    return K_x, K_h, K


def _gain_kernel(HTH_ref, HTh_ref, P_ref, scal_ref, Kx_ref, Kh_ref, K_ref):
    K_x, K_h, K = gain_math(HTH_ref[:, :], HTh_ref[0, :], P_ref[:, :],
                            scal_ref[0, 0])
    Kx_ref[:, :] = K_x
    Kh_ref[:, :] = K_h[:, None]
    K_ref[:, :] = K


@functools.partial(jax.jit, static_argnames=("interpret",))
def gain_tpu(HTH, HTh, P, R, *, interpret: bool = False):
    """Pallas gain path: (K_x (23,12), K_h (23,), K (23,12)) in one launch."""
    f32 = jnp.float32
    Kx, Kh, K = pl.pallas_call(
        _gain_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((NS, M), f32),
                   jax.ShapeDtypeStruct((NS, 1), f32),
                   jax.ShapeDtypeStruct((NS, M), f32)),
        interpret=interpret,
    )(HTH.astype(f32), HTh.astype(f32)[None, :], P[:, :M].astype(f32),
      jnp.full((1, 1), 1.0 / R, f32))
    return Kx.astype(P.dtype), Kh[:, 0].astype(P.dtype), K.astype(P.dtype)


def gain(HTH, HTh, P, R):
    """Dispatch: Pallas kernel on TPU f32, jnp reference elsewhere."""
    from fast_limo_tpu.ops import dispatch

    if _HAS_PALLAS and dispatch.kernel_enabled("gain") and P.dtype == jnp.float32:
        return gain_tpu(HTH, HTh, P, R)
    return gain_reference(HTH, HTh, P, R)
