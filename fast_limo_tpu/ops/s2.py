"""S2 sphere-manifold operations for the gravity state.

The reference models gravity as a 2-DOF point on a sphere of radius
``L = 98090/10000 = 9.809`` with chart type ``S2_typ=1`` (x-axis pivot):
``typedef MTK::S2<double, 98090, 10000, 1> S2`` (use-ikfom.hpp:8),
implementation in `mtk/types/S2.hpp:97-316`.

Here the S2 element is simply a 3-vector ``vec`` with ``|vec| == L``; all
chart matrices are computed branch-free for jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from fast_limo_tpu.ops import so3

# S2<double, 98090, 10000, 1> → length = den/num (use-ikfom.hpp:8)
S2_LENGTH = 98090.0 / 10000.0


def _tol(dtype) -> float:
    return 1e-5 if jnp.dtype(dtype) == jnp.float32 else 1e-11


def project(v, length: float = S2_LENGTH):
    """Normalize a 3-vector onto the sphere of radius `length` (S2 ctor, S2.hpp:119-127)."""
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True) * length


def Bx(vec, length: float = S2_LENGTH):
    """Chart basis matrix S2_Bx for S2_typ==1 (S2.hpp:215-231), (…,3,2).

    Uses the x-axis stereographic-style chart; falls back to the fixed frame
    when ``vec[0] + L`` is tiny (antipodal singularity).
    """
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    denom_raw = length + x
    singular = denom_raw <= _tol(vec.dtype)
    denom = jnp.where(singular, 1.0, denom_raw)
    r0 = jnp.stack([-y, -z], axis=-1)
    r1 = jnp.stack([length - y * y / denom, -z * y / denom], axis=-1)
    r2 = jnp.stack([-z * y / denom, length - z * z / denom], axis=-1)
    B = jnp.stack([r0, r1, r2], axis=-2) / length

    Bs = jnp.zeros_like(B)
    Bs = Bs.at[..., 1, 1].set(-1.0)
    Bs = Bs.at[..., 2, 0].set(1.0)
    return jnp.where(singular[..., None, None], Bs, B)


def boxplus(vec, delta, length: float = S2_LENGTH):
    """vec' = exp(Bx @ delta) * vec (S2.hpp:136-142)."""
    Bu = jnp.einsum("...ij,...j->...i", Bx(vec, length), delta)
    R = so3.exp_mat(Bu)
    return jnp.einsum("...ij,...j->...i", R, vec)


def boxminus(vec, other, length: float = S2_LENGTH):
    """2-DOF chart difference vec ⊟ other (S2.hpp:144-167)."""
    cross = jnp.cross(other, vec)  # hat(vec') applied per reference ordering
    # reference: v_sin = |hat(vec) * other|, v_cos = vec·other
    v_sin = jnp.linalg.norm(jnp.cross(vec, other), axis=-1)
    v_cos = jnp.sum(vec * other, axis=-1)
    theta = jnp.arctan2(v_sin, v_cos)
    tol = _tol(vec.dtype)

    Bother = Bx(other, length)
    # res = theta/v_sin * Bx(other)^T * hat(other) @ vec
    hv = jnp.cross(other, vec)
    safe_sin = jnp.where(v_sin > tol, v_sin, 1.0)
    res_big = (theta / safe_sin)[..., None] * jnp.einsum("...ij,...i->...j", Bother, hv)

    res_pi = jnp.stack([jnp.full_like(theta, 3.1415926), jnp.zeros_like(theta)], axis=-1)
    res_zero = jnp.zeros_like(res_pi)
    res_small = jnp.where((jnp.abs(theta) > tol)[..., None], res_pi, res_zero)
    del cross
    return jnp.where((v_sin < tol)[..., None], res_small, res_big)


def Nx_yy(vec, length: float = S2_LENGTH):
    """S2_Nx_yy = 1/L^2 * Bx(vec)^T @ hat(vec) (S2.hpp:259-264), (…,2,3)."""
    B = Bx(vec, length)
    return jnp.einsum("...ji,...jk->...ik", B, so3.hat(vec)) / (length * length)


def Mx(vec, delta, length: float = S2_LENGTH):
    """S2_Mx (S2.hpp:266-280), (…,3,2).

    delta≈0: ``-hat(vec) @ Bx``; else ``-exp_delta · hat(vec) A(Bu)^T Bx``.

    Parity note: the reference computes ``exp_delta`` with
    ``MTK::exp(…, scalar(1/2))`` (S2.hpp:277) where ``1/2`` is C++ *integer*
    division — the scale is 0 and ``exp_delta`` is always the identity
    rotation. We replicate that behavior (the factor is dropped).
    """
    B = Bx(vec, length)
    Bu = jnp.einsum("...ij,...j->...i", B, delta)
    small = jnp.linalg.norm(delta, axis=-1) < _tol(vec.dtype)

    M_small = -jnp.einsum("...ij,...jk->...ik", so3.hat(vec), B)

    A_T = jnp.swapaxes(so3.A_matrix(Bu), -1, -2)
    M_big = -jnp.einsum("...jk,...kl,...lm->...jm", so3.hat(vec), A_T, B)
    return jnp.where(small[..., None, None], M_small, M_big)


def S2_hat(vec):
    return so3.hat(vec)


def oplus(vec, delta3, scale=1.0):
    """Full 3-dim oplus: rotate vec by exp(scale*delta3) (S2.hpp:129-134)."""
    R = so3.exp_mat(delta3 * scale)
    return jnp.einsum("...ij,...j->...i", R, vec)
