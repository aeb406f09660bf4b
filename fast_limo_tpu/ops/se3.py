"""SE(3) exp/log for pose-graph optimization (twists as [ρ(3), φ(3)])."""

from __future__ import annotations

import jax.numpy as jnp

from fast_limo_tpu.ops import so3


def _V(phi):
    """Left Jacobian of SO(3): V(φ) = I + (1−cosθ)/θ² φ̂ + (θ−sinθ)/θ³ φ̂²."""
    th2 = jnp.sum(phi * phi, axis=-1)
    th = jnp.sqrt(th2)
    small = th < 1e-5
    safe2 = jnp.where(small, 1.0, th2)
    K = so3.hat(phi)
    K2 = K @ K
    c1 = jnp.where(small, 0.5, (1 - jnp.cos(th)) / safe2)
    c2 = jnp.where(small, 1.0 / 6.0, (th - jnp.sin(th)) / (safe2 * jnp.sqrt(safe2)))
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + c1[..., None, None] * K + c2[..., None, None] * K2


def _V_inv(phi):
    th2 = jnp.sum(phi * phi, axis=-1)
    th = jnp.sqrt(th2)
    small = th < 1e-5
    safe = jnp.where(small, 1.0, th)
    K = so3.hat(phi)
    K2 = K @ K
    half = jnp.where(small, 1.0 / 12.0,
                     (1.0 - th * jnp.cos(safe / 2) / (2.0 * jnp.sin(safe / 2))) / jnp.where(small, 1.0, th2))
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I - 0.5 * K + half[..., None, None] * K2


def exp(xi):
    """(…,6) twist → (quat (…,4), trans (…,3))."""
    rho, phi = xi[..., 0:3], xi[..., 3:6]
    q = so3.exp_quat(phi)
    t = jnp.einsum("...ij,...j->...i", _V(phi), rho)
    return q, t


def log(q, t):
    """(quat, trans) → (…,6) twist."""
    phi = so3.log_quat(q)
    rho = jnp.einsum("...ij,...j->...i", _V_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def compose(q1, t1, q2, t2):
    return so3.quat_mul(q1, q2), so3.quat_rotate(q1, t2) + t1


def inverse(q, t):
    qi = so3.quat_conj(q)
    return qi, -so3.quat_rotate(qi, t)
