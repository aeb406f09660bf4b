"""Small-cloud rigid registration for loop-closure verification.

TPU-first ICP: correspondence search is a dense (M,N) squared-distance
matrix — one big matmul on the MXU — followed by a weighted Kabsch/Umeyama
solve per iteration inside `lax.scan`.  Used to turn a ScanContext hit into
a verified relative-pose constraint (and for KISS-Matcher-style
relocalization refinement).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fast_limo_tpu.ops import so3


class ICPResult(NamedTuple):
    quat: jnp.ndarray       # (4,) target←source rotation
    trans: jnp.ndarray      # (3,)
    rmse: jnp.ndarray       # () inlier RMSE
    n_inliers: jnp.ndarray  # () int32
    converged: jnp.ndarray  # () bool


def _sq_dists(a, b):
    """(M,N) squared distances via the |a|²+|b|²−2a·b expansion (MXU)."""
    return (jnp.sum(a * a, axis=-1)[:, None]
            + jnp.sum(b * b, axis=-1)[None, :]
            - 2.0 * a @ b.T)


def _kabsch(src, dst, w):
    """Weighted rigid alignment src→dst: returns (R, t)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    S = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]).astype(src.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return R, t


@functools.partial(jax.jit, static_argnames=("iters", "coarse_mult"))
def icp(src, src_valid, dst, dst_valid, *, init_quat=None, init_trans=None,
        max_corr_dist: float = 2.0, iters: int = 10,
        coarse_mult: float = 4.0) -> ICPResult:
    """Point-to-point ICP aligning ``src`` onto ``dst``.

    src (M,3) / dst (N,3) with validity masks; init transform optional.
    The correspondence gate anneals from ``coarse_mult*max_corr_dist`` down
    to ``max_corr_dist`` (coarse-to-fine) so far, rotation-informative points
    aren't rejected before the pose is roughly right.
    """
    dtype = src.dtype
    q0 = init_quat if init_quat is not None else so3.quat_identity(dtype)
    t0 = init_trans if init_trans is not None else jnp.zeros(3, dtype)

    big = jnp.asarray(1e9, dtype)
    dst_masked = jnp.where(dst_valid[:, None], dst, big)
    gates = jnp.linspace(coarse_mult, 1.0, iters) * max_corr_dist

    def step(carry, gate):
        q, t = carry
        moved = so3.quat_rotate(q, src) + t
        d2 = _sq_dists(jnp.where(src_valid[:, None], moved, -big), dst_masked)
        nn = jnp.argmin(d2, axis=1)
        # the |a|²+|b|²−2a·b expansion can go slightly negative in f32
        nn_d2 = jnp.maximum(jnp.take_along_axis(d2, nn[:, None], axis=1)[:, 0], 0.0)
        w = (src_valid & (nn_d2 < gate * gate)).astype(dtype)
        R_d, t_d = _kabsch(moved, dst[nn], w)
        q_new = so3.quat_mul(so3.mat_to_quat(R_d), q)
        t_new = R_d @ t + t_d
        rmse = jnp.sqrt(jnp.sum(nn_d2 * w) / jnp.maximum(jnp.sum(w), 1.0))
        return (q_new, t_new), (rmse, jnp.sum(w))

    (q, t), (rmses, ws) = jax.lax.scan(step, (q0, t0), gates.astype(dtype))
    return ICPResult(quat=q, trans=t, rmse=rmses[-1],
                     n_inliers=ws[-1].astype(jnp.int32),
                     converged=rmses[-1] < max_corr_dist)
