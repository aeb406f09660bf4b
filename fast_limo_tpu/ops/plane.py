"""Batched least-squares plane fitting with the reference's validity gates.

Counterpart of `fast_limo::Plane` (Objects/Plane.cpp:23-121): solve
``A·n = -1`` for the k neighbor points, normalize to ``(n, d)`` with
``d = 1/|n_raw|``, and gate on

* enough neighbors (Plane.cpp:41-43),
* kth-neighbor *squared* distance < MAX_DIST_PLANE (Plane.cpp:45-48 — the
  octree returns squared distances, Octree.hpp:571-575),
* all neighbor residuals within PLANE_THRESHOLD (Plane.cpp:107-114).

The reference solves with column-pivoted QR per point; here the batched
3-unknown normal equations are solved in closed form (adjugate / determinant),
which XLA vectorizes over the whole scan. Degenerate neighbor sets produce a
tiny determinant and are rejected by the gates / finiteness check.
"""

from __future__ import annotations

import jax.numpy as jnp


def _solve3(G, r):
    """Batched 3x3 solve via adjugate; returns (adj(G)@r, det(G))."""
    a, b, c = G[..., 0, 0], G[..., 0, 1], G[..., 0, 2]
    d, e, f = G[..., 1, 0], G[..., 1, 1], G[..., 1, 2]
    g, h, i = G[..., 2, 0], G[..., 2, 1], G[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    Gc = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, D, Gc], axis=-1),
            jnp.stack([B, E, H], axis=-1),
            jnp.stack([C, F, I], axis=-1),
        ],
        axis=-2,
    )
    return jnp.einsum("...ij,...j->...i", adj, r), det


def fit_planes(nbrs, sq_dists, nbr_valid, *, num_match_points: int,
               max_dist_plane: float, plane_threshold: float):
    """Fit planes through each query's k neighbors.

    nbrs: (N,k,3); sq_dists: (N,k) ascending; nbr_valid: (N,k).
    Returns (n_abcd (N,4), good (N,)).
    """
    N, k, _ = nbrs.shape
    n_valid = jnp.sum(nbr_valid, axis=-1)

    enough = n_valid >= num_match_points
    kth = sq_dists[:, num_match_points - 1] if num_match_points <= k else jnp.full(N, jnp.inf)
    close = kth < max_dist_plane

    # masked normal equations: A n = -1 over valid neighbors
    w = nbr_valid[..., None].astype(nbrs.dtype)
    Aw = nbrs * w
    G = jnp.einsum("nki,nkj->nij", Aw, Aw)     # AᵀA over valid rows (w∈{0,1})
    r = -jnp.sum(Aw, axis=1)

    adj_r, det = _solve3(G, r)
    norm_adj = jnp.linalg.norm(adj_r, axis=-1)
    safe = (jnp.abs(det) > 1e-20) & (norm_adj > 1e-20)
    sgn = jnp.where(det >= 0, 1.0, -1.0).astype(nbrs.dtype)
    n_unit = sgn[..., None] * adj_r / jnp.where(safe, norm_adj, 1.0)[..., None]
    d = jnp.abs(det) / jnp.where(safe, norm_adj, 1.0)
    n_abcd = jnp.concatenate([n_unit, d[..., None]], axis=-1)           # (N,4)

    # residual gate over the neighbors
    res = jnp.einsum("nki,ni->nk", nbrs, n_unit) + d[..., None]
    res_ok = jnp.all(jnp.where(nbr_valid, jnp.abs(res) <= plane_threshold, True), axis=-1)

    good = enough & close & safe & res_ok
    return n_abcd, good


def point_to_plane(n_abcd, pts):
    """Signed distance n·p + d (Plane.cpp:50-56)."""
    return jnp.sum(n_abcd[..., :3] * pts, axis=-1) + n_abcd[..., 3]
