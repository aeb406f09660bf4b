"""SE(3) pose-graph optimization.

Advertised by the reference's loop-closure branch (GTSAM-based, not in the
snapshot — README.md:152-159); rebuilt here TPU-first: fixed-capacity node
and edge stores, per-edge residuals/Jacobians batched with vmap + autodiff,
and a DENSE 6K×6K Gauss-Newton normal-equations solve — at K ≤ 1024 nodes a
dense Cholesky on the MXU beats sparse scalar pivoting by a mile on TPU.

Edge residual (factor): r = log_se3(T_meas⁻¹ · T_i⁻¹ · T_j), 6-dim; node
update is right-multiplicative (T ← T·exp(δ)).  Gauge fixed by node 0.

Unary position priors (the GPS factors of the reference's loop branch,
README.md:152-159 — GPS assumed already converted into the odometry world
frame): r = t_i − p_meas, 3-dim, accumulated into the same normal equations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fast_limo_tpu.ops import se3, so3


class PoseGraph(NamedTuple):
    # nodes
    quat: jnp.ndarray        # (K,4)
    trans: jnp.ndarray       # (K,3)
    node_valid: jnp.ndarray  # (K,)
    # edges
    edge_i: jnp.ndarray      # (E,) int32
    edge_j: jnp.ndarray      # (E,) int32
    edge_quat: jnp.ndarray   # (E,4) measured T_i→T_j rotation
    edge_trans: jnp.ndarray  # (E,3)
    edge_weight: jnp.ndarray  # (E,) information weight (0 = unused slot)
    # unary position priors (GPS factors)
    prior_idx: jnp.ndarray    # (Pn,) int32 node index
    prior_pos: jnp.ndarray    # (Pn,3) measured world position
    prior_weight: jnp.ndarray  # (Pn,) information weight (0 = unused slot)
    n_nodes: jnp.ndarray     # ()
    n_edges: jnp.ndarray     # ()
    n_priors: jnp.ndarray    # ()


def create(max_nodes: int, max_edges: int, max_priors: int = 0,
           dtype=jnp.float32) -> PoseGraph:
    max_priors = max_priors or max_nodes
    return PoseGraph(
        quat=jnp.tile(so3.quat_identity(dtype), (max_nodes, 1)),
        trans=jnp.zeros((max_nodes, 3), dtype),
        node_valid=jnp.zeros(max_nodes, bool),
        edge_i=jnp.zeros(max_edges, jnp.int32),
        edge_j=jnp.zeros(max_edges, jnp.int32),
        edge_quat=jnp.tile(so3.quat_identity(dtype), (max_edges, 1)),
        edge_trans=jnp.zeros((max_edges, 3), dtype),
        edge_weight=jnp.zeros(max_edges, dtype),
        prior_idx=jnp.zeros(max_priors, jnp.int32),
        prior_pos=jnp.zeros((max_priors, 3), dtype),
        prior_weight=jnp.zeros(max_priors, dtype),
        n_nodes=jnp.asarray(0, jnp.int32),
        n_edges=jnp.asarray(0, jnp.int32),
        n_priors=jnp.asarray(0, jnp.int32),
    )


def add_node(g: PoseGraph, quat, trans) -> PoseGraph:
    k = g.n_nodes
    return g._replace(
        quat=g.quat.at[k].set(quat),
        trans=g.trans.at[k].set(trans),
        node_valid=g.node_valid.at[k].set(True),
        n_nodes=k + 1,
    )


def add_edge(g: PoseGraph, i, j, quat, trans, weight=1.0) -> PoseGraph:
    e = g.n_edges
    return g._replace(
        edge_i=g.edge_i.at[e].set(jnp.asarray(i, jnp.int32)),
        edge_j=g.edge_j.at[e].set(jnp.asarray(j, jnp.int32)),
        edge_quat=g.edge_quat.at[e].set(quat),
        edge_trans=g.edge_trans.at[e].set(trans),
        edge_weight=g.edge_weight.at[e].set(weight),
        n_edges=e + 1,
    )


def add_prior(g: PoseGraph, i, pos, weight=1.0) -> PoseGraph:
    """Attach a unary position prior (GPS factor) to node ``i``."""
    p = g.n_priors
    return g._replace(
        prior_idx=g.prior_idx.at[p].set(jnp.asarray(i, jnp.int32)),
        prior_pos=g.prior_pos.at[p].set(pos),
        prior_weight=g.prior_weight.at[p].set(weight),
        n_priors=p + 1,
    )


def _edge_residual(qi, ti, qj, tj, qm, tm, di, dj):
    """r(δi, δj) with right-perturbed nodes; autodiff gives the Jacobians."""
    qi2, ti2 = se3.compose(qi, ti, *se3.exp(di))
    qj2, tj2 = se3.compose(qj, tj, *se3.exp(dj))
    q_ij, t_ij = se3.compose(*se3.inverse(qi2, ti2), qj2, tj2)
    q_err, t_err = se3.compose(*se3.inverse(qm, tm), q_ij, t_ij)
    return se3.log(q_err, t_err)


def _prior_residual(qi, ti, pm, di):
    """Unary position residual with a right-perturbed node."""
    _, ti2 = se3.compose(qi, ti, *se3.exp(di))
    return ti2 - pm


@functools.partial(jax.jit, static_argnames=("iters", "edge_axis"))
def optimize(g: PoseGraph, *, iters: int = 10, damping: float = 1e-6,
             edge_axis: str = None) -> PoseGraph:
    """Batched Gauss-Newton over all valid nodes/edges; node 0 held fixed.

    ``edge_axis``: when running under `shard_map` with the EDGE arrays
    sharded over a mesh axis (nodes replicated), each device accumulates the
    normal equations for its edge slice and the dense H/b are psum-reduced
    over ICI before the (replicated) solve — the distributed pose-graph
    factor reduction of the north star.
    """
    K = g.quat.shape[0]
    dtype = g.quat.dtype
    zero6 = jnp.zeros(6, dtype)

    res_fn = _edge_residual
    Ji_fn = jax.jacfwd(res_fn, argnums=6)
    Jj_fn = jax.jacfwd(res_fn, argnums=7)
    Jp_fn = jax.jacfwd(_prior_residual, argnums=3)

    def gn_step(carry, _):
        quat, trans = carry
        qi, ti = quat[g.edge_i], trans[g.edge_i]
        qj, tj = quat[g.edge_j], trans[g.edge_j]

        r = jax.vmap(res_fn, in_axes=(0, 0, 0, 0, 0, 0, None, None))(
            qi, ti, qj, tj, g.edge_quat, g.edge_trans, zero6, zero6)      # (E,6)
        Ji = jax.vmap(Ji_fn, in_axes=(0, 0, 0, 0, 0, 0, None, None))(
            qi, ti, qj, tj, g.edge_quat, g.edge_trans, zero6, zero6)      # (E,6,6)
        Jj = jax.vmap(Jj_fn, in_axes=(0, 0, 0, 0, 0, 0, None, None))(
            qi, ti, qj, tj, g.edge_quat, g.edge_trans, zero6, zero6)

        w = g.edge_weight                                                 # (E,)
        # scatter per-edge blocks into dense H (6K,6K), b (6K,)
        H = jnp.zeros((K, 6, K, 6), dtype)
        b = jnp.zeros((K, 6), dtype)
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]
        H = H.at[g.edge_i, :, g.edge_i, :].add(
            jnp.einsum("eab,eac->ebc", wJi, Ji))
        H = H.at[g.edge_j, :, g.edge_j, :].add(
            jnp.einsum("eab,eac->ebc", wJj, Jj))
        H = H.at[g.edge_i, :, g.edge_j, :].add(
            jnp.einsum("eab,eac->ebc", wJi, Jj))
        H = H.at[g.edge_j, :, g.edge_i, :].add(
            jnp.einsum("eab,eac->ebc", wJj, Ji))
        b = b.at[g.edge_i].add(-jnp.einsum("eab,ea->eb", wJi, r))
        b = b.at[g.edge_j].add(-jnp.einsum("eab,ea->eb", wJj, r))

        # unary GPS/position priors — replicated across devices, so they are
        # accumulated into SEPARATE normal-equation terms added after the
        # edge psum (adding them before would count them axis-size times)
        qp, tp = quat[g.prior_idx], trans[g.prior_idx]
        rp = jax.vmap(_prior_residual, in_axes=(0, 0, 0, None))(
            qp, tp, g.prior_pos, zero6)                                   # (P,3)
        Jp = jax.vmap(Jp_fn, in_axes=(0, 0, 0, None))(
            qp, tp, g.prior_pos, zero6)                                   # (P,3,6)
        wp = g.prior_weight
        wJp = Jp * wp[:, None, None]
        Hp = jnp.zeros((K, 6, K, 6), dtype).at[g.prior_idx, :, g.prior_idx, :].add(
            jnp.einsum("eab,eac->ebc", wJp, Jp))
        bp = jnp.zeros((K, 6), dtype).at[g.prior_idx].add(
            -jnp.einsum("eab,ea->eb", wJp, rp))

        Hd = H.reshape(6 * K, 6 * K)
        bd = b.reshape(6 * K)
        if edge_axis is not None:  # reduce sharded edge factors over ICI
            Hd = jax.lax.psum(Hd, edge_axis)
            bd = jax.lax.psum(bd, edge_axis)
        Hd = Hd + Hp.reshape(6 * K, 6 * K)
        bd = bd + bp.reshape(6 * K)
        # gauge: clamp node 0; deactivate invalid nodes
        active = jnp.repeat(g.node_valid.at[0].set(False), 6)
        Hd = jnp.where(active[:, None] & active[None, :], Hd, 0.0)
        bd = jnp.where(active, bd, 0.0)
        Hd = Hd + jnp.eye(6 * K, dtype=dtype) * damping
        Hd = Hd + jnp.diag(jnp.where(active, 0.0, 1.0))

        delta = jnp.linalg.solve(Hd, bd).reshape(K, 6)
        dq, dt = se3.exp(delta)
        trans = trans + so3.quat_rotate(quat, dt)   # T ← T·exp(δ)
        quat = so3.quat_normalize(so3.quat_mul(quat, dq))
        cost = jnp.sum(w * jnp.sum(r * r, axis=-1))
        if edge_axis is not None:
            cost = jax.lax.psum(cost, edge_axis)
        cost = cost + jnp.sum(wp * jnp.sum(rp * rp, axis=-1))
        return (quat, trans), cost

    (quat, trans), costs = jax.lax.scan(gn_step, (g.quat, g.trans), None,
                                        length=iters)
    return g._replace(quat=quat, trans=trans), costs


def optimize_distributed(g: PoseGraph, mesh, *, iters: int = 10,
                         axis: str = "map"):
    """Pose-graph GN with edge factors sharded across the mesh.

    Nodes are replicated; each device computes residuals/Jacobians for its
    slice of the edge arrays and the dense normal equations psum over ICI.
    Edge count must be divisible by the mesh axis size.
    """
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    E = g.edge_i.shape[0]
    assert E % n == 0, f"edge capacity {E} not divisible by {n} devices"

    specs = PoseGraph(
        quat=P(), trans=P(), node_valid=P(),
        edge_i=P(axis), edge_j=P(axis), edge_quat=P(axis),
        edge_trans=P(axis), edge_weight=P(axis),
        prior_idx=P(), prior_pos=P(), prior_weight=P(),
        n_nodes=P(), n_edges=P(), n_priors=P())

    def inner(gg):
        return optimize(gg, iters=iters, edge_axis=axis)

    fn = jax.jit(jax.shard_map(
        inner, mesh=mesh, in_specs=(specs,),
        out_specs=(specs, P()), check_vma=False))
    return fn(g)
