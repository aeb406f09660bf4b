"""Point-to-plane measurement model for the iterated update.

Fuses the reference's per-iteration chain — `Mapper::match`
(Mapper.cpp:59-114: transform to world, kNN, plane fit, gate) and
`Localizer::calculate_H` (Localizer.cpp:537-577: N×12 Jacobian rows,
h = −dist) — into one batched, fixed-shape function of the current iterate.
Invalid/padded matches produce zero rows, which contribute nothing to HᵀH /
Hᵀh inside the filter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fast_limo_tpu.models import mapper as mp
from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import plane as plane_op
from fast_limo_tpu.ops import so3


class MatchStats(NamedTuple):
    n_matches: jnp.ndarray   # () int32


def make_h_model(m: mp.VoxelHashMap, pc, pc_valid, *,
                 voxel_size: float, k: int, probes: int,
                 max_dist_plane: float, plane_threshold: float,
                 max_num_matches: int, estimate_extrinsics: bool,
                 shard_axis: str = None, num_shards: int = 1,
                 query_axis: str = None, num_query_shards: int = 1,
                 knn_refresh: str = "always", x0: st.NavState = None,
                 neighborhood: int = 27, with_debug: bool = False,
                 dynamic_gate: float = 0.0):
    """Build the measurement closures over baselink-frame points pc.

    Returns ``(h_rows, h_stats)`` where ``h_rows(x) -> (H (Nq,12), h (Nq,))``
    gives the raw Jacobian rows (zero for invalid matches; Nq = this
    device's query slice) and ``h_stats(x) -> (HᵀH, Hᵀh)`` the sufficient
    statistics consumed by `iekf.update_iterated`.

    ``pc`` is the deskewed pc2match cloud in the baselink (Xt2) frame,
    already capped to MAX_NUM_PC2MATCH points (Mapper.cpp:63-69).

    Parallelism (both optional, composable on a 2-D mesh):
    * ``shard_axis``: the map lives sharded by hash ownership; per-shard
      kNN top-k candidates merge over ICI with ``all_gather``.
    * ``query_axis``: each device matches only its 1/num_query_shards slice
      of the queries; HᵀH/Hᵀh are ``psum``-reduced — linear throughput
      scaling of the gather/fit/Jacobian work.

    ``knn_refresh``: "always" re-resolves the voxel neighborhood at every
    update iteration (exact reference semantics — h_share_model re-matches
    per iteration, use-ikfom.cpp:10-31); "first" resolves it once at ``x0``
    (the predicted pose) and only re-ranks distances/planes per iteration —
    iterations move the pose by millimeters, so the candidate set is
    unchanged in practice while the dominant gather cost is paid once.

    ``with_debug=True`` additionally returns a third closure
    ``h_debug(x) -> (n_abcd (Nq,4), keep (Nq,), dist (Nq,))`` — the raw
    match data (plane coefficients, validity, signed distances) behind the
    reference's match-marker debug publisher (src/main.cpp:203,
    ROSutils.hpp:216-252).
    """
    assert knn_refresh in ("always", "first")

    if query_axis is not None:
        import jax

        Nq = pc.shape[0] // num_query_shards
        qidx = jax.lax.axis_index(query_axis)
        pc = jax.lax.dynamic_slice_in_dim(pc, qidx * Nq, Nq, axis=0)
        pc_valid = jax.lax.dynamic_slice_in_dim(pc_valid, qidx * Nq, Nq, axis=0)

    def _gather(glob):
        """Raw neighborhood gather → (rows, nc, owned)."""
        if shard_axis is None:
            return mp.gather_rows(
                m, glob, voxel_size=voxel_size, neighborhood=neighborhood)
        import jax

        idx = jax.lax.axis_index(shard_axis)
        return mp.gather_rows(
            m, glob, voxel_size=voxel_size, num_shards=num_shards,
            shard_index=idx, neighborhood=neighborhood)

    def _topk(gathered, glob):
        from fast_limo_tpu.ops import dispatch

        rows, nc, owned = gathered
        if owned is None and dispatch.kernel_enabled("knn"):
            # fused entry-match + distance + k-min (ops/knn_rows.py)
            from fast_limo_tpu.ops import knn_rows

            return knn_rows.topk_from_rows_tpu(rows, nc, glob, E=mp.E,
                                               B=m.bucket, k=k)
        cand_pts, cand_valid = mp.cands_from_rows(rows, nc, owned, m.bucket)
        nbrs, sq, vld = mp.topk_from_candidates(cand_pts, cand_valid, glob, k=k)
        if shard_axis is None:
            return nbrs, sq, vld
        # map-sharded: per-shard top-k candidates ride ICI (all_gather) and
        # re-merge into the global k nearest — identical to single-chip.
        import jax

        nbrs_g = jax.lax.all_gather(nbrs, shard_axis)         # (D,N,k,3)
        sq_g = jax.lax.all_gather(sq, shard_axis)             # (D,N,k)
        N = glob.shape[0]
        sq_cat = jnp.moveaxis(sq_g, 0, 1).reshape(N, num_shards * k)
        nbr_cat = jnp.moveaxis(nbrs_g, 0, 1).reshape(N, num_shards * k, 3)
        neg, top = jax.lax.top_k(-sq_cat, k)
        sq = -neg
        nbrs = jnp.take_along_axis(nbr_cat, top[..., None], axis=1)
        return nbrs, sq, jnp.isfinite(sq)

    def _match(glob, cached_rows=None):
        """kNN + plane fit + gates → (n_abcd, keep) at the given world pts."""
        gathered = cached_rows if cached_rows is not None else _gather(glob)
        nbrs, sq, vld = _topk(gathered, glob)
        n_abcd, good = plane_op.fit_planes(
            nbrs, sq, vld, num_match_points=k,
            max_dist_plane=max_dist_plane, plane_threshold=plane_threshold)
        good = good & pc_valid
        if dynamic_gate > 0:
            # robust residual gate (MappingConfig.DYNAMIC_GATE): movers
            # leave ~v·Δt residuals against their stale map imprints, far
            # above the static cm-band — reject matches beyond
            # gate·(two-pass robust mean |residual|), floored at 5 cm so
            # clean scenes never self-tighten
            ad = jnp.abs(plane_op.point_to_plane(n_abcd, glob))
            gf = good.astype(ad.dtype)

            def _means(w):
                s, n = jnp.sum(ad * w), jnp.sum(w)
                if query_axis is not None:
                    import jax

                    s = jax.lax.psum(s, query_axis)
                    n = jax.lax.psum(n, query_axis)
                return s / jnp.maximum(n, 1.0)

            m1 = _means(gf)
            m2 = _means(gf * (ad <= 3.0 * m1 + 0.05))
            good = good & (ad <= jnp.maximum(dynamic_gate * m2, 0.05))
        # cap at MAX_NUM_MATCHES in point order (Localizer.cpp:539); with
        # query sharding the cap needs the exclusive prefix of lower shards
        local_cum = jnp.cumsum(good.astype(jnp.int32))
        if query_axis is not None:
            import jax

            totals = jax.lax.all_gather(local_cum[-1], query_axis)  # (D,)
            qidx = jax.lax.axis_index(query_axis)
            prefix = jnp.sum(jnp.where(
                jnp.arange(num_query_shards) < qidx, totals, 0))
            local_cum = local_cum + prefix
        keep = good & (local_cum <= max_num_matches)
        return n_abcd, keep

    from fast_limo_tpu.ops import dispatch

    use_kernel = (dispatch.kernel_enabled("hstats") and pc.dtype == jnp.float32)

    if knn_refresh == "first":
        # correspondences (neighbor sets, plane fits, gates) are resolved
        # once at the predicted pose and held fixed across iterations — only
        # residuals and Jacobians track the iterate. Between-iteration pose
        # deltas are millimetric, so the frozen planes are the ones the
        # re-match would find anyway; the dominant gather+fit cost is paid
        # once per scan instead of per iteration.
        assert x0 is not None, "knn_refresh='first' needs the predicted pose x0"
        glob0 = so3.quat_rotate(x0.rot, pc) + x0.pos
        frozen = _match(glob0)
        if use_kernel:
            # pack channels ONCE per scan for the fused statistics kernel
            from fast_limo_tpu.ops import hstats as hstats_op

            _n0, _k0 = frozen
            frozen_X = hstats_op.pack_inputs(pc, _n0, _k0)

    def h_rows(x: st.NavState):
        dtype = pc.dtype
        # world-frame query points under the current iterate (Mapper.cpp:71-72)
        glob = so3.quat_rotate(x.rot, pc) + x.pos
        n_abcd, keep = frozen if knn_refresh == "first" else _match(glob)
        dist = plane_op.point_to_plane(n_abcd, glob)

        n = n_abcd[:, :3]                                     # (N,3)
        # C = Rᵀ n ; A = p_imu × C ; B = p_lidar × (R_LIᵀ C)  (Localizer.cpp:549-569)
        Rinv = so3.quat_to_mat(so3.quat_conj(x.rot))
        C = n @ Rinv.T
        p_imu = pc                                            # RT⁻¹·global == local
        A = jnp.cross(p_imu, C)
        RLIinv = so3.quat_to_mat(so3.quat_conj(x.rot_LI))
        p_lidar = (p_imu - x.t_LI) @ RLIinv.T
        B = jnp.cross(p_lidar, C @ RLIinv.T)

        if estimate_extrinsics:
            H = jnp.concatenate([n, A, B, C], axis=-1)        # (N,12)
        else:
            H = jnp.concatenate([n, A, jnp.zeros_like(B), jnp.zeros_like(C)], axis=-1)

        H = jnp.where(keep[:, None], H, 0.0).astype(dtype)
        h = jnp.where(keep, -dist, 0.0).astype(dtype)
        return H, h

    def h_stats(x: st.NavState):
        if use_kernel:
            # whole per-iteration chain (world transform, residuals, H rows,
            # HᵀH/Hᵀh) as ONE Pallas launch — ops/hstats.py
            from fast_limo_tpu.ops import hstats as hstats_op

            if knn_refresh == "first":
                X = frozen_X
            else:
                glob = so3.quat_rotate(x.rot, pc) + x.pos
                n_abcd, keep = _match(glob)
                X = hstats_op.pack_inputs(pc, n_abcd, keep)
            HTH, HTh = hstats_op.hstats_tpu(
                X, hstats_op.pack_scalars(x),
                estimate_extrinsics=estimate_extrinsics)
        else:
            H, h = h_rows(x)
            HTH, HTh = H.T @ H, H.T @ h
        if query_axis is not None:
            import jax

            HTH = jax.lax.psum(HTH, query_axis)
            HTh = jax.lax.psum(HTh, query_axis)
        return HTH, HTh

    if use_kernel and knn_refresh == "first" and query_axis is None:
        # expose the frozen channel pack so iekf.update_iterated can run
        # the WHOLE masked iteration loop as one launch (ops/update_loop.py)
        # — with query sharding the HᵀH psum must stay outside the kernel,
        # so the per-iteration path is kept there
        h_stats.loop_pack = frozen_X
        h_stats.loop_extrinsics = estimate_extrinsics

    if not with_debug:
        return h_rows, h_stats

    def h_debug(x: st.NavState):
        glob = so3.quat_rotate(x.rot, pc) + x.pos
        n_abcd, keep = frozen if knn_refresh == "first" else _match(glob)
        dist = plane_op.point_to_plane(n_abcd, glob)
        if query_axis is not None:
            # pc was sliced to this device's query shard above, so the match
            # leaves are shard-local — but DebugOutput is declared replicated
            # in the sharded step's out_specs.  Reassemble the full query
            # axis (shards were contiguous slices, so concatenation in
            # shard order restores the original point order).
            import jax

            def unshard(a):
                g = jax.lax.all_gather(a, query_axis)     # (D, Nq, ...)
                return g.reshape((-1,) + g.shape[2:])

            n_abcd, keep, dist = unshard(n_abcd), unshard(keep), unshard(dist)
        return n_abcd, keep, dist

    return h_rows, h_stats, h_debug
