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

    ``knn_refresh``: RETIRED knob (round 5), kept for config compatibility —
    both values run the same CERTIFIED EXACT re-match: semantics are the
    reference's "re-match every iteration" (h_share_model,
    use-ikfom.cpp:10-31), at resolve-once cost.  The candidate neighborhood
    is resolved ONCE at ``x0`` (the predicted pose) together with top-(k+1)
    distances and per-query STABILITY MARGINS; each iteration then proves —
    from the iterate's per-point displacement against those margins — that
    a full re-match would return the identical correspondence set and
    gates, and reuses the frozen set (recomputing the pose-dependent
    close/dynamic gates, caps, residuals and Jacobians exactly).  Any query
    whose certificate fails flips that iteration to a true re-gather
    (`lax.cond`), so the semantics never degrade.  Margin derivation:

    * rows: the 8-block gather depends only on ``b0 = (voxel(q)−1)>>1``
      (mapper.gather_rows); the set is unchanged while the query stays
      inside its b0 validity band ``[h(2b0+1), h(2b0+3))`` per axis.
    * kNN set: every candidate's distance moves by ≤ the query's
      displacement Δ, so the top-k SET is stable while
      ``2Δ < d_{k+1} − d_k`` (triangle inequality).  Plane fits are
      set-functions (centroid-PCA), so the frozen fit stays exact.
    * close gate (``d_k² < MAX_DIST_PLANE``): recomputed exactly per
      iteration in the frozen branch (max over the certified set).

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

    def _topk(gathered, glob, kk=k):
        from fast_limo_tpu.ops import dispatch

        rows, nc, owned = gathered
        if owned is None and dispatch.kernel_enabled("knn"):
            # fused entry-match + distance + k-min (ops/knn_rows.py)
            from fast_limo_tpu.ops import knn_rows

            return knn_rows.topk_from_rows_tpu(rows, nc, glob, E=mp.E,
                                               B=m.bucket, k=kk)
        cand_pts, cand_valid = mp.cands_from_rows(rows, nc, owned, m.bucket)
        nbrs, sq, vld = mp.topk_from_candidates(cand_pts, cand_valid, glob,
                                                k=kk)
        if shard_axis is None:
            return nbrs, sq, vld
        # map-sharded: per-shard top-k candidates ride ICI (all_gather) and
        # re-merge into the global k nearest — identical to single-chip.
        import jax

        nbrs_g = jax.lax.all_gather(nbrs, shard_axis)         # (D,N,kk,3)
        sq_g = jax.lax.all_gather(sq, shard_axis)             # (D,N,kk)
        N = glob.shape[0]
        sq_cat = jnp.moveaxis(sq_g, 0, 1).reshape(N, num_shards * kk)
        nbr_cat = jnp.moveaxis(nbrs_g, 0, 1).reshape(N, num_shards * kk, 3)
        neg, top = jax.lax.top_k(-sq_cat, kk)
        sq = -neg
        nbrs = jnp.take_along_axis(nbr_cat, top[..., None], axis=1)
        return nbrs, sq, jnp.isfinite(sq)

    def _dyn_gate(good, n_abcd, glob):
        """Robust residual gate (MappingConfig.DYNAMIC_GATE): movers leave
        ~v·Δt residuals against their stale map imprints, far above the
        static cm-band — reject matches beyond gate·(two-pass robust mean
        |residual|), floored at 5 cm so clean scenes never self-tighten."""
        if dynamic_gate <= 0:
            return good
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
        m2v = _means(gf * (ad <= 3.0 * m1 + 0.05))
        return good & (ad <= jnp.maximum(dynamic_gate * m2v, 0.05))

    def _cap(good):
        """MAX_NUM_MATCHES cap in point order (Localizer.cpp:539); with
        query sharding the cap needs the exclusive prefix of lower shards."""
        local_cum = jnp.cumsum(good.astype(jnp.int32))
        if query_axis is not None:
            import jax

            totals = jax.lax.all_gather(local_cum[-1], query_axis)  # (D,)
            qidx = jax.lax.axis_index(query_axis)
            prefix = jnp.sum(jnp.where(
                jnp.arange(num_query_shards) < qidx, totals, 0))
            local_cum = local_cum + prefix
        return good & (local_cum <= max_num_matches)

    def _match(glob):
        """FULL re-match: kNN gather + plane fit + gates at the given pose
        (the certificate-failure fallback — exact by construction)."""
        nbrs, sq, vld = _topk(_gather(glob), glob)
        n_abcd, good = plane_op.fit_planes(
            nbrs, sq, vld, num_match_points=k,
            max_dist_plane=max_dist_plane, plane_threshold=plane_threshold)
        good = _dyn_gate(good & pc_valid, n_abcd, glob)
        return n_abcd, _cap(good)

    from fast_limo_tpu.ops import dispatch

    use_kernel = (dispatch.kernel_enabled("hstats") and pc.dtype == jnp.float32)

    # ---- ONE frozen resolve at the predicted pose (see docstring) ----
    assert x0 is not None, "make_h_model needs the predicted pose x0"
    glob0 = so3.quat_rotate(x0.rot, pc) + x0.pos
    nbrs_e, sq_e, _vld_e = _topk(_gather(glob0), glob0, kk=k + 1)
    nbrs0 = nbrs_e[:, :k]
    sq0 = sq_e[:, :k]
    vld0 = jnp.isfinite(sq0)
    # pose-independent fit + gates: sq=0 disables the close gate here (it
    # is recomputed exactly per iteration in the frozen branch)
    n_abcd0, good_geo0 = plane_op.fit_planes(
        nbrs0, jnp.zeros_like(sq0), vld0, num_match_points=k,
        max_dist_plane=max_dist_plane, plane_threshold=plane_threshold)

    # ---- per-query stability margins (docstring derivation) ----
    _EPS = 1e-4            # f32 rounding insurance on metre-scale margins
    d_k = jnp.sqrt(sq0[:, k - 1])
    d_k1 = jnp.sqrt(sq_e[:, k])          # inf when < k+1 candidates exist
    margin_knn = jnp.where(jnp.isfinite(d_k1),
                           0.5 * (d_k1 - d_k) - _EPS, jnp.inf)
    h = voxel_size
    qc0 = mp.voxel_coords(glob0, h)
    lo = (((qc0 - 1) >> 1) * 2 + 1).astype(glob0.dtype) * h
    wv = glob0 - lo                       # ∈ [0, 2h) per axis
    margin_vox = jnp.min(jnp.minimum(wv, 2.0 * h - wv), axis=-1) - _EPS
    m_cheap = jnp.minimum(margin_knn, margin_vox)
    m2_cheap = jnp.where(
        pc_valid, jnp.square(jnp.clip(m_cheap, 0.0, 1e18)), jnp.inf)

    def _exact_from_frozen(glob):
        """Re-match at ``glob`` over the CERTIFIED frozen candidate set:
        the set/fit are frozen (set-stable by certificate), every
        pose-dependent decision — close gate, dynamic gate, cap, residual
        — is recomputed exactly."""
        diff = glob[:, None, :] - nbrs0
        sqk = jnp.sum(diff * diff, axis=-1)                   # (N,k)
        kth = jnp.max(jnp.where(vld0, sqk, -jnp.inf), axis=-1)
        good = good_geo0 & (kth < max_dist_plane) & pc_valid
        good = _dyn_gate(good, n_abcd0, glob)
        return n_abcd0, _cap(good)

    def _rematch(glob):
        """Per-iteration exact re-match: certified-frozen fast path with a
        full re-gather fallback when any query's certificate fails."""
        import jax

        disp2 = jnp.sum(jnp.square(glob - glob0), axis=-1)
        # dtype pinned: under x64 test mode jnp.sum would promote to int64
        # and double the certificate psum's wire size (comm_volume models 4 B)
        viol = jnp.sum((disp2 >= m2_cheap).astype(jnp.int32),
                       dtype=jnp.int32)
        if query_axis is not None:
            viol = jax.lax.psum(viol, query_axis)
        return jax.lax.cond(viol == 0, _exact_from_frozen, _match, glob)

    def h_rows(x: st.NavState):
        dtype = pc.dtype
        # world-frame query points under the current iterate (Mapper.cpp:71-72)
        glob = so3.quat_rotate(x.rot, pc) + x.pos
        n_abcd, keep = _rematch(glob)
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

            glob = so3.quat_rotate(x.rot, pc) + x.pos
            n_abcd, keep = _rematch(glob)
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

    if use_kernel and query_axis is None:
        # Expose the frozen channel pack + in-kernel certificate margins so
        # iekf.update_iterated can run the WHOLE masked iteration loop as
        # one launch (ops/update_loop.py) — the kernel freezes the keep
        # mask too, so its margin additionally covers the close gate (and
        # the dynamic gate's collective thresholds, via a conservative
        # scalar bound); any violation makes the kernel report ok=False and
        # the caller re-runs the exact per-iteration loop.  With query
        # sharding the HᵀH psum must stay outside the kernel, so the
        # per-iteration path is kept there.
        from fast_limo_tpu.ops import hstats as hstats_op

        _, keep0 = _exact_from_frozen(glob0)
        margin_close = jnp.where(
            good_geo0 & jnp.isfinite(d_k),
            jnp.abs(d_k - jnp.sqrt(jnp.asarray(max_dist_plane, d_k.dtype)))
            - _EPS, jnp.inf)
        m_loop = jnp.minimum(m_cheap, margin_close)
        if dynamic_gate > 0:
            # Scalar stability bound for the dynamic gate's two-pass robust
            # mean: with the set/close gates stable, every |residual| moves
            # by ≤ its query's displacement Δ_i and the means by ≤ max Δ —
            # so the trim mask is stable while 4·maxΔ < |ad−t1| and the
            # keep decisions while (1+gate)·maxΔ < |ad−τ| (rows in `good`).
            ad0 = jnp.abs(plane_op.point_to_plane(n_abcd0, glob0))
            kth0 = jnp.max(jnp.where(vld0, sq0, -jnp.inf), axis=-1)
            good0 = good_geo0 & (kth0 < max_dist_plane) & pc_valid
            gf0 = good0.astype(ad0.dtype)
            n_g = jnp.maximum(jnp.sum(gf0), 1.0)
            m1 = jnp.sum(ad0 * gf0) / n_g
            t1 = 3.0 * m1 + 0.05
            trim0 = gf0 * (ad0 <= t1)
            m2v = jnp.sum(ad0 * trim0) / jnp.maximum(jnp.sum(trim0), 1.0)
            tau0 = jnp.maximum(dynamic_gate * m2v, 0.05)
            big = jnp.asarray(jnp.inf, ad0.dtype)
            m_trim = jnp.min(jnp.where(good0, jnp.abs(ad0 - t1), big)) / 4.0
            m_keep = jnp.min(jnp.where(good0, jnp.abs(ad0 - tau0), big)) \
                / (1.0 + dynamic_gate)
            m_dyn = jnp.minimum(m_trim, m_keep) - _EPS
            m_loop = jnp.where(good0, jnp.minimum(m_loop, m_dyn), m_loop)
        m2_loop = jnp.where(
            pc_valid, jnp.square(jnp.clip(m_loop, 0.0, 1e18)), jnp.inf)
        # 9th channel: margin² tiles, padded with +inf (a zero pad would
        # veto the certificate on every scan)
        Npc = pc.shape[0]
        padn = (-Npc) % 128
        m2_pad = jnp.concatenate(
            [m2_loop.astype(jnp.float32),
             jnp.full((padn,), jnp.inf, jnp.float32)]) if padn else \
            m2_loop.astype(jnp.float32)
        frozen_X = hstats_op.pack_inputs(pc, n_abcd0, keep0)
        h_stats.loop_pack = jnp.concatenate(
            [frozen_X, m2_pad.reshape(-1, 128)])
        h_stats.loop_cert = True
        h_stats.loop_extrinsics = estimate_extrinsics

    if not with_debug:
        return h_rows, h_stats

    def h_debug(x: st.NavState):
        glob = so3.quat_rotate(x.rot, pc) + x.pos
        n_abcd, keep = _rematch(glob)
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
