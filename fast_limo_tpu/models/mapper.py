"""Incremental voxel-hash map — the TPU-native equivalent of the reference's
incremental octree (`include/fast_limo/Objects/Octree.hpp`).

The octree's pointer-chasing kNN cannot map to TPU; instead the map is a
fixed-capacity open-addressing hash table of voxel buckets:

* ``coords (C,3) int32`` — integer voxel coordinates of each slot
* ``points (C,B,3) float32`` — up to B points stored per voxel
* ``counts (C,) int32`` — occupancy per voxel (0 = free slot)

Insertion is batched and fully vectorized: per-voxel ranks via a sorted
segment scan, slot claiming via scatter-min election, bounded linear probing
(`fori_loop` over a static probe count).  The per-voxel capacity B mirrors
the octree's leaf-level downsampling rule — a full bucket rejects new points
(Octree.hpp:399-405) — and the voxel edge defaults to ``2*min_extent`` (the
finest octree leaf is in ``(min_extent, 2*min_extent]``, Octree.hpp:310,385).

kNN = gather the 3³ neighbor voxels of each query, mask, and take the k
smallest squared distances (Octree.hpp:527-598 contract: ascending sq-dists).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# open-addressing election sentinel
_INT_MAX = jnp.iinfo(jnp.int32).max

# 3x3x3 neighborhood offsets, static
_NEIGHBOR_OFFSETS = jnp.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=jnp.int32,
)  # (27, 3)


class VoxelHashMap(NamedTuple):
    coords: jnp.ndarray      # (C, 3) int32
    points: jnp.ndarray      # (C, B, 3) float32
    counts: jnp.ndarray      # (C,) int32
    num_points: jnp.ndarray  # () int32  (Mapper::size, Mapper.cpp:51-53)
    last_time: jnp.ndarray   # () float32 (Mapper::last_time)


def create(capacity: int, bucket: int, dtype=jnp.float32) -> VoxelHashMap:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return VoxelHashMap(
        coords=jnp.zeros((capacity, 3), jnp.int32),
        points=jnp.zeros((capacity, bucket, 3), dtype),
        counts=jnp.zeros((capacity,), jnp.int32),
        num_points=jnp.asarray(0, jnp.int32),
        last_time=jnp.asarray(-1.0, jnp.float32),
    )


def _hash(coords, capacity: int):
    """Spatial hash of integer voxel coords → slot in [0, capacity)."""
    h = (
        coords[..., 0] * jnp.int32(73856093)
        ^ coords[..., 1] * jnp.int32(19349669)
        ^ coords[..., 2] * jnp.int32(83492791)
    )
    return (h & jnp.int32(capacity - 1)).astype(jnp.int32)


def voxel_coords(pts, voxel_size: float):
    return jnp.floor(pts / voxel_size).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("voxel_size", "probes", "num_shards"))
def insert(m: VoxelHashMap, pts, valid, *, voxel_size: float, probes: int = 16,
           num_shards: int = 1, shard_index=0) -> VoxelHashMap:
    """Insert a masked batch of world-frame points (Mapper::add / Octree::update).

    pts: (N,3); valid: (N,) bool. Returns the updated map.

    Sharded mode (num_shards > 1): ``m`` is this device's shard of a global
    table of ``capacity*num_shards`` slots; a voxel's owner device is the
    high bits of its global hash and only owned points are inserted, so each
    device's probe chains stay entirely local.
    """
    capacity = m.coords.shape[0]
    bucket = m.points.shape[1]
    N = pts.shape[0]

    vc = voxel_coords(pts, voxel_size)                       # (N,3)
    if num_shards > 1:
        h_full = _hash(vc, capacity * num_shards)
        owner = h_full // jnp.int32(capacity)
        valid = valid & (owner == shard_index)
        h = (h_full % jnp.int32(capacity)).astype(jnp.int32)
    else:
        h = _hash(vc, capacity)                              # (N,)

    # ---- group same-voxel points: lexsort by coords and rank within voxel ----
    order = jnp.lexsort((vc[:, 2], vc[:, 1], vc[:, 0], (~valid).astype(jnp.int32)))
    vc_s = vc[order]
    valid_s = valid[order]
    same_prev = jnp.concatenate(
        [jnp.array([False]), jnp.all(vc_s[1:] == vc_s[:-1], axis=-1) & valid_s[1:] & valid_s[:-1]]
    )
    # per-voxel rank via segmented scan (reset where a new voxel starts)
    idxs = jnp.arange(N)
    seg_start = jnp.where(~same_prev, idxs, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank_s = idxs - seg_start                                # 0,1,2,… within voxel
    rank = jnp.zeros(N, jnp.int32).at[order].set(rank_s.astype(jnp.int32))

    # reject within-batch overflow beyond bucket capacity up front
    pending = valid & (rank < bucket)

    def probe_body(p, carry):
        coords_a, points_a, counts_a, total, pending = carry
        slot = ((h + p) & (capacity - 1)).astype(jnp.int32)

        slot_count = counts_a[slot]                          # (N,)
        slot_coords = coords_a[slot]                         # (N,3)
        occupied = slot_count > 0
        match = occupied & jnp.all(slot_coords == vc, axis=-1)
        empty = ~occupied

        # elect one claimant point per empty slot (scatter-min of point index)
        want_claim = pending & empty
        claim_tbl = jnp.full((capacity,), _INT_MAX, jnp.int32)
        claim_tbl = claim_tbl.at[jnp.where(want_claim, slot, capacity - 1)].min(
            jnp.where(want_claim, idxs.astype(jnp.int32), _INT_MAX),
            mode="drop",
        )
        winner = want_claim & (claim_tbl[slot] == idxs)
        # publish winners' coords so same-voxel siblings resolve here too
        coords_a = coords_a.at[jnp.where(winner, slot, capacity)].set(vc, mode="drop")

        # a point resolves at this slot if the (possibly fresh) resident
        # voxel is its own
        resident = jnp.all(coords_a[slot] == vc, axis=-1) & (occupied | (claim_tbl[slot] != _INT_MAX))
        resolves = pending & resident

        # placement position = existing count + within-batch rank
        pos = slot_count + rank
        place = resolves & (pos < bucket)
        flat = jnp.where(place, slot * bucket + pos, capacity * bucket)
        points_a = points_a.reshape(capacity * bucket, 3).at[flat].set(pts, mode="drop")
        points_a = points_a.reshape(capacity, bucket, 3)

        placed_n = place.astype(jnp.int32)
        counts_a = counts_a.at[jnp.where(place, slot, capacity)].add(placed_n, mode="drop")
        # ensure claimed-but-unfilled slots still count as occupied: a winner
        # always has rank 0 → pos 0 < bucket, so it always places. (bucket>=1)
        total = total + jnp.sum(placed_n, dtype=jnp.int32)

        pending = pending & ~resolves  # resolved (placed or bucket-full drop)
        return coords_a, points_a, counts_a, total, pending

    # points that resolve at a full bucket are dropped (octree downsample rule)
    coords_a, points_a, counts_a, total, pending = jax.lax.fori_loop(
        0, probes, probe_body,
        (m.coords, m.points, m.counts, jnp.asarray(0, jnp.int32), pending),
    )
    # any still-pending points exhausted the probe budget → dropped.
    return VoxelHashMap(coords_a, points_a, counts_a, m.num_points + total, m.last_time)


@functools.partial(jax.jit, static_argnames=("voxel_size", "probes", "k", "num_shards"))
def knn(m: VoxelHashMap, queries, *, voxel_size: float, k: int, probes: int = 16,
        num_shards: int = 1, shard_index=0
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bounded k-nearest-neighbors over the 27-voxel neighborhood.

    queries: (N,3) world-frame points.
    Returns (neighbors (N,k,3), sq_dists (N,k) ascending, valid (N,k)).
    Matches the octree-kNN contract used by Mapper::match_plane
    (Mapper.cpp:100-114): squared distances, ascending.

    Sharded mode: neighbor voxels owned by other devices are treated as
    absent — callers all_gather the per-shard top-k and re-merge.
    """
    capacity = m.coords.shape[0]
    bucket = m.points.shape[1]
    N = queries.shape[0]

    qc = voxel_coords(queries, voxel_size)                     # (N,3)
    nc = qc[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :]        # (N,27,3)
    if num_shards > 1:
        h_full = _hash(nc, capacity * num_shards)
        owned = (h_full // jnp.int32(capacity)) == shard_index
        h = (h_full % jnp.int32(capacity)).astype(jnp.int32)
    else:
        owned = None
        h = _hash(nc, capacity)                                # (N,27)

    def probe_body(p, carry):
        found_slot, done = carry
        slot = ((h + p) & (capacity - 1)).astype(jnp.int32)
        occupied = m.counts[slot] > 0
        match = occupied & jnp.all(m.coords[slot] == nc, axis=-1)
        found_slot = jnp.where(~done & match, slot, found_slot)
        # empty slot terminates the probe chain (no deletions ⇒ absent)
        done = done | match | ~occupied
        return found_slot, done

    found_slot, _ = jax.lax.fori_loop(
        0, probes, probe_body,
        (jnp.full((N, 27), capacity, jnp.int32), jnp.zeros((N, 27), bool)),
    )

    hit = found_slot < capacity                                # (N,27)
    if owned is not None:
        hit = hit & owned
    slot_safe = jnp.where(hit, found_slot, 0)
    cand_pts = m.points[slot_safe]                             # (N,27,B,3)
    cand_n = jnp.where(hit, m.counts[slot_safe], 0)            # (N,27)
    cand_valid = (
        jnp.arange(bucket, dtype=jnp.int32)[None, None, :] < cand_n[..., None]
    )                                                          # (N,27,B)

    diff = cand_pts - queries[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)                         # (N,27,B)
    d2 = jnp.where(cand_valid, d2, jnp.inf)

    d2_flat = d2.reshape(N, 27 * bucket)
    neg_top, top_idx = jax.lax.top_k(-d2_flat, k)              # ascending dist
    sq = -neg_top
    pts_flat = cand_pts.reshape(N, 27 * bucket, 3)
    nbrs = jnp.take_along_axis(pts_flat, top_idx[..., None], axis=1)
    valid = jnp.isfinite(sq)
    return nbrs, jnp.where(valid, sq, jnp.inf), valid
