"""Incremental voxel-hash map — the TPU-native equivalent of the reference's
incremental octree (`include/fast_limo/Objects/Octree.hpp`).

The octree's pointer-chasing kNN cannot map to TPU; instead the map is a
fixed-capacity open-addressing hash table of voxel buckets:

* ``meta (C,4) int32`` — [vx, vy, vz, count] per slot, PACKED so that probe
  rounds cost a single 16-byte row gather instead of four separate ones
  (gathers are the hot operation on TPU — SURVEY.md hot loop #2)
* ``points (C,B,3) float32`` — up to B points stored per voxel

Insertion is batched and fully vectorized: per-voxel ranks via a sorted
segment scan, slot claiming via scatter-min election, bounded linear probing
(`fori_loop` over a static probe count).  The per-voxel capacity B mirrors
the octree's leaf-level downsampling rule — a full bucket rejects new points
(Octree.hpp:399-405) — and the voxel edge defaults to ``2*min_extent`` (the
finest octree leaf is in ``(min_extent, 2*min_extent]``, Octree.hpp:310,385).

kNN = gather the 3³ neighbor voxels of each query, mask, and take the k
smallest squared distances (Octree.hpp:527-598 contract: ascending sq-dists).
It is split into `gather_neighborhood` (probe + bucket gather — depends only
on the query VOXELS) and `topk_from_candidates` (distances + top-k) so the
iterated update can hoist the expensive gather out of its re-match loop.

Sharded mode (num_shards > 1): a voxel's owner device is the high bits of
its global hash; probe chains stay entirely device-local.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_INT_MAX = jnp.iinfo(jnp.int32).max

_NEIGHBOR_OFFSETS = jnp.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=jnp.int32,
)  # (27, 3)

_CORNER_COMBOS = jnp.array(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
    dtype=jnp.int32,
)  # (8, 3)


class VoxelHashMap(NamedTuple):
    meta: jnp.ndarray        # (C, 4) int32: voxel coords + count (0 = free)
    points: jnp.ndarray      # (C, B, 3) float32
    num_points: jnp.ndarray  # () int32  (Mapper::size, Mapper.cpp:51-53)
    last_time: jnp.ndarray   # () float32 (Mapper::last_time)

    @property
    def coords(self):
        return self.meta[:, 0:3]

    @property
    def counts(self):
        return self.meta[:, 3]

    @property
    def capacity(self):
        return self.meta.shape[0]

    @property
    def bucket(self):
        return self.points.shape[1]


def create(capacity: int, bucket: int, dtype=jnp.float32) -> VoxelHashMap:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return VoxelHashMap(
        meta=jnp.zeros((capacity, 4), jnp.int32),
        points=jnp.zeros((capacity, bucket, 3), dtype),
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


def _shard_split(h_full, capacity, num_shards, shard_index):
    owner = h_full // jnp.int32(capacity)
    local = (h_full % jnp.int32(capacity)).astype(jnp.int32)
    return owner == shard_index, local


# ---------------------------------------------------------------------------
# insert
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("voxel_size", "probes", "num_shards"))
def insert(m: VoxelHashMap, pts, valid, *, voxel_size: float, probes: int = 8,
           num_shards: int = 1, shard_index=0) -> VoxelHashMap:
    """Insert a masked batch of world-frame points (Mapper::add / Octree::update)."""
    capacity = m.capacity
    bucket = m.bucket
    N = pts.shape[0]

    vc = voxel_coords(pts, voxel_size)                       # (N,3)
    if num_shards > 1:
        owned, h = _shard_split(_hash(vc, capacity * num_shards),
                                capacity, num_shards, shard_index)
        valid = valid & owned
    else:
        h = _hash(vc, capacity)

    # ---- group same-voxel points: sort by voxel and rank within voxel ----
    # 2-pass lexsort on (packed xy, z) instead of 4 keys: x,y are packed into
    # 30 bits (grouping-only — collisions need Δ=2^15 voxels ≈ 26 km inside
    # ONE scan batch, impossible), invalid points get a reserved max key so
    # they sort last and can never interleave a real voxel's run. Group
    # membership is still verified on the exact coords below (same_prev).
    packed_xy = ((vc[:, 0] & 0x7FFF) << 15) | (vc[:, 1] & 0x7FFF)
    key_hi = jnp.where(valid, packed_xy, jnp.int32(0x7FFFFFFF))
    order = jnp.lexsort((vc[:, 2], key_hi))
    vc_s = vc[order]
    valid_s = valid[order]
    same_prev = jnp.concatenate(
        [jnp.array([False]), jnp.all(vc_s[1:] == vc_s[:-1], axis=-1) & valid_s[1:] & valid_s[:-1]]
    )
    idxs = jnp.arange(N)
    seg_start = jnp.where(~same_prev, idxs, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank_s = idxs - seg_start                                # 0,1,2,… within voxel
    rank = jnp.zeros(N, jnp.int32).at[order].set(rank_s.astype(jnp.int32))

    pending = valid & (rank < bucket)

    # unpack meta for the probe loop: column scatters into the packed (C,4)
    # layout lower to a slow XLA scatter path; separate (C,3)/(C,) arrays
    # scatter at full speed and are repacked once at the end.
    coords_a0 = m.meta[:, 0:3]
    counts_a0 = m.meta[:, 3]

    def probe_body(p, carry):
        coords_a, counts_a, points_a, total, pending = carry
        slot = ((h + p) & (capacity - 1)).astype(jnp.int32)

        slot_count = counts_a[slot]
        occupied = slot_count > 0
        empty = ~occupied

        # elect one claimant point per empty slot (scatter-min of point index)
        want_claim = pending & empty
        claim_tbl = jnp.full((capacity,), _INT_MAX, jnp.int32)
        claim_tbl = claim_tbl.at[jnp.where(want_claim, slot, capacity - 1)].min(
            jnp.where(want_claim, idxs.astype(jnp.int32), _INT_MAX), mode="drop")
        winner = want_claim & (claim_tbl[slot] == idxs)
        # publish winners' coords (count still 0 until placement below)
        coords_a = coords_a.at[jnp.where(winner, slot, capacity)].set(
            vc, mode="drop")

        resident = jnp.all(coords_a[slot] == vc, axis=-1) & (
            occupied | (claim_tbl[slot] != _INT_MAX))
        resolves = pending & resident

        pos = slot_count + rank
        place = resolves & (pos < bucket)
        flat = jnp.where(place, slot * bucket + pos, capacity * bucket)
        points_a = points_a.reshape(capacity * bucket, 3).at[flat].set(
            pts, mode="drop").reshape(capacity, bucket, 3)

        placed_n = place.astype(jnp.int32)
        counts_a = counts_a.at[jnp.where(place, slot, capacity)].add(
            placed_n, mode="drop")
        total = total + jnp.sum(placed_n, dtype=jnp.int32)

        pending = pending & ~resolves  # resolved (placed or bucket-full drop)
        return coords_a, counts_a, points_a, total, pending

    coords_a, counts_a, points_a, total, pending = jax.lax.fori_loop(
        0, probes, probe_body,
        (coords_a0, counts_a0, m.points, jnp.asarray(0, jnp.int32), pending),
    )
    meta_a = jnp.concatenate([coords_a, counts_a[:, None]], axis=1)
    return VoxelHashMap(meta_a, points_a, m.num_points + total, m.last_time)


# ---------------------------------------------------------------------------
# kNN
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("voxel_size", "probes",
                                             "num_shards", "neighborhood"))
def gather_neighborhood(m: VoxelHashMap, queries, *, voxel_size: float,
                        probes: int = 8, num_shards: int = 1, shard_index=0,
                        neighborhood: int = 27):
    """Resolve each query's voxel neighborhood and gather the buckets.

    ``neighborhood`` selects the candidate set (V voxels per query):
    * 27 — the full 3³ cube: every point within one voxel edge of the
      query's voxel is a candidate (guaranteed coverage radius = voxel_size).
    * 8 — nearest-corner 2³ (the iVox/Faster-LIO trick): the query's voxel
      plus the 7 voxels touching its nearest corner. Guarantees every point
      within voxel_size/2 of the query is found; 3.4× less gather traffic
      (the dominant cost of the scan step). With the default 0.8 m voxels
      the k-th match distance is well under the 0.4 m guarantee in mapped
      regions, so matching is unchanged in practice (validated by ATE).

    Depends only on each query's VOXEL (the sub-voxel offset only picks the
    corner), so it can be computed once per scan and reused across update
    iterations (pose shifts are millimetric).
    Returns (cand_pts (N,V,B,3), cand_valid (N,V,B)).
    """
    assert neighborhood in (8, 27)
    capacity = m.capacity
    bucket = m.bucket
    N = queries.shape[0]

    qc = voxel_coords(queries, voxel_size)                     # (N,3)
    if neighborhood == 27:
        nc = qc[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :]    # (N,27,3)
    else:
        # offset 0 or ±1 per axis, toward the query's nearest corner
        frac = queries / voxel_size - qc.astype(queries.dtype)   # [0,1)
        step = jnp.where(frac >= 0.5, 1, -1).astype(jnp.int32)   # (N,3)
        nc = qc[:, None, :] + _CORNER_COMBOS[None, :, :] * step[:, None, :]
    if num_shards > 1:
        owned, h = _shard_split(_hash(nc, capacity * num_shards),
                                capacity, num_shards, shard_index)
    else:
        owned = None
        h = _hash(nc, capacity)

    # sequential probe loop: one packed 16-byte row gather per round.
    # (A single wide (N,27,P,4) gather was measured SLOWER on v5e — 28 ms
    # vs 18 ms — the huge scattered gather loses to 8 smaller ones.)
    def probe_body(p, carry):
        found_slot, done = carry
        slot = ((h + p) & (capacity - 1)).astype(jnp.int32)
        meta = m.meta[slot]                                    # (N,27,4)
        occupied = meta[..., 3] > 0
        match = occupied & jnp.all(meta[..., 0:3] == nc, axis=-1)
        found_slot = jnp.where(~done & match, slot, found_slot)
        done = done | match | ~occupied  # empty slot terminates the chain
        return found_slot, done

    V = nc.shape[1]
    found_slot, _ = jax.lax.fori_loop(
        0, probes, probe_body,
        (jnp.full((N, V), capacity, jnp.int32), jnp.zeros((N, V), bool)),
    )

    hit = found_slot < capacity
    if owned is not None:
        hit = hit & owned
    slot_safe = jnp.where(hit, found_slot, 0)
    cand_pts = m.points[slot_safe]                             # (N,27,B,3)
    cand_n = jnp.where(hit, m.meta[slot_safe, 3], 0)           # (N,27)
    cand_valid = (
        jnp.arange(bucket, dtype=jnp.int32)[None, None, :] < cand_n[..., None]
    )
    return cand_pts, cand_valid


@functools.partial(jax.jit, static_argnames=("k",))
def topk_from_candidates(cand_pts, cand_valid, queries, *, k: int):
    """k smallest squared distances among the candidate buckets (ascending)."""
    N = queries.shape[0]
    diff = cand_pts - queries[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_valid, d2, jnp.inf)
    d2_flat = d2.reshape(N, -1)
    neg_top, top_idx = jax.lax.top_k(-d2_flat, k)
    sq = -neg_top
    nbrs = jnp.take_along_axis(cand_pts.reshape(N, -1, 3), top_idx[..., None], axis=1)
    valid = jnp.isfinite(sq)
    return nbrs, jnp.where(valid, sq, jnp.inf), valid


@functools.partial(jax.jit, static_argnames=("voxel_size",))
def evict_far(m: VoxelHashMap, center, radius: float, *, voxel_size: float) -> VoxelHashMap:
    """Rolling-origin eviction: free every voxel farther than ``radius`` from
    ``center`` (world frame).

    The reference's octree grows without bound (no eviction; UTBM-length
    sequences rely on RAM); a fixed-capacity hash table needs to recycle
    slots. Clearing a slot re-opens it for insertion; lookups treat empty
    slots as chain terminators, which is safe because any chain running
    through a cleared slot belonged to voxels that were ALSO near-ish the
    old origin — stale unreachable entries get overwritten by later inserts.
    A full rebuild (SLAM._rebuild_map) restores a clean table when exact
    chains matter.
    """
    cvox = jnp.asarray(center) / voxel_size
    d2 = jnp.sum((m.meta[:, 0:3].astype(jnp.float32) + 0.5 - cvox) ** 2, axis=-1)
    keep = (d2 * (voxel_size * voxel_size)) <= radius * radius
    occupied = m.meta[:, 3] > 0
    removed = jnp.sum(jnp.where(occupied & ~keep, m.meta[:, 3], 0), dtype=jnp.int32)
    meta = jnp.where((occupied & ~keep)[:, None],
                     jnp.zeros_like(m.meta), m.meta)
    return m._replace(meta=meta, num_points=m.num_points - removed)


def knn(m: VoxelHashMap, queries, *, voxel_size: float, k: int, probes: int = 8,
        num_shards: int = 1, shard_index=0, neighborhood: int = 27
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bounded kNN over the voxel neighborhood (gather + top-k)."""
    cand_pts, cand_valid = gather_neighborhood(
        m, queries, voxel_size=voxel_size, probes=probes,
        num_shards=num_shards, shard_index=shard_index,
        neighborhood=neighborhood)
    return topk_from_candidates(cand_pts, cand_valid, queries, k=k)
