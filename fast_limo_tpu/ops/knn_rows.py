"""Fused kNN selection kernel: raw gathered PLANAR block rows → k nearest.

The kNN stage (reference Octree::knn, Octree.hpp:527-598; here a
block-addressed voxel-hash lookup) is: gather each query's V neighbor-BLOCK
group rows (one XLA gather, per-row cost), then keep every entry whose
stored voxel lies in the wanted block, mask bucket slots, compute squared
distances, and keep the k smallest.

The map's planar layout (models/mapper.py VoxelHashMap docstring) makes the
decode pure static lane-plane slices: each gathered row splits into SUB
planar subgroups, and per subgroup the row region is

    [vx×E | vy×E | vz×E | cnt×E | x slot-major E·B | y | z]

so block matching is an (BLK,E) floor-compare, slot validity a B-fold lane
TILE of it, and distances plain elementwise math — no per-lane register
columns (which blow the 16 MB VMEM stack) and no one-hot selector matmuls
(which burn ~1 ms of f32 MXU per scan; both alternatives measured on v5e).
Unlike the voxel-hashed design, EVERY matching entry of a row contributes
its bucket (a block holds up to E·SUB spatially-adjacent voxels), so no
entry gets collapsed away.  Only the (N,k) results reach HBM after the
gather.

`topk_from_rows_reference` is the identical-semantics jnp path (CPU tests,
sharded mode).
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

_BLK = 512  # queries per grid step


def _kernel(rows_ref, nc_ref, qx_ref, qy_ref, qz_ref,
            sq_ref, nx_ref, ny_ref, nz_ref,
            *, V: int, SUB: int, E: int, B: int, k: int, WP0: int):
    f32 = jnp.float32
    EB = E * B
    BLK = rows_ref.shape[0]
    qx, qy, qz = qx_ref[:, :], qy_ref[:, :], qz_ref[:, :]   # (BLK,1)

    d2_parts, px_parts, py_parts, pz_parts = [], [], [], []
    for vs in range(V * SUB):
        o = vs * WP0
        onc = 4 * (vs // SUB)        # block coords are per SUPER-row
        vx = rows_ref[:, o:o + E]                        # (BLK,E)
        vy = rows_ref[:, o + E:o + 2 * E]
        vz = rows_ref[:, o + 2 * E:o + 3 * E]
        cnt = rows_ref[:, o + 3 * E:o + 4 * E]
        bx = nc_ref[:, onc:onc + 1]                      # (BLK,1)
        by = nc_ref[:, onc + 1:onc + 2]
        bz = nc_ref[:, onc + 2:onc + 3]
        # stored voxel → block: floor(v/2) exact in f32 for |v| < 2^24.
        # f32 mask (concatenating i1 vregs hits an unsupported Mosaic
        # bitcast), tiled B-fold to slot-major lanes
        match = ((cnt > 0.0) & (jnp.floor(vx * 0.5) == bx)
                 & (jnp.floor(vy * 0.5) == by)
                 & (jnp.floor(vz * 0.5) == bz)).astype(f32)

        x = rows_ref[:, o + 4 * E:o + 4 * E + EB]        # (BLK,EB) slot-major
        y = rows_ref[:, o + 4 * E + EB:o + 4 * E + 2 * EB]
        z = rows_ref[:, o + 4 * E + 2 * EB:o + 4 * E + 3 * EB]
        matchT = jnp.concatenate([match] * B, axis=1)    # (BLK,EB)
        cntT = jnp.concatenate([cnt] * B, axis=1)
        s_row = (jax.lax.broadcasted_iota(jnp.int32, (BLK, EB), 1)
                 // E).astype(f32)
        ok = (matchT > 0.0) & (cntT > s_row)

        dx = x - qx
        dy = y - qy
        dz = z - qz
        d2_parts.append(jnp.where(ok, dx * dx + dy * dy + dz * dz, jnp.inf))
        px_parts.append(x)
        py_parts.append(y)
        pz_parts.append(z)

    d2 = jnp.concatenate(d2_parts, axis=1)               # (BLK, V·SUB·EB)
    px = jnp.concatenate(px_parts, axis=1)
    py = jnp.concatenate(py_parts, axis=1)
    pz = jnp.concatenate(pz_parts, axis=1)

    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    for i in range(k):
        m = jnp.min(d2, axis=1, keepdims=True)           # (BLK,1)
        amin = jnp.argmin(d2, axis=1)[:, None]           # (BLK,1)
        hit = col == amin
        onehot = hit.astype(f32)
        sq_ref[:, i] = m[:, 0]
        nx_ref[:, i] = jnp.sum(px * onehot, axis=1)
        ny_ref[:, i] = jnp.sum(py * onehot, axis=1)
        nz_ref[:, i] = jnp.sum(pz * onehot, axis=1)
        d2 = jnp.where(hit, jnp.inf, d2)


@functools.partial(jax.jit, static_argnames=("E", "B", "k", "interpret"))
def topk_from_rows_tpu(rows, nc, queries, *, E: int, B: int, k: int,
                       interpret: bool = False):
    """rows (N,V,WP) f32 planar group rows, nc (N,V,3) int32 neighbor BLOCK
    coords, queries (N,3) → (nbrs (N,k,3), sq (N,k) ascending, valid (N,k)).
    """
    from fast_limo_tpu.models import mapper as mp

    N, V, WP = rows.shape
    WP0 = mp._sub_width(B)
    SUB = WP // WP0
    assert WP == SUB * WP0
    dtype = queries.dtype
    WA = (V * WP + 127) // 128 * 128   # lane-pad; padded lanes never sliced
    # queries per grid step, sized to the 16 MB VMEM stack: the compiler's
    # measured live set is ~66 KB/query at bench shapes (row block + the
    # d2/px/py/pz planes and their concat scratch) — blk 256 OOMs at 17 MB,
    # so pick the largest candidate under a 15 MB estimate.  Bigger blocks
    # amortize Mosaic per-op fixed costs over more sublanes.
    per_q = (WA + 17 * V * SUB * E * B) * 4   # 17 planes ≈ the compiler's
    blk = next((b for b in (256, 192, 128, 96, 64)  # 66 KB/q at bench shapes
                if b * per_q <= 15 * 2 ** 20), 64)
    Np = (N + blk - 1) // blk * blk

    rows2 = rows.reshape(N, V * WP)
    if WA > V * WP:
        rows2 = jnp.pad(rows2, ((0, 0), (0, WA - V * WP)))
    # coords padded to 4 lanes per block for aligned slicing
    ncf = jnp.concatenate(
        [nc.astype(jnp.float32),
         jnp.zeros((N, V, 1), jnp.float32)], axis=-1).reshape(N, V * 4)

    def padN(a, val=0.0):
        return jnp.pad(a, ((0, Np - N), (0, 0)), constant_values=val)

    rows2 = padN(rows2)
    ncf = padN(ncf, -1.0)   # block -1 ≠ floor(0/2) of an empty row's coords
    qx = padN(queries[:, 0:1].astype(jnp.float32))
    qy = padN(queries[:, 1:2].astype(jnp.float32))
    qz = padN(queries[:, 2:3].astype(jnp.float32))

    row_spec = pl.BlockSpec((blk, WA), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    nc_spec = pl.BlockSpec((blk, V * 4), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((blk, k), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    sq, nx, ny, nz = pl.pallas_call(
        functools.partial(_kernel, V=V, SUB=SUB, E=E, B=B, k=k, WP0=WP0),
        grid=(Np // blk,),
        in_specs=[row_spec, nc_spec, q_spec, q_spec, q_spec],
        out_specs=(out_spec,) * 4,
        out_shape=tuple(jax.ShapeDtypeStruct((Np, k), jnp.float32)
                        for _ in range(4)),
        interpret=interpret,
    )(rows2, ncf, qx, qy, qz)

    sq = sq[:N].astype(dtype)
    nbrs = jnp.stack([nx[:N], ny[:N], nz[:N]], axis=-1).astype(dtype)
    valid = jnp.isfinite(sq)
    return nbrs, jnp.where(valid, sq, jnp.inf), valid


def topk_from_rows_reference(rows, nc, queries, *, E: int, B: int, k: int):
    """Identical semantics in plain jnp (planar cands_from_rows + top_k)."""
    from fast_limo_tpu.models import mapper as mp

    cand_pts, cand_valid = mp.cands_from_rows(rows, nc, None, B)
    N = queries.shape[0]
    flat_pts = cand_pts.reshape(N, -1, 3).astype(queries.dtype)
    flat_valid = cand_valid.reshape(N, -1)
    diff = flat_pts - queries[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(flat_valid, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    sq = -neg
    nbrs = jnp.take_along_axis(flat_pts, idx[..., None], axis=1)
    valid = jnp.isfinite(sq)
    return nbrs, jnp.where(valid, sq, jnp.inf), valid
