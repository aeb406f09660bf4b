"""Fixed-shape voxel-grid centroid downsampling.

Counterpart of the PCL `VoxelGrid` filter the reference applies to the
deskewed scan before matching (Localizer.cpp:313-321).  PCL replaces the
points of each occupied leaf with their centroid; here that is a sort +
segmented mean under jit with a validity mask.

Quirk preserved: the reference sets all three leaf dimensions from
``leafSize[0]`` (Localizer.cpp:61) — callers should pass a scalar leaf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_downsample(pts, valid, leaf: float):
    """Centroid-per-voxel downsample at fixed shape.

    pts: (N,3), valid: (N,). Returns (out_pts (N,3), out_valid (N,)) where
    out_valid marks one centroid per occupied voxel, compacted to the front
    in voxel-sorted order.
    """
    N = pts.shape[0]
    vc = jnp.floor(pts / leaf).astype(jnp.int32)

    order = jnp.lexsort((vc[:, 2], vc[:, 1], vc[:, 0], (~valid).astype(jnp.int32)))
    vc_s = vc[order]
    valid_s = valid[order]
    pts_s = jnp.where(valid_s[:, None], pts[order], 0.0)

    new_seg = jnp.concatenate(
        [jnp.array([True]), jnp.any(vc_s[1:] != vc_s[:-1], axis=-1)]
    ) & valid_s

    # segment ids: 0..S-1 for valid segments (invalid tail gets garbage ids, masked)
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    seg_id = jnp.where(valid_s, seg_id, N - 1)

    sums = jnp.zeros((N, 3), pts.dtype).at[seg_id].add(pts_s)
    cnts = jnp.zeros((N,), jnp.int32).at[seg_id].add(valid_s.astype(jnp.int32))

    n_seg = jnp.sum(new_seg)
    out_valid = jnp.arange(N) < n_seg
    centroids = sums / jnp.maximum(cnts, 1)[:, None]
    return jnp.where(out_valid[:, None], centroids, 0.0), out_valid
