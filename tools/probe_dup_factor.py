"""Measure the kNN gather's duplicate-row factor on realistic data.

ROADMAP lever "gather row reduction": deduping (query-voxel, corner) pairs
batch-wide only pays if the duplicate factor among the (N,V) gathered group
rows exceeds the cost of building the unique set (~1 sort of N·V keys).
This probe replays a short bench-shaped stream and reports, for the final
scan's pc2match queries: total rows, distinct group ids, distinct
(voxel, corner-step) keys, and the implied dup factors for V ∈ {4, 8, 27}.

Runs fine on CPU:  python tools/probe_dup_factor.py [--scans 12]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from fast_limo_tpu.io import synthetic  # noqa: E402
from fast_limo_tpu.models import mapper  # noqa: E402
from fast_limo_tpu.models.localizer import Localizer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=12)
    args = ap.parse_args()

    cfg = bench.kitti_like_cfg()
    cfg.tpu.quantize_transfer = 0.0
    seq = bench.make_seq("benign", 7, args.scans)
    loc = Localizer(cfg)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(args.scans)]
    si = 0
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < args.scans and scans[si][0] <= stamps[k]:
            st_, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st_)
            si += 1
    jax.block_until_ready(loc.state)

    # reconstruct the final scan's query set: world-frame pc2match
    out = loc.last_output
    body = np.asarray(out.scan_body)
    valid = np.asarray(out.final_valid)
    pos, quat = np.asarray(out.pos), np.asarray(out.quat)
    from fast_limo_tpu.ops import so3

    glob = np.asarray(so3.quat_rotate(jnp.asarray(quat), jnp.asarray(body))
                      ) + pos
    glob = glob[valid]
    n_q = min(len(glob), cfg.ikfom.mapping.MAX_NUM_PC2MATCH)
    glob = glob[:n_q]
    print(f"# queries: {n_q} (of cap {cfg.ikfom.mapping.MAX_NUM_PC2MATCH})")

    m = loc.state.map
    vox = cfg.map_voxel_size
    for V in (4, 8, 27):
        _rows, nc, _owned = mapper.gather_rows(
            m, jnp.asarray(glob), voxel_size=vox, neighborhood=V)
        nc = np.asarray(nc).reshape(-1, 3)
        g = np.asarray(mapper._hash(jnp.asarray(nc), m.groups))
        total = len(g)
        uniq_g = len(np.unique(g))
        key = (nc[:, 0].astype(np.int64) * 73728 * 73728
               + nc[:, 1].astype(np.int64) * 73728 + nc[:, 2])
        uniq_vox = len(np.unique(key))
        print(f"V={V:2d}: rows={total:7d} distinct_groups={uniq_g:6d} "
              f"distinct_voxels={uniq_vox:6d} "
              f"dup_factor={total / max(uniq_vox, 1):.2f}")

    # dedupe of whole PER-QUERY candidate sets (voxel+step key): how many
    # queries share an identical candidate neighborhood?
    qc = np.floor(glob / vox).astype(np.int64)
    frac = glob / vox - qc
    step = np.where(frac >= 0.5, 1, 0).astype(np.int64)
    qkey = ((qc[:, 0] * 73728 + qc[:, 1]) * 73728 + qc[:, 2]) * 8 \
        + step[:, 0] * 4 + step[:, 1] * 2 + step[:, 2]
    uq = len(np.unique(qkey))
    print(f"distinct (query-voxel, corner) keys: {uq} of {n_q} "
          f"(query dup factor {n_q / max(uq, 1):.2f})")


if __name__ == "__main__":
    main()
