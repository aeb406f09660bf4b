"""Measure map occupancy at voxel AND 2x2x2-block granularity.

Sizes the block-addressed map redesign (ROADMAP "direct-mapped 2x2x2 block
rows"): the block-hash load factor and the occupied-voxels-per-block
distribution decide how much associativity the block table needs to keep
its rejection probability at the current design's <1e-4 level.

Runs fine on CPU:  python tools/probe_block_occupancy.py [--scans 48]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from fast_limo_tpu.models.localizer import Localizer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=48)
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

    m = loc.state.map
    coords = np.asarray(m.coords)
    counts = np.asarray(m.counts)
    occ = counts > 0
    vc = coords[occ]
    n_vox = int(occ.sum())
    n_pts = int(counts[occ].sum())
    # block coord = floor(voxel/2) per dim
    bc = np.floor_divide(vc, 2)
    bkey = (bc[:, 0].astype(np.int64) * 73728 + bc[:, 1]) * 73728 + bc[:, 2]
    blocks, bcounts = np.unique(bkey, return_counts=True)
    n_blk = len(blocks)
    print(f"scans={args.scans} capacity={m.capacity} groups={m.groups} "
          f"bucket={m.bucket}")
    print(f"occupied voxels: {n_vox} ({n_vox / m.capacity:.3f} of capacity); "
          f"stored points: {n_pts}")
    print(f"occupied 2x2x2 blocks: {n_blk}  "
          f"mean occ voxels/block: {n_vox / max(n_blk, 1):.2f}")
    hist = np.bincount(bcounts, minlength=9)[1:9]
    print(f"voxels-per-block histogram (1..8): {hist.tolist()}")
    # implied block-table load + Poisson rejection estimate at a few G choices
    for log2G in (15, 16, 17, 18):
        G = 2 ** log2G
        lam = n_blk / G
        from math import exp, factorial
        for A in (1, 2):
            # E[(X-A)+] for X~Poisson(lam), truncated sum
            e = sum((k - A) * (lam ** k) * exp(-lam) / factorial(k)
                    for k in range(A + 1, 30))
            print(f"G=2^{log2G} A={A}: load={lam:.3f} "
                  f"lost_blocks~{e * G:.1f} ({e * G / max(n_blk, 1):.4%})")


if __name__ == "__main__":
    main()
