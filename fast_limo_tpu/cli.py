"""Command-line entry point — the counterpart of the reference's ROS node
(`src/main.cpp`): wire a data source to the engine, print the performance
board, write the trajectory.

Usage:
    python -m fast_limo_tpu.cli synthetic --scans 50 --out traj.tum
    python -m fast_limo_tpu.cli kitti --drive /path/to/drive --config configs/kitti_tpu.yaml
"""

from __future__ import annotations

import argparse
import json
import sys


def _build(args):
    from fast_limo_tpu.models.slam import SLAM
    from fast_limo_tpu.utils.config import Config

    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.no_loop:
        return cfg, SLAM(cfg, enable_loop_closure=False)
    return cfg, SLAM(cfg)


def cmd_synthetic(args):
    import numpy as np

    from fast_limo_tpu.io import synthetic
    from fast_limo_tpu.utils import evaluation

    cfg, slam = _build(args)
    cfg.gravity_align = cfg.calibrate_accel = cfg.calibrate_gyro = False
    cfg.intrinsics.accel_bias = [0.0] * 3
    cfg.intrinsics.gyro_bias = [0.0] * 3

    seq = synthetic.SyntheticSequence(
        seed=args.seed, n_scans=args.scans,
        points_per_scan=min(cfg.tpu.max_points_per_scan, 16384))
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(args.scans)]
    si = 0
    for k in range(len(stamps)):
        slam.update_imu(stamps[k], acc[k], gyro[k])
        while si < args.scans and scans[si][0] <= stamps[k]:
            st, pts, traw = scans[si]
            slam.update_pointcloud(pts, traw, st)
            si += 1

    est = slam.positions()
    gt = seq.traj.pos(slam.stamps())
    ate = evaluation.ate_rmse(est, gt)
    print(slam.loc.board())
    print(json.dumps({"scans": len(est), "ate_m": round(ate, 4),
                      "loops": slam.n_loops_closed}))
    if args.out:
        traj = slam.trajectory
        evaluation.save_tum(args.out, [t["stamp"] for t in traj],
                            [t["pos"] for t in traj], [t["quat"] for t in traj])
        print(f"trajectory → {args.out}")
    if args.save_session:
        slam.save_session(args.save_session)
        print(f"session → {args.save_session}.*")


def cmd_kitti(args):
    from fast_limo_tpu.io import kitti
    from fast_limo_tpu.utils import evaluation

    cfg, slam = _build(args)
    drive = kitti.KittiDrive(args.drive)
    kitti.run_drive(slam, drive, n_scans=args.scans)
    print(slam.loc.board())
    if args.out:
        traj = slam.trajectory
        evaluation.save_tum(args.out, [t["stamp"] for t in traj],
                            [t["pos"] for t in traj], [t["quat"] for t in traj])
        print(f"trajectory → {args.out}")
    if args.save_session:
        slam.save_session(args.save_session)


def main(argv=None):
    p = argparse.ArgumentParser(prog="fast_limo_tpu")
    p.add_argument("--config", default=None, help="YAML profile (reference format ok)")
    p.add_argument("--out", default=None, help="write TUM trajectory here")
    p.add_argument("--save-session", default=None, help="session prefix to save")
    p.add_argument("--no-loop", action="store_true", help="odometry only")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synthetic", help="run the synthetic benchmark world")
    ps.add_argument("--scans", type=int, default=50)
    ps.add_argument("--seed", type=int, default=0)
    ps.set_defaults(fn=cmd_synthetic)

    pk = sub.add_parser("kitti", help="run a KITTI raw-sync drive")
    pk.add_argument("--drive", required=True)
    pk.add_argument("--scans", type=int, default=None)
    pk.set_defaults(fn=cmd_kitti)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
