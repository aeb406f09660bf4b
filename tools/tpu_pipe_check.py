"""In-pipeline device validation: run N synthetic scans with Pallas kernels
ON vs selectively disabled, compare ATE + n_pc2match.

The round-3 lesson (memory: pallas-kernel-validation-workflow): isolated
kernel probes pass while the pipeline breaks — a broken kNN/match kernel
shows up as n_pc2match collapsing to ~1 (pure dead reckoning), not as a
crash.  Run this ON DEVICE after any kernel/map change, before trusting
bench numbers.

  tools/tpu_run.sh 900 python tools/tpu_pipe_check.py [--scans 12] \
      [--kernels knn,hstats,update_body,update_loop,sort]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
import bench
from fast_limo_tpu.models.localizer import Localizer

n = %(scans)d
cfg = bench.kitti_like_cfg()
seq = bench.make_seq("benign", 7, n)
loc = Localizer(cfg)
stamps, acc, gyro = seq.imu_stream()
scans = [seq.scan(i) for i in range(n)]
si = 0
while si < n:
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < n and scans[si][0] <= stamps[k]:
            st_, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st_)
            si += 1
    break
jax.block_until_ready(loc.state)
from fast_limo_tpu.io import synthetic
est = loc.positions()
gt = seq.traj.pos(loc.stamps())
ate = synthetic.ate_rmse(est, gt)
n_m = [int(t["n_pc2match"]) for t in loc.trajectory]
print("RESULT " + json.dumps({"ate": ate, "n_pc2match_last": n_m[-1],
                              "n_pc2match_min": min(n_m[1:]) if len(n_m) > 1 else 0,
                              "pos_last": np.asarray(est)[-1].tolist()}))
"""


def run_child(scans, no_pallas):
    env = dict(os.environ)
    if no_pallas:
        env["FAST_LIMO_NO_PALLAS"] = no_pallas
    else:
        env.pop("FAST_LIMO_NO_PALLAS", None)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO, "scans": scans}],
        capture_output=True, text=True, env=env, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    print(out.stdout[-3000:], file=sys.stderr)
    print(out.stderr[-3000:], file=sys.stderr)
    raise SystemExit(f"child failed (rc={out.returncode})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=12)
    ap.add_argument("--kernels", default="all")
    args = ap.parse_args()

    on = run_child(args.scans, None)
    off = run_child(args.scans, args.kernels)
    print(f"kernels ON : {on}")
    print(f"kernels OFF: {off}")
    d_ate = abs(on["ate"] - off["ate"])
    ok = (d_ate < 0.02
          and on["n_pc2match_min"] > 100
          and abs(on["n_pc2match_last"] - off["n_pc2match_last"]) < 50)
    print(json.dumps({"ok": ok, "d_ate": round(d_ate, 4),
                      "ate_on": round(on["ate"], 4),
                      "ate_off": round(off["ate"], 4)}))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
