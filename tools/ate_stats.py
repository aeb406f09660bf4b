"""Statistical ATE evaluation: determinism probe + multi-seed ATE bands.

Addresses the round-1 verdict items W1/W2: (a) verify that a fixed-seed
replay through the jitted pipeline is bit-stable (it should be — the whole
hot path is one XLA program over deterministic inputs), and (b) report ATE
as mean/max over several seeds for BOTH knob sets —

  * ``fast``  — the bench config (knn_refresh="first", 4-voxel nearest-corner
                neighborhood, int16 transfer),
  * ``exact`` — reference-exact semantics (knn_refresh="always",
                27-voxel cube, f32 transfer; Mapper.cpp:59-114 re-matches
                every iteration over the full neighborhood),

on BOTH scenes —

  * ``benign``      — the dense corridor world the bench uses,
  * ``adversarial`` — sparse geometry (5× fewer wall/ground points) with an
                      aggressive yaw profile (~90°/s peak) that stresses the
                      4-voxel neighborhood's lack of a coverage guarantee.

Usage:  tools/tpu_run.sh 900 python tools/ate_stats.py [quick]

Prints one JSON line; also written to ATE_STATS.json at the repo root.
Run ONE at a time on the TPU (tools/tpu_run.sh serializes).
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import numpy as np  # noqa: E402

import jax  # noqa: E402

from fast_limo_tpu.io import synthetic  # noqa: E402
from fast_limo_tpu.models.localizer import Localizer  # noqa: E402

from bench import exact_cfg, kitti_like_cfg, make_seq  # noqa: E402

N_SCANS = 48


def make_cfg(knobs: str):
    return exact_cfg() if knobs == "exact" else kitti_like_cfg()


def run_once(cfg, seq):
    """Replay the sequence; return (est_pos, ate)."""
    loc = Localizer(cfg)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(seq.n_scans)]
    si = 0
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < seq.n_scans and scans[si][0] <= stamps[k]:
            st_, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st_)
            si += 1
    jax.block_until_ready(loc.state)
    est = loc.positions()
    gt = seq.traj.pos(loc.stamps())
    return est, synthetic.ate_rmse(est, gt)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    seeds = [3, 7] if quick else [3, 5, 7, 11, 13]

    # ---- determinism probe: same seed, same binary, twice ----
    cfg = make_cfg("fast")
    seq = make_seq("benign", 7, N_SCANS)
    est_a, ate_a = run_once(cfg, seq)
    est_b, ate_b = run_once(cfg, seq)
    det_max_diff = float(np.max(np.abs(est_a - est_b)))

    results = {}
    for knobs in ("fast", "exact"):
        cfg = make_cfg(knobs)
        for scene in ("benign", "adversarial"):
            ates = []
            for seed in seeds:
                _, ate = run_once(cfg, make_seq(scene, seed, N_SCANS))
                ates.append(round(float(ate), 4))
                print(f"# {knobs}/{scene} seed={seed}: ATE {ate:.4f} m",
                      file=sys.stderr, flush=True)
            results[f"{knobs}_{scene}"] = {
                "ate_mean": round(float(np.mean(ates)), 4),
                "ate_max": round(float(np.max(ates)), 4),
                "ate_per_seed": ates,
            }

    out = {
        "metric": "ate_stats",
        "n_scans": N_SCANS,
        "seeds": seeds,
        "determinism_max_pos_diff_m": det_max_diff,
        "deterministic": bool(det_max_diff == 0.0),
        **results,
        "device": str(jax.devices()[0]),
    }
    line = json.dumps(out)
    print(line, flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "ATE_STATS.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
