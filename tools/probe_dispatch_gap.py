"""Decompose the C=1 streaming inter-dispatch gap on the tunneled device.

Round-3 host-phase profile: host busy ~1.0 ms/scan (pack 0.38 + transfer
0.42 + call 0.22), device ~4.3 ms, yet wall ~7-9 ms/scan → ~2.5 ms of
device idle per dispatch.  This probe isolates WHERE the idle comes from by
timing N chained scan-step dispatches under three input regimes:

  A. device-resident inputs (no per-scan transfer at all)
  B. per-scan jnp.asarray transfer of the fused pack (the streaming path)
  C. B + full host pack (bench-identical)

and additionally times a no-op chain (dispatch RTT floor) and checks
whether transfers overlap compute (issue asarray for i+1 right after
dispatching i vs right before dispatching i+1 — identical host order to
the real loop vs an eager variant).

Run: tools/tpu_run.sh 900 python tools/probe_dispatch_gap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from fast_limo_tpu.models import pipeline as pl
from fast_limo_tpu.models.localizer import Localizer


def main():
    n_warm, n_meas = 8, 24
    cfg = bench.kitti_like_cfg()
    seq = bench.make_seq("benign", 7, n_warm + n_meas + 4)
    loc = Localizer(cfg)
    stamps, acc, gyro = seq.imu_stream()
    scans = [seq.scan(i) for i in range(n_warm + n_meas + 4)]

    # drive the localizer far enough to have a live state + compiled step,
    # capturing the packed input PAIRS it actually dispatches (split-step
    # layout: payload (N,4) + imu (K,8))
    packs = []
    orig_dispatch = loc._dispatch

    def capturing_dispatch(scan):
        sp, ip = loc._pack_scan(scan)
        packs.append((sp, ip))
        if loc.state is None:
            loc._init_device_state(scan.stamp)
        loc.state, out = loc.scan_step(loc.state, jnp.asarray(sp),
                                       jnp.asarray(ip))
        loc.last_output = out
        loc.last_output_scans = 1
        loc._raw_outputs.append((loc.epoch, out))

    loc._dispatch = capturing_dispatch
    si = 0
    for k in range(len(stamps)):
        loc.update_imu(stamps[k], acc[k], gyro[k])
        while si < len(scans) and scans[si][0] <= stamps[k]:
            st_, pts, traw = scans[si]
            loc.update_pointcloud(pts, traw, st_)
            si += 1
    jax.block_until_ready(loc.state)
    dev = jax.devices()[0]
    print(f"captured {len(packs)} packs on {dev}")

    step = loc.scan_step
    state0 = jax.tree_util.tree_map(jnp.copy, loc.state)

    def run_chain(feed, label, reps=3):
        ts = []
        for _ in range(reps):
            s = jax.tree_util.tree_map(jnp.copy, state0)
            jax.block_until_ready(s)
            t0 = time.perf_counter()
            s = feed(s)
            jax.block_until_ready(s)
            ts.append((time.perf_counter() - t0) / n_meas * 1e3)
        print(f"{label:56s}: {min(ts):6.2f} ms/scan  (reps {['%.2f' % t for t in ts]})")
        return min(ts)

    use = packs[4:4 + n_meas]

    # A: device-resident inputs
    dev_in = [(jax.device_put(sp), jax.device_put(ip)) for (sp, ip) in use]
    jax.block_until_ready(dev_in)

    def feed_resident(s):
        for (bs, bi) in dev_in:
            s, _ = step(s, bs, bi)
        return s
    run_chain(feed_resident, "A  device-resident inputs")

    # B: per-scan transfer of BOTH buffers right before dispatch
    def feed_transfer(s):
        for (sp, ip) in use:
            s, _ = step(s, jnp.asarray(sp), jnp.asarray(ip))
        return s
    run_chain(feed_transfer, "B  both transfers right before dispatch")

    # B2: production split pattern — payload i+1 uploaded right after
    # dispatch i (arrival-time copy), imu at dispatch
    def feed_split(s):
        bs = jnp.asarray(use[0][0])
        for i in range(len(use)):
            s, _ = step(s, bs, jnp.asarray(use[i][1]))
            if i + 1 < len(use):
                bs = jnp.asarray(use[i + 1][0])
        return s
    run_chain(feed_split, "B2 split: payload after dispatch i (production)")

    # C: host pack cost + both transfers + dispatch
    def feed_pack(s):
        for (sp, ip) in use:
            q = np.ascontiguousarray(sp)   # stand-in for the pack cost
            s, _ = step(s, jnp.asarray(q), jnp.asarray(ip))
        return s
    run_chain(feed_pack, "C  host-copy + transfers + dispatch")

    # D: dispatch RTT floor — a trivial jitted program chained N times
    @jax.jit
    def tiny(x):
        return x + 1.0

    def feed_tiny(x):
        for _ in range(n_meas):
            x = tiny(x)
        return x
    x0 = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(tiny(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(feed_tiny(x0))
        ts.append((time.perf_counter() - t0) / n_meas * 1e3)
    print(f"{'D  chained no-op dispatch floor':56s}: {min(ts):6.2f} ms/scan")

    # E: device-only step time (single dispatch, lax.scan over all scans;
    # nested jit traces inline)
    step_nodonate = pl.build_scan_step_split(cfg, donate=False)

    @jax.jit
    def scan_loop(s, stacks):
        def body(c, b):
            c2, _ = step_nodonate(c, b[0], b[1])
            return c2, 0
        out, _ = jax.lax.scan(body, s, stacks)
        return out
    stack = (jnp.stack([jnp.asarray(sp) for (sp, _ip) in use]),
             jnp.stack([jnp.asarray(ip) for (_sp, ip) in use]))
    s = jax.tree_util.tree_map(jnp.copy, state0)
    out = scan_loop(s, stack)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        s = jax.tree_util.tree_map(jnp.copy, state0)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        jax.block_until_ready(scan_loop(s, stack))
        ts.append((time.perf_counter() - t0) / n_meas * 1e3)
    print(f"{'E  one-dispatch lax.scan over all scans (device bound)':56s}: "
          f"{min(ts):6.2f} ms/scan")


if __name__ == "__main__":
    main()
