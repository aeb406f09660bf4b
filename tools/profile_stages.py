#!/usr/bin/env python
"""Per-stage device timing of the scan pipeline on the attached accelerator.

Each stage is looped R times inside ONE jit (lax.scan with a data
dependency carried between iterations) so per-dispatch tunnel latency is
amortized away: stage_ms = (t_loop - t_null) / R.

Run alone on the TPU (a second process contending for the chip stalls both).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fast_limo_tpu.models import iekf, mapper
from fast_limo_tpu.models import pipeline as pl
from fast_limo_tpu.models import process as proc
from fast_limo_tpu.ops import knn as pknn
from fast_limo_tpu.ops import plane as plane_op
from fast_limo_tpu.ops import voxel

import importlib.util

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(sys.path[0], "bench.py"))
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)

R = 30  # on-device repetitions per stage


def loop_time(make_body, init_carry, reps=5):
    """Median wall time of ONE jitted lax.scan of R stage applications."""

    @jax.jit
    def run(carry):
        def body(c, _):
            return make_body(c), None
        out, _ = jax.lax.scan(body, carry, None, length=R)
        return out

    out = run(init_carry)
    jax.block_until_ready(out)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init_carry)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    cfg = bench.kitti_like_cfg()
    rng = np.random.default_rng(0)
    dtype = jnp.float32

    m = mapper.create(cfg.tpu.map_capacity, cfg.tpu.map_points_per_voxel, dtype)
    world = jnp.asarray(
        rng.uniform([-100, -100, -2], [100, 100, 8], (60000, 3)), dtype)
    for i in range(0, 60000, 20000):
        m = mapper.insert(m, world[i:i + 20000], jnp.ones(20000, bool),
                          voxel_size=cfg.tpu.map_voxel_size,
                          probes=cfg.tpu.hash_probes)
    jax.block_until_ready(m)
    print(f"map: {int(m.num_points)} pts in {int(jnp.sum(m.counts > 0))} voxels")

    N = cfg.ikfom.mapping.MAX_NUM_PC2MATCH
    q0 = jnp.asarray(rng.uniform([-40, -40, -2], [40, 40, 6], (N, 3)), dtype)
    qvalid = jnp.ones(N, bool)
    vs = cfg.tpu.map_voxel_size
    k = cfg.ikfom.mapping.NUM_MATCH_POINTS
    probes = cfg.tpu.hash_probes

    # null loop: carry perturbation only → measures scan/dispatch overhead
    t_null = loop_time(lambda q: q + 1e-6, q0)
    print(f"null loop                   : {t_null * 1e3 / R:7.3f} ms/iter")

    def tm(name, body, carry):
        t = (loop_time(body, carry) - t_null) / R * 1e3
        print(f"{name:28s}: {t:7.2f} ms")
        return t

    # gather_neighborhood — perturb queries each iter to defeat CSE
    nbh = cfg.tpu.knn_neighborhood

    def g_body(q):
        cand, cv = mapper.gather_neighborhood(m, q, voxel_size=vs, probes=probes,
                                              neighborhood=nbh)
        return q + jnp.mean(cand) * 1e-12
    tm(f"gather_neighborhood (V={nbh})", g_body, q0)

    cand_pts, cand_valid = mapper.gather_neighborhood(
        m, q0, voxel_size=vs, probes=probes, neighborhood=nbh)
    jax.block_until_ready(cand_pts)

    def t_body(q):
        nbrs, sq, vld = mapper.topk_from_candidates(cand_pts, cand_valid, q, k=k)
        return q + jnp.mean(nbrs) * 1e-12
    tm("topk lax.top_k", t_body, q0)

    cand_flat = cand_pts.reshape(N, -1, 3)
    valid_flat = cand_valid.reshape(N, -1)

    def p_body(q):
        nbrs, sq, vld = pknn.masked_topk(cand_flat, valid_flat, q, k=k)
        return q + jnp.mean(nbrs) * 1e-12
    tm("topk pallas", p_body, q0)

    nbrs0, sq0, vld0 = mapper.topk_from_candidates(cand_pts, cand_valid, q0, k=k)
    jax.block_until_ready(nbrs0)

    def f_body(carry):
        nbrs = nbrs0 + carry[0, 0] * 1e-12
        n_abcd, good = plane_op.fit_planes(
            nbrs, sq0, vld0, num_match_points=k,
            max_dist_plane=cfg.ikfom.mapping.MAX_DIST_PLANE,
            plane_threshold=cfg.ikfom.mapping.PLANE_THRESHOLD)
        return carry + jnp.mean(n_abcd) * 1e-12
    tm("fit_planes", f_body, q0)

    def i_body(carry):
        m2 = mapper.insert(m, q0 + carry[0, 0] * 1e-12, qvalid, voxel_size=vs,
                           probes=cfg.tpu.insert_probes)
        return carry + m2.points[0, 0] * 1e-12
    tm("insert", i_body, q0)

    def v_body(carry):
        pts, val = voxel.voxel_downsample(
            carry, jnp.ones(carry.shape[0], bool), float(cfg.filters.leafSize[0]))
        return carry + jnp.mean(pts) * 1e-12
    big = jnp.asarray(rng.uniform(-40, 40, (cfg.tpu.max_points_per_scan, 3)), dtype)
    tm("voxel_downsample(32k)", v_body, big)

    # predict_scan over the imu batch
    K = cfg.tpu.imu_batch
    Q = proc.process_noise_Q(cfg.ikfom.cov_gyro, cfg.ikfom.cov_acc,
                             cfg.ikfom.cov_bias_gyro, cfg.ikfom.cov_bias_acc,
                             dtype)
    s = pl.init_state(cfg)
    imu = {"acc": jnp.asarray(rng.normal(0, 0.05, (K, 3)) + [0, 0, 9.81], dtype),
           "gyro": jnp.asarray(rng.normal(0, 0.01, (K, 3)), dtype),
           "dt": jnp.full(K, 0.01, dtype),
           "stamp": jnp.asarray(np.linspace(0.001, 0.1, K), jnp.float32),
           "valid": jnp.ones(K, bool)}

    def pr_body(carry):
        x2, P2, xs = iekf.predict_scan(s.x, s.P + carry * 1e-12, imu, Q)
        return carry + P2 * 1e-12
    tm("predict_scan(32 imu)", pr_body, jnp.zeros((23, 23), dtype))

    # preprocess (filters + time sort over the full padded scan)
    from fast_limo_tpu.models import deskew as dsk
    from fast_limo_tpu.models import preprocess
    from fast_limo_tpu.models import scancontext as sc

    Np = cfg.tpu.max_points_per_scan
    traw = jnp.asarray(np.linspace(0, 0.1, Np), dtype)

    def pp_body(carry):
        pts, t_abs, pv, se = preprocess.preprocess_scan(
            carry, traw, jnp.ones(Np, bool), jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.1, jnp.float32),
            sensor_type=cfg.sensor_type, end_of_sweep=cfg.end_of_sweep,
            crop_active=cfg.filters.crop_active,
            crop_min=cfg.filters.cropBoxMin, crop_max=cfg.filters.cropBoxMax,
            dist_active=cfg.filters.dist_active, min_dist=cfg.filters.min_dist,
            rate_active=cfg.filters.rate_active,
            rate_value=cfg.filters.rate_value,
            fov_active=cfg.filters.fov_active, fov_angle=cfg.filters.fov_angle,
            time_offset=cfg.time_offset)
        return carry + jnp.mean(pts) * 1e-12
    tm("preprocess_scan(32k)", pp_body, big)

    # deskew over the full padded scan
    x2, P2, xs = iekf.predict_scan(s.x, s.P, imu, Q)
    frames = dsk.frames_from_scan(
        s.x, jnp.asarray(0.0, jnp.float32), jnp.zeros(3, dtype),
        jnp.zeros(3, dtype), xs, imu)
    tpts = jnp.asarray(np.linspace(0, 0.1, Np), jnp.float32)

    def dk_body(carry):
        p_xt2, p_w = dsk.deskew(carry, tpts, jnp.ones(Np, bool), frames,
                                x2, x2.rot_LI, x2.t_LI)
        return carry + jnp.mean(p_xt2) * 1e-12
    tm("deskew(32k)", dk_body, big)

    # one update-iteration worth of H work (point_to_plane + rows + HtH)
    from fast_limo_tpu.models import measurement
    _h_rows, h_stats = measurement.make_h_model(
        m, q0, qvalid, voxel_size=vs, k=k, probes=probes,
        max_dist_plane=cfg.ikfom.mapping.MAX_DIST_PLANE,
        plane_threshold=cfg.ikfom.mapping.PLANE_THRESHOLD,
        max_num_matches=cfg.ikfom.mapping.MAX_NUM_MATCHES,
        estimate_extrinsics=True, knn_refresh="first", x0=s.x,
        neighborhood=cfg.tpu.knn_neighborhood)

    def it_body(carry):
        HTH, HTh = h_stats(s.x._replace(pos=s.x.pos + carry[:3, 0] * 1e-12))
        return carry + HTH[:3, :3].sum() * 1e-12
    tm("h_stats (1 update iter)", it_body, jnp.zeros((23, 23), dtype))

    # full iterated update (re-built measurement closure per perturbation)
    def up_body(carry):
        _hr, hst = measurement.make_h_model(
            m, q0 + carry[0, :3] * 1e-12, qvalid, voxel_size=vs, k=k,
            probes=probes,
            max_dist_plane=cfg.ikfom.mapping.MAX_DIST_PLANE,
            plane_threshold=cfg.ikfom.mapping.PLANE_THRESHOLD,
            max_num_matches=cfg.ikfom.mapping.MAX_NUM_MATCHES,
            estimate_extrinsics=True, knn_refresh=cfg.tpu.knn_refresh,
            x0=s.x, neighborhood=nbh)
        x_u, P_u, n_it = iekf.update_iterated(
            s.x, s.P, hst, R=cfg.ikfom.lidar_noise,
            D=cfg.ikfom.degeneracy_thresh,
            max_iters=cfg.ikfom.MAX_NUM_ITERS, limit=cfg.ikfom.LIMITS)
        return carry + P_u * 1e-12
    tm("update_iterated (full)", up_body, jnp.zeros((23, 23), dtype))

    def sc_body(carry):
        d = sc.descriptor(carry[:10000], jnp.ones(10000, bool))
        return carry + jnp.mean(d) * 1e-12
    tm("scancontext descriptor", sc_body, big)


if __name__ == "__main__":
    main()
