#!/usr/bin/env python
"""Sub-bisect of predict_scan + the IMU path (stage A of the fullstep
bisect, 1.25 ms in context):

  A  imu_to_baselink + intrinsics
  B  A + mean chain (quat associative scan + vel/pos cumsums)
  C  B + batched per-step Jacobians (vmap _predict_mats)
  D  C + affine tree-fold + final P sandwich  (= full predict_scan)
  E  D + frames_from_scan (the deskew frame build, stage C's other half)

Run: tools/tpu_run.sh 900 python tools/probe_predict_bisect.py
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
from fast_limo_tpu.models import deskew as dsk
from fast_limo_tpu.models import iekf, preprocess
from fast_limo_tpu.models import pipeline as pl
from fast_limo_tpu.models import process as proc
from fast_limo_tpu.models import state as st

R = 30


def loop_time(make_body, reps=5):
    @jax.jit
    def run(c0):
        def body(c, _):
            return make_body(c), None
        out, _ = jax.lax.scan(body, c0, None, length=R)
        return out

    out = run(jnp.zeros(()))
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(jnp.zeros(()))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / R


def main():
    cfg = bench.kitti_like_cfg()
    dtype = jnp.float32
    K = cfg.tpu.imu_batch
    rng = np.random.default_rng(0)
    s = pl.init_state(cfg)
    Q = proc.process_noise_Q(cfg.ikfom.cov_gyro, cfg.ikfom.cov_acc,
                             cfg.ikfom.cov_bias_gyro, cfg.ikfom.cov_bias_acc,
                             dtype)
    imu_acc = jnp.asarray(rng.normal(0, 0.05, (K, 3)) + [0, 0, 9.81], dtype)
    imu_gyro = jnp.asarray(rng.normal(0, 0.01, (K, 3)), dtype)
    imu_stamp = jnp.asarray(np.linspace(0.001, 0.105, K), jnp.float32)
    imu_valid = jnp.ones(K, bool)
    R_imu2bl = jnp.eye(3, dtype=dtype)
    t_imu2bl = jnp.zeros(3, dtype)
    sm = jnp.eye(3, dtype=dtype)

    def upto(stage, c):
        acc_in = imu_acc + c * 1e-9
        acc_bl, gyro_bl, dt = preprocess.imu_to_baselink(
            acc_in, imu_gyro, imu_stamp, s.last_prop_time, s.last_w_raw_bl,
            R_imu2bl=R_imu2bl, t_imu2bl=t_imu2bl)
        acc_c, gyro_c = preprocess.apply_intrinsics(
            acc_bl, gyro_bl, sm, s.bias_accel_corr, s.bias_gyro_corr)
        imu = {"acc": acc_c, "gyro": gyro_c, "dt": dt.astype(dtype),
               "stamp": imu_stamp, "valid": imu_valid}
        if stage == "A":
            return c + jnp.mean(acc_c) * 1e-12

        x = s.x
        valid = imu["valid"]
        dt_m = jnp.where(valid, imu["dt"], 0).astype(dtype)
        from fast_limo_tpu.ops import so3
        omega = (imu["gyro"] - x.bg[None]) * dt_m[:, None]
        chain = jnp.concatenate([x.rot[None], so3.exp_quat(omega)], axis=0)
        q_incl = jax.lax.associative_scan(so3.quat_mul, chain, axis=0)
        q_after = q_incl[1:]
        a_world = so3.quat_rotate(
            q_incl[:-1], imu["acc"] - x.ba[None]) + x.grav[None]
        v_after = x.vel[None] + jnp.cumsum(a_world * dt_m[:, None], axis=0)
        v_before = jnp.concatenate([x.vel[None], v_after[:-1]], axis=0)
        p_after = x.pos[None] + jnp.cumsum(v_before * dt_m[:, None], axis=0)
        const = lambda a: jnp.broadcast_to(a[None], (K,) + a.shape)
        xs = st.NavState(
            pos=p_after, rot=q_after, rot_LI=const(x.rot_LI),
            t_LI=const(x.t_LI), vel=v_after, bg=const(x.bg), ba=const(x.ba),
            grav=const(x.grav))
        if stage == "B":
            return c + jnp.mean(p_after) * 1e-12

        x_prev = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b[:-1]], axis=0), x, xs)
        _, F_k, GQG_k = jax.vmap(
            lambda xp, a, g, dt: iekf._predict_mats(xp, a, g, dt, Q))(
            x_prev, imu["acc"], imu["gyro"], imu["dt"])
        if stage == "C":
            return c + jnp.mean(F_k) * 1e-12

        N = st.ERR_DIM
        eye = jnp.eye(N, dtype=dtype)
        F_k = jnp.where(valid[:, None, None], F_k, eye)
        GQG_k = jnp.where(valid[:, None, None], GQG_k,
                          jnp.zeros_like(GQG_k))
        A, B = F_k, GQG_k
        while A.shape[0] > 1:
            if A.shape[0] % 2:
                A = jnp.concatenate([A, eye[None]], axis=0)
                B = jnp.concatenate([B, jnp.zeros((1, N, N), dtype)], axis=0)
            A1, B1 = A[0::2], B[0::2]
            A2, B2 = A[1::2], B[1::2]
            A = jnp.einsum("kij,kjl->kil", A2, A1)
            B = jnp.einsum("kij,kjl,kml->kim", A2, B1, A2) + B2
        P_f = A[0] @ s.P @ A[0].T + B[0]
        if stage == "D":
            return c + P_f[0, 0] * 1e-12

        frames = dsk.frames_from_scan(
            s.x, s.last_prop_time, s.last_w, s.last_a, xs, imu)
        leaf = jax.tree_util.tree_leaves(frames)[0]
        return c + P_f[0, 0] * 1e-12 + jnp.sum(leaf) * 1e-12

    # in-process null (see probe_fullstep_bisect: the tunnel is bimodal
    # per process; null > 0.1 ms/iter = degraded regime, rerun)
    dummy = jnp.asarray(np.arange(32), jnp.float32)
    t_null = loop_time(lambda c: c + jnp.sum(dummy) * (c + 1.0) * 1e-12) * 1e3
    print(f"null: {t_null:7.3f} ms/iter ({'FAST' if t_null < 0.1 else 'DEGRADED - rerun'})")

    prev = 0.0
    for stage in ("A", "B", "C", "D", "E"):
        t = loop_time(lambda c, sg=stage: upto(sg, c)) * 1e3 - t_null
        print(f"{stage}: {t:7.3f} ms  (+{t - prev:6.3f})")
        prev = t


if __name__ == "__main__":
    main()
