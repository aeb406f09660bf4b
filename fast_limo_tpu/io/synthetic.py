"""Deterministic synthetic LiDAR-inertial world for tests & benchmarks.

Generates an analytically-known trajectory through a piecewise-planar world
(ground + walls), emitting:

* IMU measurements at ``imu_rate`` — specific force ``Rᵀ(a − g)`` + gyro,
  with optional constant biases and noise,
* LiDAR scans at ``scan_rate`` — world points observed from the *exact*
  sensor pose at each point's firing time (so deskew has real work to do),
  in the Velodyne time convention (relative seconds, ``sensor_type=1``).

The trajectory is a smooth sinusoidal drive: forward x-velocity plus lateral
weave and yaw oscillation — shaped after the KITTI 0034 regime the reference
showcases (~20 m/s, ~35 °/s, README.md:66-71).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

G = 9.81


@dataclass
class Trajectory:
    """Smooth drive starting AT REST (zero velocity/yaw-rate at t=0) — the
    filter initializes stationary like the reference does."""

    v_forward: float = 8.0        # m/s terminal speed
    ramp_tau: float = 1.0         # s speed ramp constant
    weave_amp: float = 1.5        # m lateral (peak-to-peak/2)
    weave_freq: float = 0.18      # Hz
    yaw_amp: float = 0.35         # rad (peak)
    yaw_freq: float = 0.15        # Hz
    z_amp: float = 0.1
    z_freq: float = 0.4

    # lateral/vertical/yaw use (1 - cos) envelopes → zero rate at t=0
    def pos(self, t):
        t = np.asarray(t, float)
        tau = self.ramp_tau
        ww = 2 * np.pi * self.weave_freq
        wz = 2 * np.pi * self.z_freq
        return np.stack([
            self.v_forward * (t + tau * (np.exp(-t / tau) - 1.0)),
            self.weave_amp / 2 * (1 - np.cos(ww * t)),
            self.z_amp / 2 * (1 - np.cos(wz * t)),
        ], axis=-1)

    def vel(self, t):
        t = np.asarray(t, float)
        tau = self.ramp_tau
        ww = 2 * np.pi * self.weave_freq
        wz = 2 * np.pi * self.z_freq
        return np.stack([
            self.v_forward * (1.0 - np.exp(-t / tau)),
            self.weave_amp / 2 * ww * np.sin(ww * t),
            self.z_amp / 2 * wz * np.sin(wz * t),
        ], axis=-1)

    def acc(self, t):
        t = np.asarray(t, float)
        tau = self.ramp_tau
        ww = 2 * np.pi * self.weave_freq
        wz = 2 * np.pi * self.z_freq
        return np.stack([
            self.v_forward / tau * np.exp(-t / tau),
            self.weave_amp / 2 * ww * ww * np.cos(ww * t),
            self.z_amp / 2 * wz * wz * np.cos(wz * t),
        ], axis=-1)

    def yaw(self, t):
        wy = 2 * np.pi * self.yaw_freq
        return self.yaw_amp / 2 * (1 - np.cos(wy * np.asarray(t, float)))

    def yaw_rate(self, t):
        wy = 2 * np.pi * self.yaw_freq
        return self.yaw_amp / 2 * wy * np.sin(wy * np.asarray(t, float))

    def rot(self, t):
        """World←body rotation matrices (yaw only), (…,3,3)."""
        y = self.yaw(t)
        c, s = np.cos(y), np.sin(y)
        z = np.zeros_like(c)
        o = np.ones_like(c)
        return np.stack([
            np.stack([c, -s, z], axis=-1),
            np.stack([s, c, z], axis=-1),
            np.stack([z, z, o], axis=-1),
        ], axis=-2)

    def quat(self, t):
        y = self.yaw(t)
        return np.stack([np.cos(y / 2), np.zeros_like(y), np.zeros_like(y),
                         np.sin(y / 2)], axis=-1)


@dataclass
class LoopTrajectory(Trajectory):
    """Closed circular drive (for loop-closure tests): starts at rest, goes
    around a circle of ``radius`` at terminal speed ``v_forward``; heading is
    tangent to the circle."""

    radius: float = 10.0

    def _theta(self, t):
        t = np.asarray(t, float)
        tau = self.ramp_tau
        return self.v_forward / self.radius * (t + tau * (np.exp(-t / tau) - 1.0))

    def _theta_dot(self, t):
        t = np.asarray(t, float)
        return self.v_forward / self.radius * (1.0 - np.exp(-t / self.ramp_tau))

    def _theta_ddot(self, t):
        t = np.asarray(t, float)
        return self.v_forward / (self.radius * self.ramp_tau) * np.exp(-t / self.ramp_tau)

    def pos(self, t):
        th = self._theta(t)
        r = self.radius
        return np.stack([r * np.sin(th), r * (1 - np.cos(th)),
                         np.zeros_like(th)], axis=-1)

    def vel(self, t):
        th, thd = self._theta(t), self._theta_dot(t)
        r = self.radius
        return np.stack([r * np.cos(th) * thd, r * np.sin(th) * thd,
                         np.zeros_like(th)], axis=-1)

    def acc(self, t):
        th, thd, thdd = self._theta(t), self._theta_dot(t), self._theta_ddot(t)
        r = self.radius
        return np.stack([
            r * (-np.sin(th) * thd ** 2 + np.cos(th) * thdd),
            r * (np.cos(th) * thd ** 2 + np.sin(th) * thdd),
            np.zeros_like(th)], axis=-1)

    def yaw(self, t):
        return self._theta(t)

    def yaw_rate(self, t):
        return self._theta_dot(t)


def build_loop_world(seed: int, radius: float = 10.0, n_pts: int = 120_000):
    """Planar features around a circular corridor: ground + wall segments +
    pillar-planes. Deliberately IRREGULAR (random per-segment ranges,
    heights, tilts, and placement angles) so places around the loop are
    distinguishable — a perfectly symmetric ring is a perceptual-aliasing
    trap for any place-recognition system."""
    rng = np.random.default_rng(seed)
    cx, cy = 0.0, radius
    parts = []
    # ground annulus
    n_g = n_pts // 2
    ang = rng.uniform(0, 2 * np.pi, n_g)
    rr = rng.uniform(radius - 8, radius + 8, n_g)
    parts.append(np.stack([cx + rr * np.sin(ang), cy - rr * np.cos(ang),
                           np.zeros(n_g)], 1))
    # irregular wall segments + boxy "buildings" at random angles/ranges
    n_seg = 30
    per = n_pts // (2 * n_seg)
    for i in range(n_seg):
        a0 = rng.uniform(0, 2 * np.pi)
        side = radius + rng.uniform(-7.5, 7.5)
        if abs(side - radius) < 3.0:
            side = radius + np.sign(side - radius + 1e-3) * rng.uniform(4, 7.5)
        seg_len = rng.uniform(1.0, 4.0)
        height = rng.uniform(1.5, 6.0)
        tilt = rng.uniform(-0.4, 0.4)
        ts = rng.uniform(-seg_len, seg_len, per)
        zs = rng.uniform(0, height, per)
        px = cx + side * np.sin(a0) + ts * np.cos(a0 + tilt)
        py = cy - side * np.cos(a0) + ts * np.sin(a0 + tilt)
        parts.append(np.stack([px, py, zs], 1))
    return np.concatenate(parts).astype(np.float32)


def build_world(seed: int, extent: float = 400.0, n_wall_pts: int = 150_000,
                n_ground_pts: int = 150_000, corridor_half_width: float = 14.0):
    """Points on planar surfaces along the +x corridor the trajectory follows."""
    rng = np.random.default_rng(seed)
    # ground plane z ~ 0
    gx = rng.uniform(-20, extent, n_ground_pts)
    gy = rng.uniform(-corridor_half_width, corridor_half_width, n_ground_pts)
    ground = np.stack([gx, gy, np.zeros_like(gx)], axis=-1)

    # wall segments: vertical planes alternating sides, plus some tilted facades
    walls = []
    n_seg = 40
    per_seg = n_wall_pts // n_seg
    for i in range(n_seg):
        x0 = -20 + (extent + 20) * i / n_seg
        side = -1 if i % 2 else 1
        yw = side * corridor_half_width * rng.uniform(0.8, 1.0)
        # wall normal mostly ±y with a small random tilt
        tilt = rng.normal(0, 0.08, 2)
        xs = x0 + rng.uniform(0, (extent + 20) / n_seg * 1.4, per_seg)
        zs = rng.uniform(0.0, 6.0, per_seg)
        ys = yw + tilt[0] * (xs - x0) + tilt[1] * zs
        walls.append(np.stack([xs, ys, zs], axis=-1))
    world = np.concatenate([ground] + walls).astype(np.float32)
    return world


@dataclass
class SyntheticSequence:
    seed: int = 0
    n_scans: int = 40
    scan_rate: float = 10.0
    imu_rate: float = 100.0
    points_per_scan: int = 8192
    max_range: float = 60.0
    min_range: float = 2.0
    noise_pt: float = 0.01          # per-point range noise (m)
    noise_gyro: float = 1e-3
    noise_acc: float = 1e-2
    bias_gyro: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    bias_acc: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    traj: Trajectory = None
    world: np.ndarray = None
    # ---- dynamic objects (KITTI-0071 regime, reference README.md:50-55:
    # "dynamic objects (in this case, moving cars) are part of the map ...
    # the pointcloud matching still works") — vehicle-sized boxes crossing
    # the corridor; their returns REPLACE static returns in each scan and
    # move WITHIN the sweep (per-point firing-time positions), so they
    # stress deskew, matching gates and map pollution exactly like real
    # movers
    dynamic_objects: int = 0
    dynamic_speed: float = 8.0      # m/s crossing speed
    dynamic_size: Tuple[float, float, float] = (4.0, 1.8, 1.6)
    dynamic_fraction: float = 0.08  # max fraction of scan points on movers
    # ---- sensor realism (VERDICT r4 #7; all OFF by default so legacy
    # sequences stay bit-identical) ----
    ring_beams: int = 0             # >0: spinning-lidar geometry — returns
                                    # only on this many discrete elevation
                                    # beams (HDL-64-style rings) and firing
                                    # times AZIMUTH-COUPLED: t = az/2π ·
                                    # sweep period at the pose at firing
                                    # time (fixed-point refined), not
                                    # uniform random
    beam_fov: Tuple[float, float] = (-0.4346, 0.0349)   # rad (HDL-64:
                                    # −24.9°..+2.0°, README.md:66-71 drives)
    dropout: float = 0.0            # range-dependent return loss: each
                                    # return drops with p = dropout·(d/max_
                                    # range)² (weak far returns vanish
                                    # first, like real intensity cutoffs)
    bias_walk_gyro: float = 0.0     # rad/s/√s gyro bias random walk
    bias_walk_acc: float = 0.0      # m/s²/√s accel bias random walk
    sensor_height: float = 0.0      # m: mount height above the DEFAULT
                                    # world's ground (shifts that world
                                    # down — a ground-level sensor sees the
                                    # whole ground plane on one ring, real
                                    # vehicles mount the lidar ~1.7 m up)

    def __post_init__(self):
        self.traj = self.traj or Trajectory()
        if self.world is None:
            self.world = build_world(self.seed)
            if self.sensor_height:
                # mount the sensor above the default world's ground plane
                # (only applied to the default world: a custom world's
                # frame is the caller's business)
                self.world = self.world - np.array(
                    [0.0, 0.0, self.sensor_height], np.float32)

    # ---- dynamic-object kinematics (pure function of time) ----
    def _object_state(self, o: int, t):
        """Center position (…,3) of mover ``o`` at time ``t``: spaced along
        the corridor, crossing it laterally (alternating directions)."""
        t = np.asarray(t, float)
        t_end = (self.n_scans + 1) / self.scan_rate
        # place the crossing where the ego vehicle will be mid-sequence
        frac = (o + 1) / (self.dynamic_objects + 1)
        t_cross = frac * t_end
        x_c = self.traj.pos(np.asarray([t_cross]))[0][0]
        side = 1.0 if o % 2 == 0 else -1.0
        y = side * 16.0 - side * self.dynamic_speed * (t - t_cross + 2.0)
        z = np.full_like(t, self.dynamic_size[2] / 2)
        return np.stack([np.broadcast_to(x_c, t.shape), y, z], axis=-1)

    def _object_points(self, o: int, n: int, rng):
        """Surface points on the mover's box, object frame (long axis = y:
        the box travels along its crossing direction)."""
        sx, sy, sz = self.dynamic_size
        face = rng.integers(0, 5, n)        # 4 sides + roof
        u = rng.uniform(-0.5, 0.5, n)
        v = rng.uniform(0.0, 1.0, n)
        px = np.where(face == 0, -sx / 2, np.where(face == 1, sx / 2, u * sx))
        py = np.where(face == 2, -sy / 2, np.where(face == 3, sy / 2,
                      rng.uniform(-0.5, 0.5, n) * sy))
        pz = np.where(face == 4, sz, v * sz)
        # long axis along the crossing (y) already; swap x↔y extents
        return np.stack([px, py, pz], axis=-1)

    # Every draw is keyed by (seed, stream, index) so the data is a pure
    # function of the request: scan(i) returns bit-identical points no
    # matter how many times or in what order it (or imu_stream) is called.
    # (A shared stateful rng here made "fixed-seed" ATE comparisons across
    # harnesses silently use different noise realizations.)
    def _stream_rng(self, stream: int, i: int = 0):
        return np.random.default_rng(
            np.random.SeedSequence([self.seed + 1, stream, i]))

    # ---- IMU ----
    def imu_stream(self):
        """All IMU samples covering the sequence: (stamps, acc, gyro)."""
        rng = self._stream_rng(0)
        t_end = (self.n_scans + 1) / self.scan_rate
        stamps = np.arange(1, int(t_end * self.imu_rate) + 2) / self.imu_rate
        R = self.traj.rot(stamps)                       # (K,3,3)
        a_w = self.traj.acc(stamps)
        g_w = np.array([0, 0, -G])
        f_w = a_w - g_w
        acc = np.einsum("kij,kj->ki", R.transpose(0, 2, 1), f_w)
        gyro = np.stack([np.zeros_like(stamps), np.zeros_like(stamps),
                         self.traj.yaw_rate(stamps)], axis=-1)
        acc = acc + self.bias_acc + rng.normal(0, self.noise_acc, acc.shape)
        gyro = gyro + self.bias_gyro + rng.normal(0, self.noise_gyro, gyro.shape)
        if self.bias_walk_gyro > 0 or self.bias_walk_acc > 0:
            # Brownian bias drift (real MEMS IMUs; the constant-bias model
            # above is what the filter's bg/ba states nominally assume) —
            # drawn AFTER the legacy draws so walk-free sequences stay
            # bit-identical
            sdt = np.sqrt(1.0 / self.imu_rate)
            gyro = gyro + np.cumsum(
                rng.normal(0, self.bias_walk_gyro * sdt, gyro.shape), axis=0)
            acc = acc + np.cumsum(
                rng.normal(0, self.bias_walk_acc * sdt, acc.shape), axis=0)
        return stamps, acc.astype(np.float32), gyro.astype(np.float32)

    # ---- scans ----
    def scan(self, i: int):
        """Scan i: (stamp, points (M,3) lidar frame, t_raw (M,) velodyne-relative)."""
        rng = self._stream_rng(1, i)
        stamp = (i + 1) / self.scan_rate
        M = self.points_per_scan
        period = 1.0 / self.scan_rate
        # visible world points near the sensor at scan start
        p0 = self.traj.pos(stamp)
        d = np.linalg.norm(self.world - p0.astype(np.float32), axis=1)
        ok = (d > self.min_range) & (d < self.max_range)
        if self.ring_beams:
            # spinning-lidar geometry: returns exist only on the discrete
            # elevation beams (ring circles on the ground, banded walls)
            R0 = self.traj.rot(stamp)
            body0 = (self.world.astype(np.float64) - p0) @ R0  # = R0ᵀ·(w−p)
            el = np.arctan2(body0[:, 2], np.hypot(body0[:, 0], body0[:, 1]))
            lo, hi = self.beam_fov
            beams = np.linspace(lo, hi, self.ring_beams)
            spacing = (hi - lo) / max(self.ring_beams - 1, 1)
            bi = np.clip(np.round((el - lo) / spacing).astype(int),
                         0, self.ring_beams - 1)
            ok &= np.abs(el - beams[bi]) < 0.25 * spacing
        if self.dropout > 0:
            # range-dependent return loss (weak far echoes vanish first)
            p_drop = self.dropout * np.square(d / self.max_range)
            ok &= rng.uniform(size=len(d)) >= p_drop
        vis = np.nonzero(ok)[0]
        if self.ring_beams:
            # a ring sensor returns what the beams hit — no resampling up
            pick = (rng.choice(vis, M, replace=False) if len(vis) > M
                    else rng.permutation(vis))
            M = len(pick)
        elif len(vis) < M:
            pick = rng.choice(vis, M, replace=True)
        else:
            pick = rng.choice(vis, M, replace=False)
        pw = self.world[pick].astype(np.float64)

        if self.ring_beams:
            # AZIMUTH-COUPLED firing times: the sweep starts at azimuth 0
            # (+x, body frame) at the header stamp and rotates once per
            # period — a point fires when the beam column passes it.  One
            # fixed-point refinement accounts for the sensor's own motion
            # during the sweep (the azimuth at firing time, not scan start).
            def az_time(t_abs_est):
                R = self.traj.rot(t_abs_est)
                p = self.traj.pos(t_abs_est)
                pb = np.einsum("mij,mj->mi", R.transpose(0, 2, 1), pw - p)
                az = np.arctan2(pb[:, 1], pb[:, 0]) % (2 * np.pi)
                return az / (2 * np.pi) * period

            t_rel = az_time(np.full(M, stamp))
            t_rel = az_time(stamp + t_rel)
            t_abs = stamp + t_rel
        else:
            # legacy: firing times spread uniformly over the sweep
            t_rel = rng.uniform(0.0, period, M)
            t_abs = stamp + t_rel

        # dynamic objects: movers within range REPLACE static returns (a
        # lidar return on a car occludes whatever was behind it); each
        # return sees the object at ITS OWN firing time
        if self.dynamic_objects:
            drng = self._stream_rng(2, i)
            for o in range(self.dynamic_objects):
                c_now = self._object_state(o, np.asarray([stamp]))[0]
                dist = np.linalg.norm(c_now - p0)
                if dist < self.min_range + 2 or dist > self.max_range:
                    continue
                n_o = int(self.dynamic_fraction * M / max(
                    1, self.dynamic_objects) * min(1.0, (25.0 / dist) ** 2))
                if n_o < 8 or n_o > len(pw):
                    continue
                repl = drng.choice(len(pw), n_o, replace=False)
                body = self._object_points(o, n_o, drng)
                centers = self._object_state(o, t_abs[repl])
                pw[repl] = centers + body

        # exact sensor pose at firing time
        R = self.traj.rot(t_abs)                        # (M,3,3)
        p = self.traj.pos(t_abs)
        pl = np.einsum("mij,mj->mi", R.transpose(0, 2, 1), pw - p)
        pl += rng.normal(0, self.noise_pt, pl.shape)
        return stamp, pl.astype(np.float32), t_rel.astype(np.float32)

    def gt_pose(self, t):
        return self.traj.pos(t), self.traj.quat(t)


def ate_rmse(est_pos: np.ndarray, gt_pos: np.ndarray) -> float:
    """Absolute trajectory error after Umeyama (rigid, no scale) alignment."""
    mu_e, mu_g = est_pos.mean(0), gt_pos.mean(0)
    E, Gm = est_pos - mu_e, gt_pos - mu_g
    U, _, Vt = np.linalg.svd(E.T @ Gm)
    S = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = (U @ S @ Vt).T
    aligned = (est_pos - mu_e) @ R.T + mu_g
    return float(np.sqrt(np.mean(np.sum((aligned - gt_pos) ** 2, axis=1))))
