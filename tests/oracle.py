"""Literal NumPy float64 re-implementation of the reference's filter math.

Transcribed independently, statement by statement, from the C++ semantics of
IKFoM (esekfom.hpp predict/update, S2.hpp chart ops, mtkmath.hpp helpers,
use-ikfom.cpp models) — including the integer-division quirks
(``scalar_type(1/2) == 0``).  Used as the golden oracle the JAX
implementation is tested against (two independent transcriptions must agree).

State vector layout here: dict with keys pos(3), rot(quat wxyz), rot_LI,
t_LI, vel, bg, ba, grav(3).
"""

import numpy as np

S2_LEN = 98090.0 / 10000.0


# ---------- quaternion helpers (MTK SO3 is an Eigen quaternion) ----------

def qmul(q, p):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = p
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def qconj(q):
    return q * np.array([1.0, -1, -1, -1])


def qmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def mtk_exp(vec, scale):
    """MTK::exp (mtkmath.hpp:249-256): returns quaternion (w, xyz)."""
    norm2 = float(vec @ vec)
    x2 = scale * scale * norm2
    # cos_sinc_sqrt
    if x2 >= np.sqrt(np.sqrt(np.finfo(np.float64).eps)):
        x = np.sqrt(x2)
        c, s = np.cos(x), np.sin(x) / x
    else:
        inv = [1 / 3., 1 / 4., 1 / 5., 1 / 6., 1 / 7., 1 / 8.]
        c, s = 1.0, 1.0
        term = -0.5 * x2
        for i in range(3):
            c += term
            term *= inv[2 * i]
            s += term
            term *= -inv[2 * i + 1] * x2
    return np.concatenate([[c], s * scale * np.asarray(vec, float)])


def A_matrix(v):
    n2 = float(v @ v)
    n = np.sqrt(n2)
    if n < 1e-11:
        return np.eye(3)
    K = hat(v)
    return np.eye(3) + (1 - np.cos(n)) / n2 * K + (1 - np.sin(n) / n) / n2 * K @ K


def so3_log(q):
    w = q[0]
    vec = q[1:]
    n = np.linalg.norm(vec)
    if n <= 1e-11:
        return 2.0 * vec / (w if abs(w) > 1e-30 else 1.0)
    angle = 2.0 * np.arctan2(n, abs(w))
    sgn = -1.0 if w < 0 else 1.0
    return sgn * angle / n * vec


# ---------- S2 chart (S2.hpp, typ=1, length=9.809) ----------

def s2_Bx(vec):
    L = S2_LEN
    if vec[0] + L > 1e-11:
        res = np.array([
            [-vec[1], -vec[2]],
            [L - vec[1] * vec[1] / (L + vec[0]), -vec[2] * vec[1] / (L + vec[0])],
            [-vec[2] * vec[1] / (L + vec[0]), L - vec[2] * vec[2] / (L + vec[0])],
        ]) / L
    else:
        res = np.zeros((3, 2))
        res[1, 1] = -1
        res[2, 0] = 1
    return res


def s2_boxplus(vec, delta):
    Bx = s2_Bx(vec)
    Bu = Bx @ delta
    q = mtk_exp(Bu, 0.5)          # scale = scalar(scale/2), scale=1 → 0.5
    return qmat(q) @ vec


def s2_boxminus(vec, other):
    v_sin = np.linalg.norm(hat(vec) @ other)
    v_cos = float(vec @ other)
    theta = np.arctan2(v_sin, v_cos)
    if v_sin < 1e-11:
        if abs(theta) > 1e-11:
            return np.array([3.1415926, 0.0])
        return np.zeros(2)
    Bx = s2_Bx(other)
    return theta / v_sin * Bx.T @ hat(other) @ vec


def s2_Nx_yy(vec):
    Bx = s2_Bx(vec)
    return 1.0 / S2_LEN ** 2 * Bx.T @ hat(vec)


def s2_Mx(vec, delta):
    Bx = s2_Bx(vec)
    if np.linalg.norm(delta) < 1e-11:
        return -hat(vec) @ Bx
    Bu = Bx @ delta
    # quirk: exp_delta uses scalar(1/2) == 0 → identity rotation (S2.hpp:277)
    return -np.eye(3) @ hat(vec) @ A_matrix(Bu).T @ Bx


def s2_hat(vec):
    return hat(vec)


# ---------- state ops (MTK_BUILD_MANIFOLD boxplus/boxminus/oplus) ----------

def state_copy(s):
    return {k: np.array(v, float) for k, v in s.items()}


def state_boxplus(s, dx):
    out = state_copy(s)
    out["pos"] = s["pos"] + dx[0:3]
    out["rot"] = qmul(s["rot"], mtk_exp(dx[3:6], 0.5))
    out["rot_LI"] = qmul(s["rot_LI"], mtk_exp(dx[6:9], 0.5))
    out["t_LI"] = s["t_LI"] + dx[9:12]
    out["vel"] = s["vel"] + dx[12:15]
    out["bg"] = s["bg"] + dx[15:18]
    out["ba"] = s["ba"] + dx[18:21]
    out["grav"] = s2_boxplus(s["grav"], dx[21:23])
    return out


def state_boxminus(s, s0):
    return np.concatenate([
        s["pos"] - s0["pos"],
        so3_log(qmul(qconj(s0["rot"]), s["rot"])),
        so3_log(qmul(qconj(s0["rot_LI"]), s["rot_LI"])),
        s["t_LI"] - s0["t_LI"],
        s["vel"] - s0["vel"],
        s["bg"] - s0["bg"],
        s["ba"] - s0["ba"],
        s2_boxminus(s["grav"], s0["grav"]),
    ])


def state_oplus(s, f, dt):
    out = state_copy(s)
    out["pos"] = s["pos"] + f[0:3] * dt
    out["rot"] = qmul(s["rot"], mtk_exp(f[3:6] * dt, 0.5))
    out["rot_LI"] = qmul(s["rot_LI"], mtk_exp(f[6:9] * dt, 0.5))
    out["t_LI"] = s["t_LI"] + f[9:12] * dt
    out["vel"] = s["vel"] + f[12:15] * dt
    out["bg"] = s["bg"] + f[15:18] * dt
    out["ba"] = s["ba"] + f[18:21] * dt
    q = mtk_exp(f[21:24] * dt, 0.5)
    out["grav"] = qmat(q) @ s["grav"]
    return out


# ---------- process model (use-ikfom.cpp:43-84) ----------

def get_f(s, acc, gyro):
    res = np.zeros(24)
    omega = gyro - s["bg"]
    a_inertial = qmat(s["rot"]) @ (acc - s["ba"])
    res[0:3] = s["vel"]
    res[3:6] = omega
    res[12:15] = a_inertial + s["grav"]
    return res


def df_dx(s, acc, gyro):
    cov = np.zeros((24, 23))
    cov[0:3, 12:15] = np.eye(3)
    cov[12:15, 3:6] = -qmat(s["rot"]) @ hat(acc - s["ba"])
    cov[12:15, 18:21] = -qmat(s["rot"])
    cov[12:15, 21:23] = s2_Mx(s["grav"], np.zeros(2))
    cov[3:6, 15:18] = -np.eye(3)
    return cov


def df_dw(s, acc, gyro):
    cov = np.zeros((24, 12))
    cov[12:15, 3:6] = -qmat(s["rot"])
    cov[3:6, 0:3] = -np.eye(3)
    cov[15:18, 6:9] = np.eye(3)
    cov[18:21, 9:12] = np.eye(3)
    return cov


# ---------- esekf predict (esekfom.hpp:279-384) ----------

SO3_BLOCKS = [3, 6]   # (idx==dim)
S2_IDX = 21


def predict(s, P, acc, gyro, dt, Q):
    f_ = get_f(s, acc, gyro)
    f_x_ = df_dx(s, acc, gyro)
    f_w_ = df_dw(s, acc, gyro)
    x_before = state_copy(s)
    x = state_oplus(s, f_, dt)

    F_x1 = np.eye(23)
    f_x_final = np.zeros((23, 23))
    f_w_final = np.zeros((23, 12))
    # vect blocks: pos, t_LI, vel, bg, ba (idx==dim)
    for idx, dof in [(0, 3), (9, 3), (12, 3), (15, 3), (18, 3)]:
        f_x_final[idx:idx + dof] = f_x_[idx:idx + dof]
        f_w_final[idx:idx + dof] = f_w_[idx:idx + dof]
    for idx in SO3_BLOCKS:
        seg = -f_[idx:idx + 3] * dt
        # quirk: res = exp(seg, scalar_type(1/2)=0) == identity → F_x1 block = I
        F_x1[idx:idx + 3, idx:idx + 3] = np.eye(3)
        res_tmp = A_matrix(seg)
        f_x_final[idx:idx + 3] = res_tmp @ f_x_[idx:idx + 3]
        f_w_final[idx:idx + 3] = res_tmp @ f_w_[idx:idx + 3]
    # S2 block
    idx = dim = S2_IDX
    seg = f_[dim:dim + 3] * dt
    # quirk: res rotation == identity
    Nx = s2_Nx_yy(x["grav"])
    Mx = s2_Mx(x_before["grav"], np.zeros(2))
    F_x1[idx:idx + 2, idx:idx + 2] = Nx @ np.eye(3) @ Mx
    res_tmp2 = -Nx @ np.eye(3) @ hat(x_before["grav"]) @ A_matrix(seg).T
    f_x_final[idx:idx + 2] = res_tmp2 @ f_x_[dim:dim + 3]
    f_w_final[idx:idx + 2] = res_tmp2 @ f_w_[dim:dim + 3]

    F = F_x1 + f_x_final * dt
    P_new = F @ P @ F.T + (dt * f_w_final) @ Q @ (dt * f_w_final).T
    return x, P_new


# ---------- iterated update (esekfom.hpp:1620-1823) ----------

def update_iterated(s, P, h_model, R, D, max_iters, limit):
    """h_model(state) -> (H (M,12), h (M,)) possibly with zero rows."""
    x = state_copy(s)
    x_prop = state_copy(s)
    P_prop = P.copy()
    t = 0
    n = 23
    i = -1
    while i < max_iters:
        H, h = h_model(x)
        dx = state_boxminus(x, x_prop)
        dx_new = dx.copy()
        P_ = P_prop.copy()

        for idx in SO3_BLOCKS:
            res = A_matrix(dx[idx:idx + 3]).T
            dx_new[idx:idx + 3] = res @ dx_new[idx:idx + 3]
            P_[idx:idx + 3, :] = res @ P_[idx:idx + 3, :]
            P_[:, idx:idx + 3] = P_[:, idx:idx + 3] @ res.T
        idx = S2_IDX
        Nx = s2_Nx_yy(x["grav"])
        Mx = s2_Mx(x_prop["grav"], dx[idx:idx + 2])
        res2 = Nx @ Mx
        dx_new[idx:idx + 2] = res2 @ dx_new[idx:idx + 2]
        P_[idx:idx + 2, :] = res2 @ P_[idx:idx + 2, :]
        P_[:, idx:idx + 2] = P_[:, idx:idx + 2] @ res2.T

        HTH = H.T @ H
        P_temp = np.linalg.inv(P_ / R)
        P_temp[0:12, 0:12] += HTH
        P_inv = np.linalg.inv(P_temp)
        K_h = P_inv[:, 0:12] @ H.T @ h
        K_x = np.zeros((n, n))
        K_x[:, 0:12] = P_inv[:, 0:12] @ HTH

        dx_ = K_h + (K_x - np.eye(n)) @ dx_new

        # degeneracy guard: spectral projector V·diag(m)·Vᵀ (the engine's
        # documented divergence from the reference's sign-dependent
        # row-zeroing quirk — see models/iekf._degeneracy_guard)
        w_eig, V = np.linalg.eigh(HTH[0:6, 0:6])
        m_keep = (w_eig >= D).astype(float)
        dx_nd = dx_.copy()
        if np.prod(w_eig) < 1e-20:
            dx_nd[0:6] = m_keep * dx_[0:6]
        else:
            dx_nd[0:6] = (V * m_keep[None, :]) @ (V.T @ dx_[0:6])

        x = state_boxplus(x, dx_nd)
        converge = bool(np.all(np.abs(dx_) <= limit))
        if converge:
            t += 1

        if t > 1 or i == max_iters - 1:
            L_ = P_.copy()
            for idx in SO3_BLOCKS:
                res = A_matrix(dx_[idx:idx + 3]).T
                L_[idx:idx + 3, :] = res @ P_[idx:idx + 3, :]
                K_x[idx:idx + 3, 0:12] = res @ K_x[idx:idx + 3, 0:12]
                L_[:, idx:idx + 3] = L_[:, idx:idx + 3] @ res.T
                P_[:, idx:idx + 3] = P_[:, idx:idx + 3] @ res.T
            idx = S2_IDX
            Nx = s2_Nx_yy(x["grav"])
            Mx = s2_Mx(x_prop["grav"], dx_[idx:idx + 2])
            res2 = Nx @ Mx
            L_[idx:idx + 2, :] = res2 @ P_[idx:idx + 2, :]
            K_x[idx:idx + 2, 0:12] = res2 @ K_x[idx:idx + 2, 0:12]
            L_[:, idx:idx + 2] = L_[:, idx:idx + 2] @ res2.T
            P_[:, idx:idx + 2] = P_[:, idx:idx + 2] @ res2.T
            P_ = L_ - K_x[:, 0:12] @ P_[0:12, :]
            return x, P_, i + 1
        i += 1
    return x, P_prop, i
