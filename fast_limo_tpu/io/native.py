"""ctypes bindings for the native host runtime (csrc/fastlimo_host.cpp).

Builds the shared library on first use (g++ -O3) and caches it under
``build/``.  Every entry point has a NumPy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "fastlimo_host.cpp")
_SO = os.path.join(_REPO, "build", "libfastlimo_host.so")

_lib = None
_lock = threading.Lock()


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib or None
        stale = (os.path.exists(_SO) and os.path.exists(_SRC)
                 and os.path.getmtime(_SRC) > os.path.getmtime(_SO))
        path = _SO if (os.path.exists(_SO) and not stale) else _build()
        if path is None or not os.path.exists(path):
            _lib = False
            return None
        lib = ctypes.CDLL(path)
        lib.flh_parse_kitti_bin.restype = ctypes.c_int64
        lib.flh_preprocess.restype = ctypes.c_int64
        lib.flh_ring_create.restype = ctypes.c_void_p
        lib.flh_ring_push.restype = ctypes.c_int
        lib.flh_ring_pop.restype = ctypes.c_int
        lib.flh_ring_size.restype = ctypes.c_uint64
        lib.flh_pack_scan_i16.restype = ctypes.c_int64
        _lib = lib
        return lib


def _cptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def parse_kitti_bin(path: str, max_points: int = 200_000,
                    sweep_period: float = 0.1):
    """(xyz (n,3) f32, intensity (n,) f32, t_rel (n,) f32) from a KITTI .bin."""
    lib = get_lib()
    if lib is not None:
        xyz = np.empty((max_points, 3), np.float32)
        inten = np.empty(max_points, np.float32)
        t = np.empty(max_points, np.float32)
        n = lib.flh_parse_kitti_bin(path.encode(), _cptr(xyz), _cptr(inten),
                                    _cptr(t), ctypes.c_int64(max_points),
                                    ctypes.c_double(sweep_period))
        if n < 0:
            raise FileNotFoundError(path)
        return xyz[:n], inten[:n], t[:n]
    # NumPy fallback
    raw = np.fromfile(path, np.float32).reshape(-1, 4)[:max_points]
    xyz, inten = raw[:, :3].copy(), raw[:, 3].copy()
    az = np.arctan2(xyz[:, 1], xyz[:, 0])
    frm = (az + np.pi) % (2 * np.pi)
    return xyz, inten, (frm / (2 * np.pi) * sweep_period).astype(np.float32)


def preprocess(xyz, t_rel, n_out: int, *, crop_active=False,
               crop_min=(-1, -1, -1), crop_max=(1, 1, 1),
               dist_active=False, min_dist=0.0,
               rate_active=False, rate_value=1,
               fov_active=False, fov_angle=np.pi):
    """Native filter chain + time sort; returns (xyz (n_out,3), t (n_out,),
    valid (n_out,), n_kept)."""
    lib = get_lib()
    xyz = np.ascontiguousarray(xyz, np.float32)
    t_rel = np.ascontiguousarray(t_rel, np.float32)
    if lib is not None:
        out_xyz = np.empty((n_out, 3), np.float32)
        out_t = np.empty(n_out, np.float32)
        out_v = np.empty(n_out, np.uint8)
        cmin = np.asarray(crop_min, np.float32)
        cmax = np.asarray(crop_max, np.float32)
        n = lib.flh_preprocess(
            _cptr(xyz), _cptr(t_rel), ctypes.c_int64(len(xyz)),
            int(crop_active), _cptr(cmin), _cptr(cmax),
            int(dist_active), ctypes.c_float(min_dist),
            int(rate_active), int(rate_value),
            int(fov_active), ctypes.c_float(fov_angle),
            _cptr(out_xyz), _cptr(out_t), _cptr(out_v), ctypes.c_int64(n_out))
        return out_xyz, out_t, out_v.astype(bool), int(n)
    # NumPy fallback
    m = np.all(np.isfinite(xyz), axis=1)
    if crop_active:
        inside = np.all((xyz >= crop_min) & (xyz <= crop_max), axis=1)
        m &= ~inside
    if dist_active:
        m &= np.linalg.norm(xyz, axis=1) > min_dist
    if rate_active:
        m &= np.arange(len(xyz)) % rate_value == 0
    if fov_active:
        m &= np.abs(np.arctan2(xyz[:, 1], xyz[:, 0])) < fov_angle
    idx = np.nonzero(m)[0]
    idx = idx[np.argsort(t_rel[idx], kind="stable")][:n_out]
    n = len(idx)
    out_xyz = np.zeros((n_out, 3), np.float32)
    out_t = np.zeros(n_out, np.float32)
    out_v = np.zeros(n_out, bool)
    out_xyz[:n] = xyz[idx]
    out_t[:n] = t_rel[idx]
    out_v[:n] = True
    return out_xyz, out_t, out_v, n


def pack_scan_i16_numpy(pts, t_raw, n_cap: int, quant: float):
    """NumPy twin of ``flh_pack_scan_i16`` — BIT-identical to the C path:
    quantization products run in DOUBLE on both sides (IEEE f64 multiply +
    rint/nearbyint under round-half-even is compiler-independent; f32
    products can land on .5 ties that resolve differently), so replay
    trajectories match between hosts with and without a g++ toolchain."""
    n = min(len(pts), n_cap)
    pts, t_raw = pts[:n], t_raw[:n]
    out = np.zeros((n_cap, 4), np.int16)
    tmax = float(np.max(np.abs(t_raw))) if n else 0.0
    ts32 = np.float32(max(tmax, 1e-12) / 32767.0)
    inv_q = 1.0 / float(quant)
    inv_ts = 1.0 / float(ts32)
    np.clip(np.rint(pts.astype(np.float64) * inv_q), -32767, 32767,
            out=out[:n, :3], casting="unsafe")
    np.clip(np.rint(t_raw.astype(np.float64) * inv_ts), -32767, 32767,
            out=out[:n, 3], casting="unsafe")
    return out, float(ts32), n


def pack_scan_i16(pts, t_raw, n_cap: int, quant: float):
    """One-pass int16 scan packing (Localizer._pack_scan hot path).

    pts (n,3) f32 contiguous, t_raw (n,) f32 contiguous →
    (out (n_cap,4) int16 zero-padded, t_scale, n_packed); None when the
    native library is unavailable (caller falls back to NumPy)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((n_cap, 4), np.int16)
    ts = ctypes.c_float(0.0)
    n = lib.flh_pack_scan_i16(
        _cptr(pts), _cptr(t_raw), ctypes.c_int64(len(pts)),
        ctypes.c_float(quant), _cptr(out), ctypes.c_int64(n_cap),
        ctypes.byref(ts))
    return out, float(ts.value), int(n)


class SPSCRing:
    """Lock-free single-producer single-consumer ring of fixed-size records."""

    def __init__(self, n_items: int, item_size: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._item_size = item_size
        self._ptr = ctypes.c_void_p(lib.flh_ring_create(
            ctypes.c_uint64(n_items), ctypes.c_uint64(item_size)))

    def push(self, data: bytes) -> bool:
        assert len(data) == self._item_size
        return bool(self._lib.flh_ring_push(self._ptr, data))

    def pop(self) -> Optional[bytes]:
        buf = ctypes.create_string_buffer(self._item_size)
        if self._lib.flh_ring_pop(self._ptr, buf):
            return buf.raw
        return None

    def __len__(self):
        return int(self._lib.flh_ring_size(self._ptr))

    def __del__(self):
        try:
            self._lib.flh_ring_destroy(self._ptr)
        except Exception:
            pass
