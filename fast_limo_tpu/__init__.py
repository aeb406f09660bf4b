"""fast_limo_tpu — a TPU-native LiDAR-inertial odometry & SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of fast_LIMO
(fetty31/fast_LIMO): iterated error-state Kalman filtering on manifolds,
motion-compensated deskewing, direct point-to-plane scan-to-map registration
against an incremental voxel-hash map, loop closure and pose-graph
optimization — all as fixed-shape, jit-compiled array programs that scale
over a `jax.sharding.Mesh`.

Reference parity notes cite `file:line` of the reference tree
(/root/reference, fetty31/fast_LIMO @ 2025-05-23).
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bfloat16 multiplies for float32 operands; the
# filter's covariance algebra, plane fits, and Jacobian products need true
# f32 (the reference runs them in double). The affected matmuls are tiny
# (≤ 23×23, 12×M), so this costs nothing measurable.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: first compile over the tunneled TPU takes
# minutes; cache it so repeat CLI/bench invocations start in seconds.
import os as _os

_cache_dir = _os.environ.get("FAST_LIMO_TPU_CACHE",
                             _os.path.expanduser("~/.cache/fast_limo_tpu_xla"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is an optimization only
    pass

from fast_limo_tpu.utils.config import Config  # noqa: F401
