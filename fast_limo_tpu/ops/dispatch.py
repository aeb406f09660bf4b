"""Kernel dispatch policy: which Pallas kernels are active on this backend.

Every fused TPU kernel has an identical-semantics jnp fallback; the
``FAST_LIMO_NO_PALLAS`` environment variable disables kernels by name
("all" or a comma list of {gain, update_body, update_loop, hstats, knn,
sort, deskew, plane}) — the
bisection lever for isolating on-device kernel regressions that CPU tests
(which never run Mosaic-lowered code) cannot see.  Read at trace time: set
it before constructing the Localizer.
"""

from __future__ import annotations

import os


def kernel_enabled(name: str, platform: str = None) -> bool:
    disabled = os.environ.get("FAST_LIMO_NO_PALLAS", "")
    if disabled:
        if disabled.strip() == "all":
            return False
        if name in {s.strip() for s in disabled.split(",")}:
            return False
    if platform is None:
        import jax

        platform = jax.devices()[0].platform
    return platform in ("tpu", "axon")
