from fast_limo_tpu.parallel import sharded  # noqa: F401
