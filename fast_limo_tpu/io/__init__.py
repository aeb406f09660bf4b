from fast_limo_tpu.io import synthetic  # noqa: F401
