from fast_limo_tpu.utils.config import Config  # noqa: F401
