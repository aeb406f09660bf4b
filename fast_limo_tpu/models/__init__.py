from fast_limo_tpu.models.state import NavState, ERR_DIM  # noqa: F401
