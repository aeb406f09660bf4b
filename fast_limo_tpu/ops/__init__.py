from fast_limo_tpu.ops import so3, s2, geometry, plane, voxel  # noqa: F401
