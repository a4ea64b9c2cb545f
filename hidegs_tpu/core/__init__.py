from hidegs_tpu.core import camera_math, ewa, geometry, sh, transforms  # noqa: F401
