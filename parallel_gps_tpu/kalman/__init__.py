from parallel_gps_tpu.kalman.parallel import pkf, pkfs, pks
from parallel_gps_tpu.kalman.sequential import kf, kfs, ks
from parallel_gps_tpu.kalman.sqrt import (
    sqrt_lml,
    sqrt_lml_kernel,
    sqrt_pkf,
    sqrt_pkfs,
    sqrt_pkfs_kernel,
    sqrt_pks,
)

__all__ = [
    "kf", "ks", "kfs", "pkf", "pks", "pkfs",
    "sqrt_pkf", "sqrt_pks", "sqrt_pkfs",
    "sqrt_lml", "sqrt_lml_kernel", "sqrt_pkfs_kernel",
]
