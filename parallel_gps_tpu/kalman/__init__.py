from parallel_gps_tpu.kalman.parallel import pkf, pkfs, pks
from parallel_gps_tpu.kalman.sequential import kf, kfs, ks
from parallel_gps_tpu.kalman.sqrt import sqrt_pkf

__all__ = ["kf", "ks", "kfs", "pkf", "pks", "pkfs", "sqrt_pkf"]
