from parallel_gps_tpu.models.gpr import GPR
from parallel_gps_tpu.models.ssgp import StateSpaceGP, merge_sorted
from parallel_gps_tpu.models import params

__all__ = ["GPR", "StateSpaceGP", "merge_sorted", "params"]
