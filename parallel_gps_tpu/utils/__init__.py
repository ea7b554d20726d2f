from parallel_gps_tpu.utils.checkpoint import load_pytree, save_pytree
from parallel_gps_tpu.utils.profiling import timed, trace

__all__ = ["save_pytree", "load_pytree", "timed", "trace"]
