from parallel_gps_tpu.ops.balance import balance_ss
from parallel_gps_tpu.ops.disc import discretize, discretize_mfd
from parallel_gps_tpu.ops.linalg import (
    mvn_logpdf,
    solve_right,
    symmetrize,
)
from parallel_gps_tpu.ops.lyapunov import solve_lyap_vec

__all__ = [
    "balance_ss",
    "discretize",
    "discretize_mfd",
    "mvn_logpdf",
    "solve_right",
    "symmetrize",
    "solve_lyap_vec",
]
