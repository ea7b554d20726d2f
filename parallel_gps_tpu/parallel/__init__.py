from parallel_gps_tpu.parallel.scan import sharded_associative_scan
from parallel_gps_tpu.parallel.sharded import (
    make_time_mesh,
    sharded_pkf,
    sharded_pkfs,
    sharded_pks,
)

__all__ = [
    "sharded_associative_scan",
    "make_time_mesh",
    "sharded_pkf",
    "sharded_pks",
    "sharded_pkfs",
]
