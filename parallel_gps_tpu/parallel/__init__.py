from parallel_gps_tpu.parallel.distributed import (
    initialize,
    make_process_mesh,
    pad_time_axis,
    scan_efficiency_report,
)
from parallel_gps_tpu.parallel.scan import (
    sharded_associative_scan,
    sharded_associative_scan_tl,
)
from parallel_gps_tpu.parallel.sharded import (
    make_mesh_2d,
    make_time_mesh,
    sharded_batched_lml_tl,
    sharded_batched_pkf_lml,
    sharded_lml_tl,
    sharded_pkf,
    sharded_pkf_tl,
    sharded_pkfs,
    sharded_pkfs_tl,
    sharded_pks,
    sharded_pks_tl,
)

__all__ = [
    "initialize",
    "make_process_mesh",
    "pad_time_axis",
    "scan_efficiency_report",
    "sharded_associative_scan",
    "sharded_associative_scan_tl",
    "make_time_mesh",
    "make_mesh_2d",
    "sharded_pkf",
    "sharded_pks",
    "sharded_pkfs",
    "sharded_pkf_tl",
    "sharded_pks_tl",
    "sharded_pkfs_tl",
    "sharded_lml_tl",
    "sharded_batched_lml_tl",
    "sharded_batched_pkf_lml",
]
