#!/usr/bin/env bash
# Full test suite in four isolated pytest processes.
#
# On some hosts jaxlib's XLA:CPU compiler segfaults (exit 139) when a LARGE
# multi-device program compiles late in a long-lived process (~37-40% into
# the one-process suite; 5 reproductions across cache-on/cache-off runs,
# crash sites in backend_compile_and_load, cache-write serialization, and
# deserialized execution — every implicated module passes alone).  Process
# chunking keeps each process under the threshold.  CI (fresh GitHub
# runners) still runs the one-process suite; use this locally when
# `pytest tests/ -q` dies with exit 139.
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pytest tests/test_batched_pallas.py tests/test_blocked_scan.py \
    tests/test_distributed.py tests/test_expm.py tests/test_fisher_vjp.py \
    tests/test_gp_vs_kfs.py -q "$@"
python -m pytest tests/test_kalman.py tests/test_kernels.py \
    tests/test_model.py tests/test_model_sharded.py tests/test_multiobs.py \
    tests/test_native_balance.py -q "$@"
python -m pytest tests/test_pallas_dt.py tests/test_pallas_scan.py \
    tests/test_params.py tests/test_sharded.py tests/test_sqrt.py \
    tests/test_timelast.py tests/test_utils.py -q "$@"
python -m pytest tests/test_model_interpret.py -q "$@"
echo "all chunks green"
