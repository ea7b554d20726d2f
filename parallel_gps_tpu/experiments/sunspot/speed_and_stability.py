"""Sunspot speed & stability sweep.

The reference file is a byte-identical copy of the toy_models one (it even
imports toy common — reference sunspot/speed_and_stability.py:17; see
SURVEY.md §2.20 "copy-paste artifact; do not replicate").  We delegate
instead of duplicating.
"""
from parallel_gps_tpu.experiments.toy_models.speed_and_stability import main

if __name__ == "__main__":
    main()
