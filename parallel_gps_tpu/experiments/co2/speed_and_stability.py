"""CO2 speed & stability sweep.

The reference file is a byte-identical copy of the toy_models one
(reference co2/speed_and_stability.py:16-17; SURVEY.md §2.21).  We delegate
instead of duplicating.
"""
from parallel_gps_tpu.experiments.toy_models.speed_and_stability import main

if __name__ == "__main__":
    main()
