"""Experiment entry points (reference: pssgp/experiments/).

Run as modules, e.g.::

    python -m parallel_gps_tpu.experiments.toy_models.speed_and_stability \
        --model pssgp --cov Matern32 --n-seeds 3
    python -m parallel_gps_tpu.experiments.sunspot.map --data-dir data/
    python -m parallel_gps_tpu.experiments.co2.mcmc --data-dir data/
"""
