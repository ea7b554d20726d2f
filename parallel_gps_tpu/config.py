"""Global configuration for parallel-gps-tpu.

The reference implementation (pssgp) uses three configuration mechanisms:
GPflow's global dtype config, a module-global balancing-step count
(reference: pssgp/config.py:6-16), and per-experiment absl flags.  Here we
collapse the first two into this module; dtype follows JAX's ``jax_enable_x64``
switch so a single flag controls precision everywhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Number of diagonal-similarity balancing iterations used when compiling
# composite / high-order kernels to SDE form (reference: pssgp/config.py:6).
NUMBER_OF_BALANCING_STEPS: int = 10


def set_number_balancing_steps(n: int) -> None:
    """Set the default number of balancing iterations (reference: pssgp/config.py:9-16)."""
    global NUMBER_OF_BALANCING_STEPS
    NUMBER_OF_BALANCING_STEPS = int(n)


def default_float():
    """Default floating dtype: float64 iff ``jax_enable_x64`` is on.

    Mirrors the reference's GPflow ``config.default_float()`` usage
    (reference: pssgp/kernels/base.py:19) with JAX's native switch.
    """
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
