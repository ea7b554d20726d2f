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


# Whether StateSpaceGP's LML uses the fused Pallas kernels on TPU.  Under
# ``vmap`` (batched GPs / chains) the entry points dispatch to the
# batched-sublane kernels via custom_vmap (kalman/pallas_scan.py), so this
# stays on for batched work; setting it False is a manual escape hatch to
# the differentiable XLA time-last engine.
PALLAS_LML: bool = True


def set_pallas_lml(enabled: bool) -> None:
    """Enable/disable the fused Pallas kernels for model LML (see above)."""
    global PALLAS_LML
    PALLAS_LML = bool(enabled)


# Largest state dimension the model layer auto-dispatches to the fused
# Pallas kernels for (the kernels support d <= 8 via Schur-recursed
# in-kernel inverses, kalman/pallas_scan.py::_inv).  Default 8: the
# round-3 TPU crossover table (BASELINE.md) measured the fused engine
# 12-20x faster than the XLA time-last engine at d = 4/6/8 (N=1M LML:
# 6.5 vs 99.8 ms, 16.0 vs 186 ms, 25.7 vs 502 ms) with both engines at
# the same f32 conditioning floor (d=6 vs f64 truth: 3.4e-5 XLA,
# 7.2e-5 fused).  ``set_fused_max_d(3)`` restores the conservative
# XLA-for-d>3 dispatch.
FUSED_MAX_D: int = 8


def set_fused_max_d(d: int) -> None:
    """Set the largest state dim auto-dispatched to the fused kernels."""
    global FUSED_MAX_D
    FUSED_MAX_D = int(d)


# Test hook: force the model layer's fused-engine dispatch on non-TPU
# backends, running every Pallas kernel in interpret mode.  This gives the
# model's dt-engine/strip branches (models/ssgp.py::_lml_impl,
# _predict_f_impl — alignment arithmetic, coeff plumbing, moveaxis
# conventions) off-TPU test coverage; keep blocks tiny (CPU interpret cost
# explodes with the unrolled kernel-body size, CLAUDE.md).
PALLAS_INTERPRET: bool = False


def set_pallas_interpret(enabled: bool) -> None:
    """Force fused-engine dispatch with interpret-mode kernels (tests)."""
    global PALLAS_INTERPRET
    PALLAS_INTERPRET = bool(enabled)


def pallas_interpret_overrides(block, interpret):
    """Applied by the fused-kernel entry points: under the
    ``PALLAS_INTERPRET`` test hook, force interpret mode and a tiny strip
    block (unless the caller pinned one).  Identity otherwise."""
    if PALLAS_INTERPRET:
        return (16 if block is None else block), True
    return block, interpret


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The deep unrolled associative-scan programs take 1-2 minutes to compile
    at T=10⁶ (the run itself is ~0.2 s); caching makes every later process
    skip straight to execution.  Safe to call multiple times.
    """
    import os

    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def default_float():
    """Default floating dtype: float64 iff ``jax_enable_x64`` is on.

    Mirrors the reference's GPflow ``config.default_float()`` usage
    (reference: pssgp/kernels/base.py:19) with JAX's native switch.
    """
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
