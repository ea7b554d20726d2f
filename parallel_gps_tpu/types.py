"""Core container types.

Both containers are NamedTuples, hence automatically JAX pytrees: they pass
transparently through ``jit`` / ``grad`` / ``vmap`` / ``shard_map``.

Reference equivalents:
  - ``LGSSM``: pssgp/kalman/base.py:3
  - ``ContinuousDiscreteModel``: pssgp/kernels/base.py:15
"""
from __future__ import annotations

from typing import NamedTuple

import jax

Array = jax.Array


class LGSSM(NamedTuple):
    """Discrete linear-Gaussian state-space model over T time steps.

    The initial mean is implicitly zero (reference: pssgp/kalman/sequential.py:14).

    Attributes:
      P0: (d, d) initial state covariance (stationary covariance of the SDE).
      Fs: (T, d, d) per-step transition matrices ``expm(dt_k * F)``.
      Qs: (T, d, d) per-step process-noise covariances.
      H:  (1, d) shared observation row.
      R:  (1, 1) observation-noise covariance.
    """

    P0: Array
    Fs: Array
    Qs: Array
    H: Array
    R: Array


class ContinuousDiscreteModel(NamedTuple):
    """LTI SDE ``dx = F x dt + L dW`` with spectral density Q and readout H.

    Attributes:
      P0: (d, d) stationary covariance, solving ``F P + P Fᵀ + L Q Lᵀ = 0``.
      F:  (d, d) drift matrix.
      L:  (d, m) diffusion selection matrix.
      H:  (1, d) observation row.
      Q:  (m, m) white-noise spectral density.
    """

    P0: Array
    F: Array
    L: Array
    H: Array
    Q: Array
