"""State-space balancing (Parlett–Reinsch diagonal similarity scaling).

The reference implements this as a numba-JIT'd host routine called through a
``tf.numpy_function`` host callback (reference: pssgp/kernels/math_utils.py:10-81),
which (a) breaks device placement and (b) makes the scale vector an implicit
constant w.r.t. autodiff.  Here it is pure JAX running on-device at trace/compile
time; we reproduce the implicit-constant gradient semantics explicitly with
``stop_gradient`` on the scale vector, so gradients match the reference's.

The matrices are tiny ((d, d), d ≤ ~32) and the iteration count is static, so
the loops are unrolled at trace time — XLA constant-folds most of this when
parameters are concrete.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from parallel_gps_tpu import config


def balance_scale(F: Array, n_iter: int) -> Array:
    """Compute the diagonal scale vector d so that D⁻¹ F D has balanced
    row/column norms (reference: pssgp/kernels/math_utils.py:10-29; method of
    arXiv 1401.5766).

    Unlike the reference's numba routine, a degenerate row/column (zero norm)
    leaves the scale untouched instead of producing NaN.
    """
    import numpy as np

    if not isinstance(F, jax.core.Tracer):
        # Concrete (trace-time) input: run the native/host routine instead of
        # eagerly dispatching the unrolled on-device loop — same semantics,
        # one C call (native/balance.c; numpy fallback).  The reference's
        # numba+tf.numpy_function host callback plays this role
        # (pssgp/kernels/math_utils.py:68).
        from parallel_gps_tpu.ops.native import balance_scale_host

        scale = balance_scale_host(np.asarray(F, np.float64), int(n_iter))
        return jnp.asarray(scale, F.dtype)

    dim = F.shape[0]
    d = jnp.ones((dim,), dtype=F.dtype)
    eye = jnp.eye(dim, dtype=F.dtype)
    for _ in range(int(n_iter)):
        for i in range(dim):
            col = F[:, i] * (1.0 - eye[:, i])
            row = F[i, :] * (1.0 - eye[i, :])
            c = jnp.linalg.norm(col, 2)
            r = jnp.linalg.norm(row, 2)
            ok = (c > 0.0) & (r > 0.0)
            f = jnp.where(ok, jnp.sqrt(r / jnp.where(ok, c, 1.0)), 1.0)
            d = d.at[i].multiply(f)
            # F[i, i] is multiplied then divided by f, i.e. left unchanged.
            F = F.at[:, i].multiply(f)
            F = F.at[i, :].divide(f)
    return d


def balance_ss(
    F: Array, L: Array, H: Array, q: Array, n_iter: int | None = None
) -> Tuple[Array, Array, Array, Array]:
    """Balance an LTI state-space model for numerical stability.

    Rescales F by the similarity D, folds the scale into L and H, then
    normalizes max|L| and max|H| to 1, pushing the magnitudes into the scalar
    spectral density q (reference: pssgp/kernels/math_utils.py:32-81).

    The scale factors are wrapped in ``stop_gradient``: they are treated as
    constants w.r.t. kernel hyperparameters, exactly matching the reference
    where the scale comes from a non-differentiable host callback.
    """
    if n_iter is None:
        n_iter = config.NUMBER_OF_BALANCING_STEPS
    d = jax.lax.stop_gradient(balance_scale(F, n_iter))
    F = F * d[None, :] / d[:, None]
    L = L / d[:, None]
    H = H * d[None, :]

    tmp3 = jax.lax.stop_gradient(jnp.max(jnp.abs(L)))
    L = L / tmp3
    q = (tmp3**2) * q

    tmp4 = jax.lax.stop_gradient(jnp.max(jnp.abs(H)))
    H = H / tmp4
    q = (tmp4**2) * q
    return F, L, H, q
