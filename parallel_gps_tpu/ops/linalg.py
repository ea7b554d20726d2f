"""Small-matrix linear-algebra helpers shared by the Kalman engines.

All functions are shape-polymorphic over leading batch dimensions so that a
single implementation serves the per-step (d, d) path, the vectorized
(T, d, d) path, and vmapped batches of GPs.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array


def symmetrize(P: Array) -> Array:
    """0.5 (P + Pᵀ) over the trailing two axes.

    The reference symmetrizes covariances after every predict/update to fight
    float drift (reference: pssgp/kalman/sequential.py:21,39,61;
    parallel.py:116-117,165); we keep the same discipline.
    """
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))


def solve_right(M: Array, A: Array) -> Array:
    """Return ``A @ inv(M)`` via a transposed solve, batched over leading dims.

    Equivalent to the reference's ``tf.linalg.solve(M, Aᵀ, adjoint=True)ᵀ``
    pattern (reference: pssgp/kalman/parallel.py:107,112).
    """
    return jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(M, -1, -2), jnp.swapaxes(A, -1, -2)),
        -1,
        -2,
    )


def cho_solve_psd(S: Array, B: Array) -> Array:
    """Solve ``S X = B`` for symmetric positive-definite S via Cholesky.

    Batched over leading dimensions. Mirrors ``tf.linalg.cholesky_solve``
    usage in the reference hot loops (e.g. pssgp/kalman/sequential.py:29).
    """
    chol = jnp.linalg.cholesky(S)
    # Two triangular solves: L z = B, then Lᵀ x = z.
    from jax.scipy.linalg import solve_triangular

    z = solve_triangular(chol, B, lower=True)
    return solve_triangular(jnp.swapaxes(chol, -1, -2), z, lower=False)


def mvn_logpdf(y: Array, mean: Array, cov: Array) -> Array:
    """Log-density of N(mean, cov) at y, batched over leading dims.

    y, mean: (..., k); cov: (..., k, k). Uses Cholesky like the reference's
    ``MultivariateNormalTriL.log_prob`` (pssgp/kalman/sequential.py:27-28).
    """
    k = y.shape[-1]
    chol = jnp.linalg.cholesky(cov)
    from jax.scipy.linalg import solve_triangular

    diff = (y - mean)[..., None]
    z = solve_triangular(chol, diff, lower=True)[..., 0]
    quad = jnp.sum(z * z, axis=-1)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )
    return -0.5 * (quad + logdet + k * math.log(2.0 * math.pi))
