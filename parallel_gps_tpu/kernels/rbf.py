"""RBF / squared-exponential kernel via order-k Taylor SDE approximation.

The SE spectral density has no finite-dimensional SDE; following the
reference (pssgp/kernels/rbf.py:14-61), we Taylor-expand the inverse spectral
density to order k, find the stable (left-half-plane) roots of the resulting
polynomial at trace time in float64 numpy (parameter-independent), and build a
controllable companion form.  Lengthscale/variance scaling happens in-graph so
gradients flow (reference: pssgp/kernels/rbf.py:78-101).
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import Array

from parallel_gps_tpu import config
from parallel_gps_tpu.kernels.base import SDEKernel, scaled_dist
from parallel_gps_tpu.ops.balance import balance_ss
from parallel_gps_tpu.ops.lyapunov import solve_lyap_vec
from parallel_gps_tpu.types import ContinuousDiscreteModel


@lru_cache(maxsize=None)
def _unscaled_rbf_sde(order: int):
    """Parameter-independent SDE coefficients for the unit-lengthscale SE
    kernel (reference: pssgp/kernels/rbf.py:14-61). Pure numpy, trace-time."""
    B = math.sqrt(2.0 * math.pi)
    A = np.zeros((2 * order + 1,), dtype=np.float64)
    i = 0
    for k in range(order, -1, -1):
        A[i] = 0.5**k / math.factorial(k)
        i += 2

    q = B / np.polyval(A, 0)

    # Substitute s = iω: divide coefficient j (degree 2order-j) by i^degree.
    LA = np.real(A / (1j ** np.arange(A.size - 1, -1, -1)))
    AR = np.roots(LA)

    GB = 1.0
    GA = np.poly(AR[np.real(AR) < 0])
    GA = GA / GA[-1]
    GB = GB / GA[0]
    GA = GA / GA[0]

    n = GA.size - 1
    F = np.zeros((n, n), dtype=np.float64)
    F[-1, :] = -GA[:0:-1]
    F[:-1, 1:] = np.eye(n - 1)
    L = np.zeros((n, 1), dtype=np.float64)
    L[-1, 0] = 1.0
    H = np.zeros((1, n), dtype=np.float64)
    H[0, 0] = GB
    return F, L, H, float(q)


@struct.dataclass
class RBF(SDEKernel):
    variance: Array = 1.0
    lengthscales: Array = 1.0
    order: int = struct.field(pytree_node=False, default=3)
    balancing_iter: int = struct.field(pytree_node=False, default=-1)

    @property
    def state_dim(self) -> int:
        return self.order

    def get_sde(self) -> ContinuousDiscreteModel:
        dtype = config.default_float()
        F_, L_, H_, q_ = _unscaled_rbf_sde(self.order)
        F = jnp.asarray(F_, dtype)
        L = jnp.asarray(L_, dtype)
        H = jnp.asarray(H_, dtype)
        q = jnp.asarray(q_, dtype)

        dim = F.shape[0]
        ell = jnp.asarray(self.lengthscales, dtype)
        var = jnp.asarray(self.variance, dtype)

        # In-graph lengthscale scaling of the companion form
        # (reference: pssgp/kernels/rbf.py:89-94).
        ell_vec = ell ** jnp.arange(dim, 0, -1, dtype=dtype)
        F = F.at[dim - 1, :].set(F[dim - 1, :] / ell_vec)
        H = H / (ell**dim)
        Q = (var * ell * q).reshape(1, 1)

        n_iter = (
            self.balancing_iter
            if self.balancing_iter >= 0
            else config.NUMBER_OF_BALANCING_STEPS
        )
        Fb, Lb, Hb, Qb = balance_ss(F, L, H, Q, n_iter)
        Pinf = solve_lyap_vec(Fb, Lb, Qb)
        return ContinuousDiscreteModel(Pinf, Fb, Lb, Hb, Qb.reshape(1, 1))

    def dense(self, X: Array, X2: Array) -> Array:
        r = scaled_dist(X, X2, self.lengthscales)
        return self.variance * jnp.exp(-0.5 * r**2)
