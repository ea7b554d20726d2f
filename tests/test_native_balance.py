"""Native/host balancing == traced pure-JAX balancing."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from parallel_gps_tpu.ops.balance import balance_scale
from parallel_gps_tpu.ops.native import _np_balance_scale, balance_scale_host


def _traced_scale(F, n_iter):
    """Force the traced (pure-JAX) path by calling under jit."""
    return jax.jit(lambda M: balance_scale(M, n_iter))(F)


def test_host_matches_traced():
    rng = np.random.RandomState(0)
    for n in (2, 3, 6, 12):
        F = rng.randn(n, n) * np.logspace(-2, 2, n)[:, None]
        got = balance_scale_host(F, 10)
        want = np.asarray(_traced_scale(jnp.asarray(F), 10))
        npt.assert_allclose(got, want, rtol=1e-10)


def test_c_matches_numpy_fallback():
    rng = np.random.RandomState(1)
    F = rng.randn(5, 5) * 10.0
    npt.assert_allclose(
        balance_scale_host(F, 7), _np_balance_scale(F, 7), rtol=1e-12
    )


def test_degenerate_row_is_noop():
    F = np.zeros((3, 3))
    F[0, 1] = 2.0  # row 0 has norm, col 0 doesn't; rows 1,2 empty
    got = balance_scale_host(F, 5)
    assert np.all(np.isfinite(got))
    want = np.asarray(_traced_scale(jnp.asarray(F), 5))
    npt.assert_allclose(got, want, rtol=1e-12)
