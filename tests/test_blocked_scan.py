"""Blocked two-level associative scan == flat lax.associative_scan, both
directions, divisible and non-divisible lengths, on the Kalman element
algebra."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from parallel_gps_tpu.kalman.parallel import (
    FilteringElement,
    SmoothingElement,
    filtering_identity,
    filtering_operator,
    smoothing_identity,
    smoothing_operator,
)
from parallel_gps_tpu.ops.scan import blocked_associative_scan


def _random_filtering(T, d, seed=0):
    rng = np.random.RandomState(seed)

    def spd():
        M = rng.randn(T, d, d) * 0.1
        return jnp.asarray(M @ np.swapaxes(M, -1, -2) + 0.5 * np.eye(d))

    return FilteringElement(
        A=jnp.asarray(rng.randn(T, d, d) * 0.3),
        b=jnp.asarray(rng.randn(T, d)),
        C=spd(),
        J=spd(),
        eta=jnp.asarray(rng.randn(T, d)),
    )


@pytest.mark.parametrize(
    "T,block", [(256, 32), (96, 16), (100, 16), (100, None), (7, None)]
)
@pytest.mark.parametrize("reverse", [False, True])
def test_blocked_matches_flat_filtering(T, block, reverse):
    d = 3
    elems = _random_filtering(T, d)
    flat = jax.lax.associative_scan(
        filtering_operator, elems, axis=0, reverse=reverse
    )
    blocked = blocked_associative_scan(
        filtering_operator,
        elems,
        filtering_identity(d, jnp.float64),
        reverse=reverse,
        block=block,
    )
    for a, b in zip(jax.tree.leaves(flat), jax.tree.leaves(blocked)):
        npt.assert_allclose(a, b, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("reverse", [False, True])
def test_blocked_matches_flat_smoothing(reverse):
    T, d = 128, 2
    rng = np.random.RandomState(3)
    elems = SmoothingElement(
        E=jnp.asarray(rng.randn(T, d, d) * 0.4),
        g=jnp.asarray(rng.randn(T, d)),
        L=jnp.asarray(np.eye(d) * np.abs(rng.randn(T, 1, 1))),
    )
    flat = jax.lax.associative_scan(
        smoothing_operator, elems, axis=0, reverse=reverse
    )
    blocked = blocked_associative_scan(
        smoothing_operator,
        elems,
        smoothing_identity(d, jnp.float64),
        reverse=reverse,
        block=16,
    )
    for a, b in zip(jax.tree.leaves(flat), jax.tree.leaves(blocked)):
        npt.assert_allclose(a, b, rtol=1e-9, atol=1e-9)
