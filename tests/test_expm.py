"""Batched Padé-13 expm and the kernels' closed-form transition operators,
pinned against scipy.linalg.expm."""
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
import scipy.linalg

from parallel_gps_tpu.kernels import (
    Matern12,
    Matern32,
    Matern52,
    Periodic,
    RBF,
)
from parallel_gps_tpu.ops.expm import expm_dt_batched, expm_pade13


def test_expm_pade13_random_batch():
    rng = np.random.RandomState(0)
    A = rng.randn(16, 5, 5) * np.logspace(-3, 2, 16)[:, None, None]
    want = np.stack([scipy.linalg.expm(a) for a in A])
    got = expm_pade13(jnp.asarray(A))
    npt.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_expm_dt_batched():
    rng = np.random.RandomState(1)
    F = rng.randn(4, 4)
    dts = np.abs(rng.rand(32)) * 10.0
    want = np.stack([scipy.linalg.expm(dt * F) for dt in dts])
    got = expm_dt_batched(jnp.asarray(F), jnp.asarray(dts))
    npt.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


KERNELS = [
    Matern12(variance=1.3, lengthscales=0.7),
    Matern32(variance=0.9, lengthscales=0.4),
    Matern52(variance=1.1, lengthscales=0.3),
    Periodic(variance=1.0, lengthscales=0.8, period=0.9, order=3),
    Matern32(variance=1.0, lengthscales=0.5) + Matern52(variance=0.7, lengthscales=0.8),
    Matern32(variance=1.0, lengthscales=0.5) * Matern52(variance=0.7, lengthscales=0.8),
    RBF(variance=1.0, lengthscales=0.5, order=4)
    + Matern32(variance=1.0, lengthscales=0.5),
]
IDS = ["m12", "m32", "m52", "periodic", "sum", "product", "sum_rbf"]


@pytest.mark.parametrize("kernel", KERNELS, ids=IDS)
def test_transitions_match_generic_expm(kernel):
    """Closed-form transition operators == expm of the (balanced) SDE drift."""
    sde = kernel.get_sde()
    dts = jnp.asarray(np.abs(np.random.RandomState(2).rand(8)) * 2.0)
    got = kernel.transitions(dts)
    if got is None:
        pytest.skip("kernel uses the generic path")
    F = np.asarray(sde.F)
    want = np.stack([scipy.linalg.expm(float(dt) * F) for dt in np.asarray(dts)])
    npt.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("d", [2, 6, 15])
def test_expm1_dt_tl_matches_batched(d):
    """Time-last Padé expm (the layout that replaced the OOM-prone batched
    (T, d, d) path for high-order kernels) — values and gradients."""
    import jax

    from parallel_gps_tpu.ops.expm import expm1_dt_batched, expm1_dt_tl

    rng = np.random.RandomState(d)
    F = jnp.asarray(rng.randn(d, d))
    dts = jnp.asarray(np.abs(rng.rand(50)) * 3.0)
    tl = expm1_dt_tl(F, dts)
    batched = jnp.moveaxis(expm1_dt_batched(F, dts), 0, -1)
    npt.assert_allclose(tl, batched, rtol=1e-9, atol=1e-12)
    g_tl = jax.grad(lambda f: jnp.sum(expm1_dt_tl(f, dts)))(F)
    g_b = jax.grad(lambda f: jnp.sum(expm1_dt_batched(f, dts)))(F)
    npt.assert_allclose(g_tl, g_b, rtol=1e-7, atol=1e-10)


def test_expm1_dt_tl_float32_no_overflow():
    """The Padé solve is normalized by 1/b0: without it the Schur inverse's
    3x3 adjugate determinants overflow float32 (entries ~6.5e16 cubed)."""
    from parallel_gps_tpu.kernels import RBF

    rbf = RBF(variance=1.0, lengthscales=0.5, order=6, balancing_iter=10)
    t = np.sort(np.random.RandomState(0).rand(512)).astype(np.float32) * 4.0
    ssm = rbf.get_ssm_tl(
        jnp.asarray(t, jnp.float32).reshape(-1, 1),
        jnp.asarray(0.1, jnp.float32).reshape(1, 1),
    )
    assert bool(jnp.isfinite(ssm.Fs).all())
    assert bool(jnp.isfinite(ssm.Qs).all())
