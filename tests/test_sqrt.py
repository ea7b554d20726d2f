"""Square-root parallel filter (kalman/sqrt.py) == standard generic engine.

The sqrt combine is the same Lemma 7/8 algebra re-expressed on Cholesky
factors (module docstring derivation), so moments/LML must match the
standard engine to roundoff at f64; the factors must stay PSD by
construction; and the associativity property must hold for the operator.
"""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from parallel_gps_tpu.kalman.parallel import pkf
from parallel_gps_tpu.kalman.sqrt import (
    SqrtFilteringElement,
    sqrt_filtering_operator,
    sqrt_pkf,
)
from parallel_gps_tpu.kernels import Matern52, Periodic, RBF
from parallel_gps_tpu.toymodels import obs_noise, sinu


def _setup(kernel, T, seed=0):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, seed)
    y[rng.choice(T, T // 9, replace=False)] = np.nan
    ts = jnp.asarray(t).reshape(-1, 1)
    R = jnp.asarray(0.1).reshape(1, 1)
    ssm = kernel.get_ssm(ts, R)
    return ssm, jnp.asarray(y).reshape(-1, 1)


@pytest.mark.parametrize(
    "kernel,T",
    [
        (Matern52(0.9, 0.4), 257),
        (RBF(1.1, 0.5, order=6), 211),
        (Periodic(1.2, 0.8, period=0.7, order=2), 123),
    ],
    ids=["m52", "rbf6", "periodic2"],
)
def test_sqrt_pkf_matches_generic(kernel, T):
    ssm, ys = _setup(kernel, T)
    ms, Ps, ell = pkf(ssm, ys, return_loglikelihood=True, engine="generic")
    ms2, Us, ell2 = sqrt_pkf(ssm, ys, return_loglikelihood=True)
    Ps2 = Us @ jnp.swapaxes(Us, -1, -2)
    sm = float(jnp.max(jnp.abs(ms)))
    sP = float(jnp.max(jnp.abs(Ps)))
    npt.assert_allclose(float(ell2), float(ell), rtol=1e-9)
    npt.assert_allclose(ms2, ms, atol=1e-8 * sm)
    npt.assert_allclose(Ps2, Ps, atol=1e-8 * sP)
    # factors keep covariances PSD by construction
    eigs = jnp.linalg.eigvalsh(Ps2)
    assert float(eigs.min()) > -1e-12 * sP


def test_sqrt_operator_associative():
    rng = np.random.RandomState(3)
    d = 4

    def rand_elem(n):
        U = jnp.asarray(rng.randn(n, d, d) * 0.3)
        Z = jnp.asarray(rng.randn(n, d, d) * 0.3)
        return SqrtFilteringElement(
            A=jnp.asarray(rng.randn(n, d, d) * 0.5),
            b=jnp.asarray(rng.randn(n, d)),
            U=jnp.tril(U),
            Z=jnp.tril(Z),
            eta=jnp.asarray(rng.randn(n, d)),
        )

    e1, e2, e3 = rand_elem(5), rand_elem(5), rand_elem(5)
    left = sqrt_filtering_operator(sqrt_filtering_operator(e1, e2), e3)
    right = sqrt_filtering_operator(e1, sqrt_filtering_operator(e2, e3))
    npt.assert_allclose(left.A, right.A, rtol=1e-8, atol=1e-10)
    npt.assert_allclose(left.b, right.b, rtol=1e-8, atol=1e-10)
    # factors are unique only up to orthogonal right-multiplication:
    # compare the Gram matrices
    npt.assert_allclose(
        left.U @ jnp.swapaxes(left.U, -1, -2),
        right.U @ jnp.swapaxes(right.U, -1, -2),
        rtol=1e-8, atol=1e-10,
    )
    npt.assert_allclose(
        left.Z @ jnp.swapaxes(left.Z, -1, -2),
        right.Z @ jnp.swapaxes(right.Z, -1, -2),
        rtol=1e-8, atol=1e-10,
    )
    npt.assert_allclose(left.eta, right.eta, rtol=1e-8, atol=1e-10)


def test_sqrt_pkf_all_nan():
    """All observations missing: LML must be exactly 0 and the filtered
    moments the prior prediction (m = 0)."""
    ssm, ys = _setup(Matern52(1.0, 0.5), 64)
    ys = jnp.full_like(ys, jnp.nan)
    ms, Us, ell = sqrt_pkf(ssm, ys, return_loglikelihood=True)
    assert float(ell) == 0.0
    npt.assert_allclose(ms, 0.0, atol=1e-12)


def test_gramian_disc_factors_match_q_planes():
    """Quadrature factors G with G Gᵀ == the cancellation-free Q planes,
    ENTRYWISE (the factored discretization contract — eigh/chol factors
    only reach ‖Q‖·eps absolute on graded companion Q)."""
    from parallel_gps_tpu.kalman.sqrt import gramian_disc_factors

    # Matérn closed forms are per-entry relative (nilpotent exppoly), so
    # the factors reproduce Q entrywise to solver precision; RBF's spectral
    # transitions carry a ~1e-12·max absolute floor (cross-block sums),
    # which reads as ~1e-6 relative on Q entries near the significance
    # cutoff — still ~1e8× tighter than an eigh factorization of the
    # assembled Q, whose FACTOR error is ~√(eps·‖Q‖).
    for kern, tol in [
        (Matern52(0.9, 0.4), 1e-9),
        (RBF(1.1, 0.5, order=6), 1e-5),
    ]:
        rng = np.random.RandomState(1)
        ts = jnp.asarray(np.sort(rng.rand(97))).reshape(-1, 1)
        R = jnp.asarray(0.1).reshape(1, 1)
        ssm = kern.get_ssm(ts, R)
        dts = jnp.diff(ts[:, 0], prepend=jnp.zeros((1,), ts.dtype))
        G = gramian_disc_factors(kern, dts, nodes=12)
        QQ = G @ jnp.swapaxes(G, -1, -2)
        scale = jnp.max(jnp.abs(ssm.Qs), axis=(-1, -2), keepdims=True)
        # entries below ~1e-6·max are where the PLANE side itself only
        # reaches ~1e-16·max absolute (cancellation-free but assembled) —
        # exclude them rather than test the reference's own roundoff
        sig = jnp.abs(ssm.Qs) > 1e-6 * scale
        rel = jnp.where(
            sig, jnp.abs(QQ - ssm.Qs) / jnp.where(sig, jnp.abs(ssm.Qs), 1.0),
            0.0,
        )
        assert float(jnp.max(rel)) < tol, type(kern).__name__


def test_sqrt_pkf_kernel_matches_generic():
    """End-to-end kernel entry (quadrature factors) == the standard
    generic engine at f64."""
    from parallel_gps_tpu.kalman.sqrt import sqrt_pkf_kernel

    kern = Matern52(0.9, 0.4)
    rng = np.random.RandomState(2)
    t = np.sort(rng.rand(201))
    y = obs_noise(sinu(t), 0.1, 2)
    y[rng.choice(201, 22, replace=False)] = np.nan
    ts = jnp.asarray(t).reshape(-1, 1)
    R = jnp.asarray(0.1).reshape(1, 1)
    ys = jnp.asarray(y).reshape(-1, 1)
    ssm = kern.get_ssm(ts, R)
    ms, Ps, ell = pkf(ssm, ys, return_loglikelihood=True, engine="generic")
    ms2, Us, ell2 = sqrt_pkf_kernel(
        kern, ts, R, ys, return_loglikelihood=True
    )
    npt.assert_allclose(float(ell2), float(ell), rtol=1e-9)
    npt.assert_allclose(ms2, ms, atol=1e-8 * float(jnp.max(jnp.abs(ms))))
    npt.assert_allclose(
        Us @ jnp.swapaxes(Us, -1, -2), Ps,
        atol=1e-8 * float(jnp.max(jnp.abs(Ps))),
    )
