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


def test_sqrt_kernel_entry_composite_fallback():
    """Composite kernels carry block / full-rank dispersion L, so the
    quadrature Gramian doesn't apply — the kernel entries must fall back to
    eigh factors and still match the generic engine."""
    from parallel_gps_tpu.kalman.parallel import pkfs
    from parallel_gps_tpu.kalman.sqrt import sqrt_pkfs_kernel
    from parallel_gps_tpu.kernels import Matern32

    kern = Periodic(1.2, 0.8, period=0.7, order=2) * Matern32(1.0, 0.5)
    rng = np.random.RandomState(4)
    t = np.sort(rng.rand(97))
    y = obs_noise(sinu(t), 0.1, 4)
    ts = jnp.asarray(t).reshape(-1, 1)
    R = jnp.asarray(0.1).reshape(1, 1)
    ys = jnp.asarray(y).reshape(-1, 1)
    ssm = kern.get_ssm(ts, R)
    gms, gPs = pkfs(ssm, ys, engine="generic")
    gms2, gNs = sqrt_pkfs_kernel(kern, ts, R, ys)
    gPs2 = gNs @ jnp.swapaxes(gNs, -1, -2)
    npt.assert_allclose(
        gms2, gms, atol=1e-7 * float(jnp.max(jnp.abs(gms)))
    )
    npt.assert_allclose(
        gPs2, gPs, atol=1e-7 * float(jnp.max(jnp.abs(gPs)))
    )


@pytest.mark.parametrize(
    "kernel,T",
    [
        (Matern52(0.9, 0.4), 257),
        (RBF(1.1, 0.5, order=6), 211),
    ],
    ids=["m52", "rbf6"],
)
def test_sqrt_pks_matches_generic(kernel, T):
    """Square-root smoother == standard generic smoother at f64; factors
    keep the smoothed covariances PSD."""
    from parallel_gps_tpu.kalman.parallel import pks
    from parallel_gps_tpu.kalman.sqrt import sqrt_pkfs

    ssm, ys = _setup(kernel, T)
    fms, fPs = pkf(ssm, ys, engine="generic")
    gms, gPs = pks(ssm, fms, fPs, engine="generic")
    gms2, gNs = sqrt_pkfs(ssm, ys)
    gPs2 = gNs @ jnp.swapaxes(gNs, -1, -2)
    sm = float(jnp.max(jnp.abs(gms)))
    sP = float(jnp.max(jnp.abs(gPs)))
    npt.assert_allclose(gms2, gms, atol=1e-8 * sm)
    npt.assert_allclose(gPs2, gPs, atol=1e-8 * sP)
    eigs = jnp.linalg.eigvalsh(gPs2)
    assert float(eigs.min()) > -1e-12 * sP


def test_sqrt_smoothing_operator_associative():
    from parallel_gps_tpu.kalman.sqrt import (
        SqrtSmoothingElement,
        sqrt_smoothing_operator,
    )

    rng = np.random.RandomState(7)
    d = 4

    def rand_elem(n):
        return SqrtSmoothingElement(
            E=jnp.asarray(rng.randn(n, d, d) * 0.5),
            g=jnp.asarray(rng.randn(n, d)),
            N=jnp.tril(jnp.asarray(rng.randn(n, d, d) * 0.3)),
        )

    e1, e2, e3 = rand_elem(5), rand_elem(5), rand_elem(5)
    left = sqrt_smoothing_operator(sqrt_smoothing_operator(e1, e2), e3)
    right = sqrt_smoothing_operator(e1, sqrt_smoothing_operator(e2, e3))
    npt.assert_allclose(left.E, right.E, rtol=1e-8, atol=1e-10)
    npt.assert_allclose(left.g, right.g, rtol=1e-8, atol=1e-10)
    npt.assert_allclose(
        left.N @ jnp.swapaxes(left.N, -1, -2),
        right.N @ jnp.swapaxes(right.N, -1, -2),
        rtol=1e-8, atol=1e-10,
    )


def test_stable_model_matches_standard():
    """StateSpaceGP(stable=True): LML and predict_f match the standard
    parallel model at f64; query variances are nonnegative; the LML is
    differentiable (training/MCMC usable on the stable path)."""
    from parallel_gps_tpu.models import StateSpaceGP

    kern = Matern52(0.9, 0.4)
    rng = np.random.RandomState(5)
    t = np.sort(rng.rand(181))
    y = obs_noise(sinu(t), 0.1, 5)
    y[rng.choice(181, 20, replace=False)] = np.nan
    xq = rng.rand(33)  # unsorted queries

    std = StateSpaceGP.create((t, y), kern, 0.1)
    stb = StateSpaceGP.create((t, y), kern, 0.1, stable=True)
    l1 = float(std.log_marginal_likelihood())
    l2 = float(stb.log_marginal_likelihood())
    npt.assert_allclose(l2, l1, rtol=1e-9)

    m1, v1 = std.predict_f(xq)
    m2, v2 = stb.predict_f(xq)
    npt.assert_allclose(m2, m1, atol=1e-8 * float(jnp.max(jnp.abs(m1))))
    npt.assert_allclose(v2, v1, atol=1e-8 * float(jnp.max(jnp.abs(v1))))
    assert float(v2.min()) >= 0.0

    def loss(p, stable):
        m = StateSpaceGP.create(
            (t, y), Matern52(p[0], p[1]), p[2], stable=stable
        )
        return m.training_loss()

    p0 = jnp.asarray([0.9, 0.4, 0.1])
    v_std, g_std = jax.value_and_grad(lambda p: loss(p, False))(p0)
    v_stb, g_stb = jax.value_and_grad(lambda p: loss(p, True))(p0)
    npt.assert_allclose(float(v_stb), float(v_std), rtol=1e-9)
    assert bool(jnp.isfinite(g_stb).all())
    npt.assert_allclose(g_stb, g_std, rtol=1e-6)


def test_stable_model_validation():
    from parallel_gps_tpu.models import StateSpaceGP

    with pytest.raises(ValueError, match="parallel"):
        StateSpaceGP.create(
            (np.arange(4.0), np.zeros(4)), Matern52(1.0, 0.5), 0.1,
            parallel=False, stable=True,
        )


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
