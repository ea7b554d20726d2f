"""Time-last SoA engine == generic engine, values and gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from parallel_gps_tpu.kalman.parallel import pkf, pkfs
from parallel_gps_tpu.kernels import Matern12, Matern32, Matern52
from parallel_gps_tpu.toymodels import obs_noise, sinu

KERNELS = [
    Matern12(variance=1.2, lengthscales=0.6),
    Matern32(variance=1.0, lengthscales=0.5),
    Matern52(variance=0.8, lengthscales=0.4),
]
IDS = ["m12", "m32", "m52"]


def _setup(kernel, T=257, with_nans=True, seed=0):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, seed)
    if with_nans:
        y[rng.choice(T, T // 7, replace=False)] = np.nan
    ssm = kernel.get_ssm(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    return ssm, jnp.asarray(y).reshape(-1, 1)


@pytest.mark.parametrize("kernel", KERNELS, ids=IDS)
def test_filter_matches_generic(kernel):
    ssm, ys = _setup(kernel)
    fms_g, fPs_g, ell_g = pkf(ssm, ys, True, engine="generic")
    fms_t, fPs_t, ell_t = pkf(ssm, ys, True, engine="timelast")
    npt.assert_allclose(fms_t, fms_g, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(fPs_t, fPs_g, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(ell_t, ell_g, rtol=1e-10)


@pytest.mark.parametrize("kernel", KERNELS, ids=IDS)
def test_smoother_matches_generic(kernel):
    ssm, ys = _setup(kernel, T=192)
    sms_g, sPs_g = pkfs(ssm, ys, engine="generic")
    sms_t, sPs_t = pkfs(ssm, ys, engine="timelast")
    npt.assert_allclose(sms_t, sms_g, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(sPs_t, sPs_g, rtol=1e-8, atol=1e-9)


def test_gradients_match_generic():
    kernel_proto = Matern32(variance=1.0, lengthscales=0.5)
    rng = np.random.RandomState(1)
    T = 128
    t = jnp.asarray(np.sort(rng.rand(T))).reshape(-1, 1)
    y = jnp.asarray(obs_noise(sinu(np.asarray(t[:, 0])), 0.1, 3)).reshape(-1, 1)
    R = jnp.asarray(0.1).reshape(1, 1)

    def ell(log_ell, engine):
        k = Matern32(variance=1.0, lengthscales=jnp.exp(log_ell))
        ssm = k.get_ssm(t, R)
        return pkf(ssm, y, True, engine=engine)[2]

    g_gen = jax.grad(lambda u: ell(u, "generic"))(jnp.asarray(-0.7))
    g_tl = jax.grad(lambda u: ell(u, "timelast"))(jnp.asarray(-0.7))
    npt.assert_allclose(g_tl, g_gen, rtol=1e-8)


def test_vmap_over_batch():
    kernel = Matern32(variance=1.0, lengthscales=0.5)
    rng = np.random.RandomState(5)
    T, B = 96, 4
    t = np.sort(rng.rand(T))
    ys = jnp.asarray(sinu(t)[None] + 0.3 * rng.randn(B, T))[..., None]
    ssm = kernel.get_ssm(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    ells_tl = jax.vmap(lambda y: pkf(ssm, y, True, engine="timelast")[2])(ys)
    ells_g = jax.vmap(lambda y: pkf(ssm, y, True, engine="generic")[2])(ys)
    npt.assert_allclose(ells_tl, ells_g, rtol=1e-9)


def test_two_level_scan_matches_flat():
    """kogge_stone_scan_tl switches to the two-level (blocked) scheme at
    large T; it must agree with the flat Kogge-Stone bit-for-bit-ish."""
    from parallel_gps_tpu.kalman.timelast import (
        _filtering_elements_from_planes,
        _kogge_stone_flat_tl,
        filtering_identity_tl,
        filtering_operator_tl,
        kogge_stone_scan_tl,
    )

    T = 9001  # above the blocked threshold, not a power of two
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, 1)
    y[rng.choice(T, T // 10, replace=False)] = np.nan
    ys = jnp.asarray(y).reshape(-1, 1)
    ssm = Matern32(1.0, 0.5).get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    e = _filtering_elements_from_planes(
        ssm.P0, ssm.Fs, ssm.Qs, ssm.H, ssm.R, ys
    )
    ident = filtering_identity_tl(2, ssm.P0.dtype)
    flat = _kogge_stone_flat_tl(filtering_operator_tl, e, ident)
    two = kogge_stone_scan_tl(filtering_operator_tl, e, ident)
    npt.assert_allclose(two.b, flat.b, rtol=1e-9, atol=1e-11)
    npt.assert_allclose(two.C, flat.C, rtol=1e-9, atol=1e-11)


def test_two_level_scan_reverse_smoother_matches_flat():
    from parallel_gps_tpu.kalman.timelast import (
        pkf_from_tl,
        _smoothing_elements_from_planes,
        _kogge_stone_flat_tl,
        kogge_stone_scan_tl,
        smoothing_identity_tl,
        smoothing_operator_tl,
    )

    T = 8501
    rng = np.random.RandomState(3)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, 3)
    ys = jnp.asarray(y).reshape(-1, 1)
    ssm = Matern32(1.0, 0.5).get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    b, C = pkf_from_tl(ssm, ys)
    e = _smoothing_elements_from_planes(ssm.Fs, ssm.Qs, b, C)
    ident = smoothing_identity_tl(2, ssm.P0.dtype)
    flat = _kogge_stone_flat_tl(smoothing_operator_tl, e, ident, reverse=True)
    two = kogge_stone_scan_tl(smoothing_operator_tl, e, ident, reverse=True)
    npt.assert_allclose(two.g, flat.g, rtol=1e-8, atol=1e-10)
    npt.assert_allclose(two.L, flat.L, rtol=1e-8, atol=1e-10)
