"""dt-engine (fused discretization) == XLA time-last engine, interpret mode.

The dt kernels rebuild F/Q in registers from the dt plane + SMEM transition
coefficients, using the identical cancellation-free algebra as ops/disc.py,
so moments/LML must match the plane pipeline to reassociation roundoff
(exact in f64 up to ordering).  Tiny blocks: CPU interpret cost explodes
with the unrolled body size (CLAUDE.md).
"""
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from parallel_gps_tpu.kalman.pallas_dt import (
    _dts_from_ts,
    pkfs_dt,
    strip_filter_dt,
    strip_smoother_dt,
)
from parallel_gps_tpu.kalman.timelast import pkf_from_tl, pks_from_tl
from parallel_gps_tpu.kernels import Matern12, Matern32, Matern52
from parallel_gps_tpu.toymodels import obs_noise, sinu


def _setup(kernel, T, seed=7):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, seed)
    y[rng.choice(T, T // 9, replace=False)] = np.nan
    ts = jnp.asarray(t).reshape(-1, 1)
    R = jnp.asarray(0.1).reshape(1, 1)
    ssm = kernel.get_ssm_tl(ts, R)
    return ts, R, ssm, jnp.asarray(y).reshape(-1, 1)


def test_transition_coeffs_match_transitions_m1_tl():
    """build(c, dt) == transitions_m1_tl(dt) entrywise for all Materns."""
    dts = jnp.asarray(np.random.RandomState(0).rand(37) * 0.1)
    for kern in [Matern12(1.3, 0.7), Matern32(1.1, 0.5), Matern52(0.8, 0.4)]:
        coeffs, build = kern.transition_coeffs()
        rows = build(list(coeffs), dts)
        ref = kern.transitions_m1_tl(dts)
        d = kern.state_dim
        for i in range(d):
            for j in range(d):
                npt.assert_allclose(
                    rows[i][j], ref[i, j], rtol=1e-12, atol=1e-14,
                    err_msg=f"{type(kern).__name__}[{i},{j}]",
                )


@pytest.mark.parametrize(
    "kernel,T",
    # T values force strip padding and multiple blocks per strip at block=32
    [
        (Matern12(1.2, 0.6), 301),
        (Matern32(1.0, 0.5), 517),
        (Matern52(0.8, 0.4), 279),
    ],
    ids=["m12_T301", "m32_T517", "m52_T279"],
)
def test_dt_filter_matches_tl(kernel, T):
    ts, R, ssm, ys = _setup(kernel, T)
    b_x, C_x, ell_x = pkf_from_tl(ssm, ys, True)
    coeffs, build = kernel.transition_coeffs()
    dts = _dts_from_ts(ts).astype(ssm.P0.dtype)
    b_s, C_s, ell_s = strip_filter_dt(
        build, coeffs, ssm.P0, ssm.H, ssm.R, dts, ys, block=32,
        interpret=True,
    )
    npt.assert_allclose(b_s, b_x, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(C_s, C_x, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(float(ell_s), float(ell_x), rtol=1e-10)


def test_dt_smoother_matches_tl():
    kernel = Matern32(1.0, 0.5)
    ts, R, ssm, ys = _setup(kernel, 413, seed=11)
    b_x, C_x = pkf_from_tl(ssm, ys)
    g_x, L_x = pks_from_tl(ssm, b_x, C_x)
    coeffs, build = kernel.transition_coeffs()
    dts = _dts_from_ts(ts).astype(ssm.P0.dtype)
    g_s, L_s = strip_smoother_dt(
        build, coeffs, ssm.P0, dts, b_x, C_x, block=32, interpret=True
    )
    npt.assert_allclose(g_s, g_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(L_s, L_x, rtol=1e-8, atol=1e-9)


def _composites():
    from parallel_gps_tpu.kernels import Periodic

    return [
        ("sum_m32_m12", Matern32(1.1, 0.5) + Matern12(0.8, 0.3)),
        ("prod_m32_m32", Matern32(1.2, 0.6) * Matern32(0.9, 0.4)),
        ("periodic2", Periodic(1.3, 0.8, period=0.7, order=2)),
        (
            "quasiperiodic",
            Periodic(1.0, 1.0, period=0.5, order=1) * Matern12(1.0, 0.7),
        ),
        (
            "co2_shape",
            Periodic(1.0, 1.0, period=0.5, order=1) * Matern32(0.5, 0.8)
            + Matern32(1.0, 1.5),
        ),
    ]


@pytest.mark.parametrize(
    "name,kern", _composites(), ids=[n for n, _ in _composites()]
)
def test_composite_build_planes_match_get_ssm_tl(name, kern):
    """build_planes_tl(transition_coeffs) == get_ssm_tl planes entrywise —
    the full dt-engine F/Q reconstruction contract for Sum/Product/Periodic
    composites (structural-zero Am1 entries included), in plain XLA."""
    from parallel_gps_tpu.kalman.pallas_dt import (
        _dts_from_ts,
        build_planes_tl,
    )

    rng = np.random.RandomState(2)
    ts = jnp.asarray(np.sort(rng.rand(64))).reshape(-1, 1)
    R = jnp.asarray(0.05).reshape(1, 1)
    ssm = kern.get_ssm_tl(ts, R)
    coeffs, build = kern.transition_coeffs()
    dts = _dts_from_ts(ts).astype(ssm.P0.dtype)
    Fs, Qs, P0s = build_planes_tl(build, coeffs, ssm.P0, dts)
    npt.assert_allclose(Fs, ssm.Fs, rtol=1e-11, atol=1e-13)
    npt.assert_allclose(Qs, ssm.Qs, rtol=1e-11, atol=1e-13)
    npt.assert_allclose(P0s, ssm.P0, rtol=1e-12, atol=1e-14)


def test_composite_dt_filter_matches_tl():
    """End-to-end interpret-mode dt filter on a composite (Product, d=4)."""
    kern = Matern32(1.2, 0.6) * Matern12(0.9, 0.4)
    ts, R, ssm, ys = _setup(kern, 277, seed=13)
    b_x, C_x, ell_x = pkf_from_tl(ssm, ys, True)
    coeffs, build = kern.transition_coeffs()
    dts = _dts_from_ts(ts).astype(ssm.P0.dtype)
    b_s, C_s, ell_s = strip_filter_dt(
        build, coeffs, ssm.P0, ssm.H, ssm.R, dts, ys, block=16,
        interpret=True,
    )
    npt.assert_allclose(b_s, b_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(C_s, C_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(float(ell_s), float(ell_x), rtol=1e-9)


def test_composite_lml_dt_grads():
    """Fisher-VJP grads through a Sum's transition_coeffs (balance-scale
    chain rule included) vs autodiff of the XLA engine."""
    import jax

    from parallel_gps_tpu.kalman.pallas_dt import lml_dt
    from parallel_gps_tpu.kalman.timelast import lml_tl

    ts, R, _, ys = _setup(Matern32(1.0, 0.5) + Matern12(1.0, 0.5), 149, seed=4)

    def via_dt(p):
        kern = Matern32(p[0], p[1]) + Matern12(p[2], p[3])
        return lml_dt(kern, ts, p[4].reshape(1, 1), ys, block=8,
                      interpret=True)

    def via_xla(p):
        kern = Matern32(p[0], p[1]) + Matern12(p[2], p[3])
        return lml_tl(kern.get_ssm_tl(ts, p[4].reshape(1, 1)), ys, False)

    p0 = jnp.asarray([1.1, 0.5, 0.9, 0.35, 0.1], jnp.float64)
    v_dt, g_dt = jax.value_and_grad(via_dt)(p0)
    v_x, g_x = jax.value_and_grad(via_xla)(p0)
    npt.assert_allclose(float(v_dt), float(v_x), rtol=1e-10)
    npt.assert_allclose(g_dt, g_x, rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize(
    "kernel",
    [Matern12(1.2, 0.6), Matern32(1.1, 0.45), Matern52(0.9, 0.5)],
    ids=["m12", "m32", "m52"],
)
def test_lml_dt_grads_match_autodiff(kernel):
    """d(lml_dt)/d(hypers, R) — dt-engine Fisher VJP (interpret mode) vs
    end-to-end autodiff of the XLA time-last engine THROUGH get_ssm_tl:
    same value, same gradients, f64."""
    import jax

    from parallel_gps_tpu.kalman.pallas_dt import lml_dt
    from parallel_gps_tpu.kalman.timelast import lml_tl

    ts, R, _, ys = _setup(type(kernel)(1.0, 1.0), 173, seed=5)

    def via_dt(p):
        kern = type(kernel)(variance=p[0], lengthscales=p[1])
        return lml_dt(kern, ts, p[2].reshape(1, 1), ys, block=16,
                      interpret=True)

    def via_xla(p):
        kern = type(kernel)(variance=p[0], lengthscales=p[1])
        ssm = kern.get_ssm_tl(ts, p[2].reshape(1, 1))
        return lml_tl(ssm, ys, False)

    p0 = jnp.asarray(
        [kernel.variance, kernel.lengthscales, 0.1], jnp.float64
    )
    v_dt, g_dt = jax.value_and_grad(via_dt)(p0)
    v_x, g_x = jax.value_and_grad(via_xla)(p0)
    npt.assert_allclose(float(v_dt), float(v_x), rtol=1e-10)
    npt.assert_allclose(g_dt, g_x, rtol=1e-7, atol=1e-10)


def test_lml_dt_grad_wrt_observations():
    import jax

    from parallel_gps_tpu.kalman.pallas_dt import lml_dt
    from parallel_gps_tpu.kalman.timelast import lml_tl

    kernel = Matern32(1.0, 0.5)
    ts, R, ssm, ys = _setup(kernel, 157, seed=9)
    g_dt = jax.grad(
        lambda o: lml_dt(kernel, ts, R, o, block=16, interpret=True)
    )(ys)
    g_x = jax.grad(lambda o: lml_tl(ssm, o, False))(ys)
    npt.assert_allclose(g_dt, g_x, rtol=1e-8, atol=1e-12)


def test_pkfs_dt_end_to_end():
    from parallel_gps_tpu.kalman.timelast import pkfs_from_tl

    kernel = Matern52(0.9, 0.45)
    ts, R, ssm, ys = _setup(kernel, 287, seed=3)
    sms_x, sPs_x = pkfs_from_tl(ssm, ys)  # (T, d) / (T, d, d)
    g_s, L_s = pkfs_dt(kernel, ts, R, ys, block=32, interpret=True)
    npt.assert_allclose(jnp.moveaxis(g_s, -1, 0), sms_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(jnp.moveaxis(L_s, -1, 0), sPs_x, rtol=1e-8, atol=1e-9)


def test_rbf_dt_filter_matches_tl():
    """End-to-end interpret-mode dt filter for RBF (spectral
    transition_coeffs, VERDICT r4 item 3) vs the XLA time-last engine."""
    from parallel_gps_tpu.kernels import RBF

    kern = RBF(1.1, 0.5, order=3)
    ts, R, ssm, ys = _setup(kern, 277, seed=21)
    b_x, C_x, ell_x = pkf_from_tl(ssm, ys, True)
    coeffs, build = kern.transition_coeffs()
    dts = _dts_from_ts(ts).astype(ssm.P0.dtype)
    b_s, C_s, ell_s = strip_filter_dt(
        build, coeffs, ssm.P0, ssm.H, ssm.R, dts, ys, block=16,
        interpret=True,
    )
    npt.assert_allclose(b_s, b_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(C_s, C_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(float(ell_s), float(ell_x), rtol=1e-9)


def test_rbf_lml_dt_grads_match_autodiff():
    """Fisher-VJP grads through RBF's spectral transition_coeffs (in-graph
    lengthscale scaling + stop-gradiented balance, as in get_sde) vs
    autodiff of the XLA engine."""
    import jax

    from parallel_gps_tpu.kalman.pallas_dt import lml_dt
    from parallel_gps_tpu.kalman.timelast import lml_tl
    from parallel_gps_tpu.kernels import RBF

    ts, R, _, ys = _setup(RBF(1.0, 0.5, order=3), 157, seed=6)

    def via_dt(p):
        kern = RBF(variance=p[0], lengthscales=p[1], order=3)
        return lml_dt(kern, ts, p[2].reshape(1, 1), ys, block=16,
                      interpret=True)

    def via_xla(p):
        kern = RBF(variance=p[0], lengthscales=p[1], order=3)
        return lml_tl(kern.get_ssm_tl(ts, p[2].reshape(1, 1)), ys, False)

    p0 = jnp.asarray([1.2, 0.45, 0.1], jnp.float64)
    v_dt, g_dt = jax.value_and_grad(via_dt)(p0)
    v_x, g_x = jax.value_and_grad(via_xla)(p0)
    npt.assert_allclose(float(v_dt), float(v_x), rtol=1e-10)
    npt.assert_allclose(g_dt, g_x, rtol=1e-7, atol=1e-10)


def test_lml_dt_vmapped_grads_match_autodiff():
    """vmap(value_and_grad(lml_dt)) over a parameter batch — the fused
    Fisher-tail kernel's custom_vmap falls back to the XLA tail (the raw
    pallas carry logic does not survive the Pallas batching rule), so
    batched MCMC chains keep exact gradients."""
    import jax

    from parallel_gps_tpu.kalman.pallas_dt import lml_dt
    from parallel_gps_tpu.kalman.timelast import lml_tl

    ts, R, _, ys = _setup(Matern32(1.0, 0.5), 149, seed=8)

    def via_dt(p):
        return lml_dt(Matern32(p[0], p[1]), ts, p[2].reshape(1, 1), ys,
                      block=16, interpret=True)

    def via_xla(p):
        kern = Matern32(p[0], p[1])
        return lml_tl(kern.get_ssm_tl(ts, p[2].reshape(1, 1)), ys, False)

    ps = jnp.asarray(
        [[1.1, 0.5, 0.1], [0.7, 0.9, 0.2], [1.4, 0.3, 0.05]], jnp.float64
    )
    v_dt, g_dt = jax.vmap(jax.value_and_grad(via_dt))(ps)
    v_x, g_x = jax.vmap(jax.value_and_grad(via_xla))(ps)
    npt.assert_allclose(v_dt, v_x, rtol=1e-10)
    npt.assert_allclose(g_dt, g_x, rtol=1e-7, atol=1e-10)
