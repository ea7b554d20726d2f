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


def test_pkfs_dt_end_to_end():
    from parallel_gps_tpu.kalman.timelast import pkfs_from_tl

    kernel = Matern52(0.9, 0.45)
    ts, R, ssm, ys = _setup(kernel, 287, seed=3)
    sms_x, sPs_x = pkfs_from_tl(ssm, ys)  # (T, d) / (T, d, d)
    g_s, L_s = pkfs_dt(kernel, ts, R, ys, block=32, interpret=True)
    npt.assert_allclose(jnp.moveaxis(g_s, -1, 0), sms_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(jnp.moveaxis(L_s, -1, 0), sPs_x, rtol=1e-8, atol=1e-9)
