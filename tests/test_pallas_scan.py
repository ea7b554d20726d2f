"""Fused Pallas scan kernels == XLA time-last engine (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from parallel_gps_tpu.kalman.timelast import (
    pkf_pallas,
    pkf_tl,
    pkfs_tl,
    pks_pallas,
)
from parallel_gps_tpu.kernels import Matern32, Matern52
from parallel_gps_tpu.toymodels import obs_noise, sinu


def _setup(kernel, T, seed=0, with_nans=True):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, seed)
    if with_nans:
        y[rng.choice(T, T // 9, replace=False)] = np.nan
    ssm = kernel.get_ssm(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    return ssm, jnp.asarray(y).reshape(-1, 1)


@pytest.mark.parametrize(
    "kernel,T",
    [(Matern32(1.0, 0.5), 200), (Matern52(0.8, 0.4), 130)],
    ids=["m32_T200", "m52_T130"],
)
def test_pallas_filter_matches_tl(kernel, T):
    ssm, ys = _setup(kernel, T)
    fms_x, fPs_x, ell_x = pkf_tl(ssm, ys, True)
    fms_p, fPs_p, ell_p = pkf_pallas(
        ssm, ys, True, block=64, interpret=True
    )
    npt.assert_allclose(fms_p, fms_x, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(fPs_p, fPs_x, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(ell_p, ell_x, rtol=1e-10)


def test_pallas_smoother_matches_tl():
    kernel = Matern32(1.0, 0.5)
    ssm, ys = _setup(kernel, 150, seed=3)
    sms_x, sPs_x = pkfs_tl(ssm, ys)
    fms, fPs = pkf_pallas(ssm, ys, block=64, interpret=True)
    sms_p, sPs_p = pks_pallas(ssm, fms, fPs, block=64, interpret=True)
    npt.assert_allclose(sms_p, sms_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(sPs_p, sPs_x, rtol=1e-8, atol=1e-9)


# --------------------------------------------------------------------------
# Strip-layout engine (the production pallas path; full sublane utilization)
# --------------------------------------------------------------------------

from parallel_gps_tpu.kalman.pallas_scan import (  # noqa: E402
    strip_filter,
    strip_smoother,
)
from parallel_gps_tpu.kalman.timelast import (  # noqa: E402
    pkf_from_tl,
    pks_from_tl,
)


@pytest.mark.parametrize(
    "kernel,T",
    # T values force strip padding and multiple blocks per strip at block=32
    [(Matern32(1.0, 0.5), 517), (Matern52(0.8, 0.4), 279)],
    ids=["m32_T517", "m52_T279"],
)
def test_strip_filter_matches_tl(kernel, T):
    rng = np.random.RandomState(7)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, 7)
    y[rng.choice(T, T // 9, replace=False)] = np.nan
    ys = jnp.asarray(y).reshape(-1, 1)
    ssm = kernel.get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    b_x, C_x, ell_x = pkf_from_tl(ssm, ys, True)
    b_s, C_s, ell_s = strip_filter(
        ssm.Fs, ssm.Qs, ssm.P0, ssm.H, ssm.R, ys, block=32, interpret=True
    )
    npt.assert_allclose(b_s, b_x, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(C_s, C_x, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(float(ell_s), float(ell_x), rtol=1e-10)


def test_strip_smoother_matches_tl():
    kernel = Matern32(1.0, 0.5)
    T = 413
    rng = np.random.RandomState(11)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, 11)
    ys = jnp.asarray(y).reshape(-1, 1)
    ssm = kernel.get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    b_x, C_x = pkf_from_tl(ssm, ys)
    g_x, L_x = pks_from_tl(ssm, b_x, C_x)
    g_s, L_s = strip_smoother(ssm.Fs, ssm.Qs, b_x, C_x, block=32, interpret=True)
    npt.assert_allclose(g_s, g_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(L_s, L_x, rtol=1e-8, atol=1e-9)


def test_strip_engine_matches_tl_d4():
    """d > 3 fused path end-to-end (Schur-recursed in-kernel inverses):
    RBF order 4 through the strip filter + smoother vs the XLA TL engine.
    Tiny T/block: CPU interpret cost grows superlinearly with the unrolled
    body size (CLAUDE.md), and the d=4 body is ~4x the d=3 one."""
    from parallel_gps_tpu.kernels import RBF

    T = 37
    rng = np.random.RandomState(5)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, 5)
    y[rng.choice(T, 4, replace=False)] = np.nan
    ys = jnp.asarray(y).reshape(-1, 1)
    kernel = RBF(variance=1.0, lengthscales=0.3, order=4, balancing_iter=5)
    ssm = kernel.get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    b_x, C_x, ell_x = pkf_from_tl(ssm, ys, True)
    b_s, C_s, ell_s = strip_filter(
        ssm.Fs, ssm.Qs, ssm.P0, ssm.H, ssm.R, ys, block=8, interpret=True
    )
    npt.assert_allclose(b_s, b_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(C_s, C_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(float(ell_s), float(ell_x), rtol=1e-9)

    g_x, L_x = pks_from_tl(ssm, b_x, C_x)
    g_s, L_s = strip_smoother(ssm.Fs, ssm.Qs, b_x, C_x, block=8, interpret=True)
    npt.assert_allclose(g_s, g_x, rtol=1e-7, atol=1e-8)
    npt.assert_allclose(L_s, L_x, rtol=1e-7, atol=1e-8)


def test_strip_chunked_scan_matches_tl(monkeypatch):
    """The chunked in-block scan (sequential one-vreg chunk scans with a
    carried prefix instead of full-block Kogge-Stone) reassociates but must
    not change the math.  Production chunk=128 never activates at the tiny
    interpret-mode blocks, so shrink it to 8 — block=32 then scans 4 chunks
    per block, exercising the carry chain end-to-end (filter + smoother)."""
    from parallel_gps_tpu.kalman import pallas_scan

    monkeypatch.setattr(pallas_scan, "_SCAN_CHUNK", 8)
    kernel = Matern52(0.8, 0.4)
    T = 301  # pad + multiple blocks per strip at block=32
    rng = np.random.RandomState(13)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, 13)
    y[rng.choice(T, T // 9, replace=False)] = np.nan
    ys = jnp.asarray(y).reshape(-1, 1)
    ssm = kernel.get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    b_x, C_x, ell_x = pkf_from_tl(ssm, ys, True)
    b_s, C_s, ell_s = strip_filter(
        ssm.Fs, ssm.Qs, ssm.P0, ssm.H, ssm.R, ys, block=32, interpret=True
    )
    npt.assert_allclose(b_s, b_x, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(C_s, C_x, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(float(ell_s), float(ell_x), rtol=1e-10)

    g_x, L_x = pks_from_tl(ssm, b_x, C_x)
    g_s, L_s = strip_smoother(ssm.Fs, ssm.Qs, b_x, C_x, block=32, interpret=True)
    npt.assert_allclose(g_s, g_x, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(L_s, L_x, rtol=1e-8, atol=1e-9)


def test_list_schur_inverse_matches_numpy():
    """The row-list Schur-complement inverse (pallas_scan._inv for d > 3,
    used by the fused kernels for high-order kernels) against numpy, f64.
    The kernel plumbing around it is d-generic and pinned at d <= 3; the
    inverse is the only d > 3-specific algebra."""
    import numpy.linalg as la

    from parallel_gps_tpu.kalman.pallas_scan import _inv as list_inv

    rng = np.random.RandomState(0)
    for d in (4, 5, 6, 8):
        # Well-conditioned test matrices of the I + PSD·PSD combine family.
        A = rng.randn(d, d)
        M = np.eye(d) + 0.3 * (A @ A.T)
        rows = [[jnp.asarray(M[i, j]).reshape(1, 1) for j in range(d)] for i in range(d)]
        inv_rows = list_inv(rows, d)
        got = np.array(
            [[float(inv_rows[i][j].reshape(())) for j in range(d)] for i in range(d)]
        )
        npt.assert_allclose(got, la.inv(M), rtol=1e-9, atol=1e-11)


def test_sharded_onechip_matches_full():
    """The one-device executors of the sharded per-shard programs
    (strip_{filter,smoother}_sharded_onechip — the real-hardware probe of
    the pod kernel path, VERDICT r3 item 8) against the single-scan fused
    engine, nontrivial cross-shard prefixes included.  Interpret mode,
    tiny blocks (CLAUDE.md CPU-interpret cost)."""
    from parallel_gps_tpu.kalman.pallas_scan import (
        strip_filter,
        strip_filter_sharded_onechip,
        strip_smoother,
        strip_smoother_sharded_onechip,
    )
    from parallel_gps_tpu.kernels import Matern32

    kernel = Matern32(1.1, 0.4)
    rng = np.random.RandomState(3)
    T = 384  # 2 shards x 192 (unaligned per shard: exercises pack padding)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, 3)
    y[rng.choice(T, T // 7, replace=False)] = np.nan
    ssm = kernel.get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    ys = jnp.asarray(y).reshape(-1, 1)
    b0, C0, ell0 = strip_filter(
        ssm.Fs, ssm.Qs, ssm.P0, ssm.H, ssm.R, ys, block=16, interpret=True
    )
    b1, C1, ell1 = strip_filter_sharded_onechip(
        ssm.Fs, ssm.Qs, ssm.P0, ssm.H, ssm.R, ys, 2, block=16, interpret=True
    )
    npt.assert_allclose(b1, b0, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(C1, C0, rtol=1e-9, atol=1e-10)
    npt.assert_allclose(float(ell1), float(ell0), rtol=1e-10)

    g0, L0 = strip_smoother(ssm.Fs, ssm.Qs, b0, C0, block=16, interpret=True)
    g1, L1 = strip_smoother_sharded_onechip(
        ssm.Fs, ssm.Qs, b0, C0, 2, block=16, interpret=True
    )
    npt.assert_allclose(g1, g0, rtol=1e-8, atol=1e-9)
    npt.assert_allclose(L1, L0, rtol=1e-8, atol=1e-9)
