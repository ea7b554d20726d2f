"""Batched-sublane Pallas kernels (batch on sublanes × time on lanes) and
their custom_vmap wiring.

Round-1's fused kernels were single-series: vmapping a model that traced
with them failed at Mosaic lowering, so batched MCMC required
``config.set_pallas_lml(False)`` (VERDICT.md item 5).  The batched kernels
(kalman/pallas_scan.py: ``batched_strip_filter``/``batched_strip_smoother``)
run 8 series per sublane group in a single pass each; the custom_vmap rules
on ``strip_filter_op``/``strip_smoother_op`` dispatch to them under vmap.

Interpret-mode note: kernel bodies unroll log2(block) combine rounds, and
XLA:CPU's interpret-mode cost grows superlinearly with the unrolled body —
hence tiny blocks and ONE shared kernel evaluation for all assertions here.
The TPU path runs the same wrappers at production block sizes (validated
against CPU references on the real chip; see BASELINE.md batch rows).
"""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from parallel_gps_tpu.kalman.pallas_scan import (
    batched_strip_filter,
    batched_strip_smoother,
    strip_filter_op,
    strip_smoother_op,
)
from parallel_gps_tpu.kalman.timelast import pkf_from_tl, pks_from_tl
from parallel_gps_tpu.kernels import Matern32

B, T = 12, 40  # >8 series: two sublane groups (exercises the per-group carry reset)
BLOCK = 16


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)) * 4.0
    ssms, yss = [], []
    for i in range(B):
        k = Matern32(variance=0.5 + i * 0.3, lengthscales=0.2 + 0.1 * i)
        R = jnp.asarray(0.1 + 0.02 * i).reshape(1, 1)
        ssms.append(k.get_ssm_tl(jnp.asarray(t).reshape(-1, 1), R))
        y = np.sin(7 * t) + 0.1 * rng.randn(T)
        y[rng.rand(T) < 0.15] = np.nan  # missing observations
        yss.append(y)
    refs = []
    for i in range(B):
        ys = jnp.asarray(yss[i].reshape(-1, 1))
        b_ref, C_ref, ell_ref = pkf_from_tl(ssms[i], ys, True)
        g_ref, L_ref = pks_from_tl(ssms[i], b_ref, C_ref)
        refs.append((b_ref, C_ref, ell_ref, g_ref, L_ref))
    return ssms, yss, refs


def test_batched_kernels_and_custom_vmap(batch):
    ssms, yss, refs = batch
    Fs_bt = jnp.stack([s.Fs for s in ssms], axis=2)  # (d, d, B, T)
    Qs_bt = jnp.stack([s.Qs for s in ssms], axis=2)
    P0_b = jnp.stack([s.P0 for s in ssms])
    H_b = jnp.stack([s.H for s in ssms])
    R_b = jnp.stack([s.R for s in ssms])
    ys_b = jnp.asarray(np.stack(yss))

    b_bt, C_bt, ell_b = batched_strip_filter(
        Fs_bt, Qs_bt, P0_b, H_b, R_b, ys_b, block=BLOCK, interpret=True
    )
    g_bt, L_bt, mean_bt, var_bt = batched_strip_smoother(
        Fs_bt, Qs_bt, b_bt, C_bt, H_b, block=BLOCK, interpret=True
    )
    for i, (b_ref, C_ref, ell_ref, g_ref, L_ref) in enumerate(refs):
        npt.assert_allclose(b_bt[:, i], b_ref, rtol=1e-9, atol=1e-11)
        npt.assert_allclose(C_bt[:, :, i], C_ref, rtol=1e-9, atol=1e-11)
        npt.assert_allclose(ell_b[i], ell_ref, rtol=1e-10)
        npt.assert_allclose(g_bt[:, i], g_ref, rtol=1e-8, atol=1e-10)
        npt.assert_allclose(L_bt[:, :, i], L_ref, rtol=1e-8, atol=1e-10)
        h = np.asarray(ssms[i].H[0])
        npt.assert_allclose(
            mean_bt[i], np.einsum("a,at->t", h, np.asarray(g_ref)), rtol=1e-8
        )
        npt.assert_allclose(
            var_bt[i],
            np.einsum("a,abt,b->t", h, np.asarray(L_ref), h),
            rtol=1e-8,
        )


def test_custom_vmap_dispatches_to_batched_kernels(batch):
    # vmap of the single-series ops must match per-series references (the
    # rule broadcasts unbatched operands — here every series shares ys[0],
    # so compare against fresh references computed on that series).
    ssms, yss, _ = batch
    y0 = jnp.asarray(yss[0].reshape(-1, 1))
    Fs_b = jnp.stack([s.Fs for s in ssms])  # (B, d, d, T): vmap axis 0
    Qs_b = jnp.stack([s.Qs for s in ssms])
    P0_b = jnp.stack([s.P0 for s in ssms])
    H_b = jnp.stack([s.H for s in ssms])
    R_b = jnp.stack([s.R for s in ssms])

    op = strip_filter_op(BLOCK, True)
    b_v, C_v, ell_v = jax.vmap(op, in_axes=(0, 0, 0, 0, 0, None))(
        Fs_b, Qs_b, P0_b, H_b, R_b, y0
    )
    g_v, L_v = jax.vmap(strip_smoother_op(BLOCK, True))(Fs_b, Qs_b, b_v, C_v)
    for i in range(B):
        b_ref, C_ref, ell_ref = pkf_from_tl(ssms[i], y0, True)
        npt.assert_allclose(b_v[i], b_ref, rtol=1e-9, atol=1e-11)
        npt.assert_allclose(C_v[i], C_ref, rtol=1e-9, atol=1e-11)
        npt.assert_allclose(ell_v[i], ell_ref, rtol=1e-10)
        g_ref, L_ref = pks_from_tl(ssms[i], b_ref, C_ref)
        npt.assert_allclose(g_v[i], g_ref, rtol=1e-8, atol=1e-10)
        npt.assert_allclose(L_v[i], L_ref, rtol=1e-8, atol=1e-10)


def test_batched_kernels_chunked_scan(batch):
    """Chunked in-block scan parity for the BATCHED kernels: shrink the
    one-vreg chunk to 8 lanes so BLOCK=16 scans as 2 chunks with a carried
    prefix (the production chunk=128 never activates at interpret-scale
    blocks)."""
    from parallel_gps_tpu.kalman import pallas_scan

    ssms, yss, refs = batch
    Fs_bt = jnp.stack([s.Fs for s in ssms], axis=2)
    Qs_bt = jnp.stack([s.Qs for s in ssms], axis=2)
    P0_b = jnp.stack([s.P0 for s in ssms])
    H_b = jnp.stack([s.H for s in ssms])
    R_b = jnp.stack([s.R for s in ssms])
    ys_b = jnp.asarray(np.stack(yss))

    old = pallas_scan._SCAN_CHUNK
    pallas_scan._SCAN_CHUNK = 8
    try:
        b_bt, C_bt, ell_b = batched_strip_filter(
            Fs_bt, Qs_bt, P0_b, H_b, R_b, ys_b, block=BLOCK, interpret=True
        )
        g_bt, L_bt, _, _ = batched_strip_smoother(
            Fs_bt, Qs_bt, b_bt, C_bt, H_b, block=BLOCK, interpret=True
        )
    finally:
        pallas_scan._SCAN_CHUNK = old
    for i, (b_ref, C_ref, ell_ref, g_ref, L_ref) in enumerate(refs):
        npt.assert_allclose(b_bt[:, i], b_ref, rtol=1e-9, atol=1e-11)
        npt.assert_allclose(C_bt[:, :, i], C_ref, rtol=1e-9, atol=1e-11)
        npt.assert_allclose(ell_b[i], ell_ref, rtol=1e-10)
        npt.assert_allclose(g_bt[:, i], g_ref, rtol=1e-8, atol=1e-10)
        npt.assert_allclose(L_bt[:, :, i], L_ref, rtol=1e-8, atol=1e-10)
