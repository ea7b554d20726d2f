"""Fused-discretization ("dt-engine") strip kernels.

The plane-streaming strip engine (kalman/pallas_scan.py) reads per-step
transition/noise planes F, Q (2d² lanes planes) from HBM in BOTH kernel
passes — 20 input planes per filter pass at d=3, 30 per smoother pass —
while the round-4 attribution (results/r4_attrib.json) shows the kernels
sit well above the measured-bandwidth traffic floor.  For kernels whose
transitions have elementwise closed forms (the Matérn family — exponential
polynomials; see SDEKernel.transition_coeffs), the planes never need to
exist: these kernels rebuild, per (8, block) register tile,

    Am1 = expm(dt·F) − I            from the dt plane + SMEM coefficients,
    F   = I + Am1,
    Q   = P∞ − A P∞ Aᵀ = −(M + Mᵀ + M·Am1ᵀ),  M = Am1·P∞,

which is EXACTLY the cancellation-free discretization of ops/disc.py:90-106
(reference discretization: pssgp/kernels/base.py:29-47), so results match
the plane engine to f32 reassociation roundoff.  Filter passes then read
3 input planes (dt, y, mask) instead of 20; smoother passes 13 instead of
30 — and the (d, d, T) SSM materialization disappears from the pipeline
entirely (a further 18-plane write+read per training step).

Kernel structure (pass 1 totals → tiny exclusive prefixes → pass 2 seeded
re-scan, streaming likelihood, cross-strip/shard boundary handling) mirrors
pallas_scan.py; shared algebra is imported from there.  Forward-only, like
every Pallas path (gradients ride the XLA time-last engine).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import Array

from parallel_gps_tpu.kalman.pallas_scan import (
    N_STRIPS,
    _build_filtering_rows,
    _build_smoothing_rows,
    _filt_combine_rows,
    _ident_rows_list,
    _inv,
    _mm,
    _mm_symout,
    _mt,
    _mv,
    _roll,
    _smooth_combine_rows,
    _strip_block_total,
    _strip_chunked_scan,
    _strip_exclusive_prefixes,
    _vsub,
    filt_rows,
    smooth_rows,
)


DT_DEFAULT_BLOCK = 512


def dt_strip_block(d: int, itemsize: int = 4) -> int:
    """Strip block for the dt-engine: the VMEM-heaviest pass (smoother
    pass 2) streams dt+b+C in (1 + d + d²) and g+L out (d + d²), with ~3
    live element-row copies in the in-kernel scan.  Default 512: the
    round-4 block sweep on hardware (results/grid_overhead.json, N=10M
    d=3) measured 512 fastest and monotone-worse through 2048 (lml_dt
    29.7/30.3/30.8 ms, pkfs_dt 44.8/47.3/48.3 ms) — per-grid-step
    overhead is negligible, so smaller working sets win slightly."""
    n = filt_rows(d)
    per_lane = (2 * (2 + d + d * d + n) + 3 * n) * N_STRIPS * itemsize
    block = 128
    from parallel_gps_tpu.kalman.pallas_scan import VMEM_BUDGET_BYTES

    while block < DT_DEFAULT_BLOCK and (block * 2) * per_lane <= VMEM_BUDGET_BYTES:
        block *= 2
    return block


def dt_strip_align(d: int, itemsize: int = 4) -> int:
    """Time-axis alignment at which the dt-engine's pack padding is a no-op
    (dt end-padding with 0 discretizes to exact identity elements)."""
    return N_STRIPS * dt_strip_block(d, itemsize)


def zmul(a, b):
    """None-as-structural-zero product (build contract: an Am1 entry may be
    None, meaning exactly zero — composite kernels' block/Kronecker sparsity
    then costs no vector ops in the unrolled kernel body)."""
    return None if a is None or b is None else a * b


def zsum(terms):
    """None-aware sum; None when every term is structurally zero."""
    live = [t for t in terms if t is not None]
    if not live:
        return None
    out = live[0]
    for t in live[1:]:
        out = out + t
    return out


def _build_fq_pure(c, P0v, dt, d, build):
    """Pure-array F/Q construction from coefficient scalars, stationary
    covariance scalars, and a dt tile (math = ops/disc.py:90-106).  ``build``
    may return None entries (structural zeros — Sum block-diagonals,
    Periodic's j=0 rotation plane); the sparse M/Q arithmetic skips them and
    the returned F/Q rows are dense arrays.  Kept free of Refs so the
    dt-native backward can ``jax.vjp`` through it in-kernel
    (_dt_fisher_kernel)."""
    Am1 = build(c, dt)
    zero = jnp.zeros_like(dt)
    F = [
        [
            (1.0 + Am1[i][j] if Am1[i][j] is not None else 1.0 + zero)
            if i == j
            else (Am1[i][j] if Am1[i][j] is not None else zero)
            for j in range(d)
        ]
        for i in range(d)
    ]
    M = [
        [
            zsum([zmul(Am1[i][k], P0v[k][j]) for k in range(d)])
            for j in range(d)
        ]
        for i in range(d)
    ]
    Q = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            s = zsum(
                [M[i][j], M[j][i]]
                + [zmul(M[i][k], Am1[j][k]) for k in range(d)]
            )
            v = zero if s is None else -s
            Q[i][j] = v
            Q[j][i] = v
    return F, Q


def _dt_build_fq(scal_ref, dt, d, build, coef_off, n_coef):
    """In-kernel F/Q row construction from a dt tile + SMEM coefficients
    (see _build_fq_pure; SMEM layout documented at each call site)."""
    c = [scal_ref[coef_off + k] for k in range(n_coef)]
    P0v = [[scal_ref[i * d + j] for j in range(d)] for i in range(d)]
    F, Q = _build_fq_pure(c, P0v, dt, d, build)
    return F, Q, P0v


# --------------------------------------------------------------------------
# Filter
# --------------------------------------------------------------------------


def _dt_filter_rows(scal_ref, dt_ref, y_ref, mask_ref, i, d, build, n_coef):
    """Filtering-element rows for this block's tile, F/Q built from dt.
    SMEM layout: [P0 (d²) | h (d) | r | first_flag | coeffs (n_coef)]."""
    d2 = d * d
    S, Lb = dt_ref.shape[1], dt_ref.shape[2]
    dt = dt_ref[0]
    F, Q, P0v = _dt_build_fq(scal_ref, dt, d, build, d2 + d + 2, n_coef)
    y = y_ref[0]
    mask = mask_ref[0]
    h = [scal_ref[d2 + k] for k in range(d)]
    r = scal_ref[d2 + d]

    first_here = jnp.logical_and(i == 0, scal_ref[d2 + d + 1] > 0.0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 1)
    is_first = jnp.logical_and(
        jnp.logical_and(sub == 0, lane == 0), jnp.full((S, Lb), first_here)
    )
    rows = _build_filtering_rows(F, Q, y, mask, h, r, P0v, is_first, d)
    return rows, (F, Q, y, mask, h, r, P0v, is_first)


def _dt_filter_scan_kernel(
    scal_ref, dt_ref, y_ref, mask_ref, totals_out, carry_ref, *, d, build,
    n_coef,
):
    """Pass 1: build elements from dt and fold each strip's block into the
    running per-strip totals (see pallas_scan._strip_filter_scan_kernel)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    n = filt_rows(d)
    dtype = dt_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.stack(
            _ident_rows_list(
                n, ident_rows, (dt_ref.shape[1], carry_ref.shape[2]), dtype
            ),
            axis=0,
        )

    rows, _ = _dt_filter_rows(scal_ref, dt_ref, y_ref, mask_ref, i, d, build, n_coef)
    init = [carry_ref[k, :, 0:1] for k in range(n)]
    edge = _strip_block_total(rows, _filt_combine_rows, d, False, init)
    carry_ref[:] = jnp.broadcast_to(jnp.stack(edge, axis=0), carry_ref.shape)
    totals_out[:] = carry_ref[:]


def _dt_filter_apply_kernel(
    scal_ref, pref_ref, dt_ref, y_ref, mask_ref, b_out, c_out, ell_out,
    carry_ref, acc_ref, *, d, build, n_coef,
):
    """Pass 2: rebuild elements from dt, re-scan with the strip prefix
    seeded, emit moments + streaming log-likelihood (see
    pallas_scan._strip_filter_apply_kernel — identical structure)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    nB = pl.num_programs(0)
    n = filt_rows(d)
    d2 = d * d
    S, Lb = dt_ref.shape[1], dt_ref.shape[2]
    dtype = dt_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    @pl.when(i == 0)
    def _():
        carry_ref[:] = pref_ref[:]
        acc_ref[0] = jnp.zeros((), dtype)

    rows, (F, Q, y, mask, h, r, P0v, is_first) = _dt_filter_rows(
        scal_ref, dt_ref, y_ref, mask_ref, i, d, build, n_coef
    )
    init = [carry_ref[k, :, 0:1] for k in range(n)]
    out_rows, edge = _strip_chunked_scan(
        rows, _filt_combine_rows, d, ident_rows, False, init
    )
    b_rows = out_rows[d2 : d2 + d]
    c_rows = out_rows[d2 + d : 2 * d2 + d]
    b_out[:] = jnp.stack(b_rows, axis=0)
    c_out[:] = jnp.stack(c_rows, axis=0)

    # Streaming log-likelihood — previous moments are a 1-lane shift with
    # the carry supplying lane 0 (pallas_scan.py pass-2 comments apply).
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 1)
    lane0 = lane == 0

    def prev_col(k):
        return jnp.broadcast_to(carry_ref[k, :, 0:1], (S, Lb))

    mprev = [
        jnp.where(lane0, prev_col(d2 + a), _roll(b_rows[a], 1, False))
        for a in range(d)
    ]
    Pprev = [
        [
            jnp.where(
                lane0,
                prev_col(d2 + d + a * d + c),
                _roll(c_rows[a * d + c], 1, False),
            )
            for c in range(d)
        ]
        for a in range(d)
    ]
    for a in range(d):
        mprev[a] = jnp.where(is_first, jnp.zeros_like(mprev[a]), mprev[a])
        for c in range(d):
            Pprev[a][c] = jnp.where(is_first, P0v[a][c], Pprev[a][c])

    hF = [sum(h[k] * F[k][j] for k in range(d)) for j in range(d)]
    mean = sum(hF[j] * mprev[j] for j in range(d))
    PhF = [sum(Pprev[j][k] * hF[k] for k in range(d)) for j in range(d)]
    hQ = [sum(h[k] * Q[k][j] for k in range(d)) for j in range(d)]
    var = (
        sum(hF[j] * PhF[j] for j in range(d))
        + sum(hQ[j] * h[j] for j in range(d))
        + r
    )
    diff = y - mean
    logp = -0.5 * (diff * diff / var + jnp.log(var) + math.log(2.0 * math.pi))
    acc_ref[0] = acc_ref[0] + jnp.sum(jnp.where(mask > 0, logp, 0.0))

    carry_ref[:] = jnp.broadcast_to(jnp.stack(edge, axis=0), carry_ref.shape)

    @pl.when(i == nB - 1)
    def _():
        ell_out[0] = acc_ref[0]


def _dt_filter_prep(dts, P0, H, R, observations, coeffs, block, first_flag):
    """Strip reshape + zero end-padding (dt = 0 discretizes to the exact
    identity element) + SMEM scalars."""
    d = P0.shape[0]
    d2 = d * d
    T = dts.shape[-1]
    dtype = P0.dtype
    S = N_STRIPS

    ys = observations.reshape(T)
    mask = jnp.logical_not(jnp.isnan(ys))
    y = jnp.where(mask, jnp.nan_to_num(ys), 0.0)
    maskf = mask.astype(dtype)

    W = -(-T // (S * block)) * block
    Tp = S * W

    def pad_end(x):
        if Tp == T:
            return x
        return jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (Tp - T,), dtype)], axis=-1
        )

    dt_st = pad_end(dts.reshape(1, T).astype(dtype)).reshape(1, S, W)
    y_st = pad_end(y[None].astype(dtype)).reshape(1, S, W)
    m_st = pad_end(maskf[None]).reshape(1, S, W)

    scal = jnp.concatenate(
        [
            P0.reshape(d2),
            H.reshape(-1)[:d].astype(dtype),
            R.reshape(1).astype(dtype),
            jnp.asarray(first_flag, dtype).reshape(1),
            coeffs.astype(dtype).reshape(-1),
        ]
    )
    return scal, dt_st, y_st, m_st, W, Tp


def _dt_filter_pass1(scal, dt_st, y_st, m_st, d, build, n_coef, block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = filt_rows(d)
    S, W = dt_st.shape[1], dt_st.shape[2]
    dtype = dt_st.dtype
    B = W // block
    mk = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_dt_filter_scan_kernel, d=d, build=build, n_coef=n_coef),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), mk(1), mk(1), mk(1)],
        out_specs=pl.BlockSpec(
            (n, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, S, 128), dtype),
        scratch_shapes=[pltpu.VMEM((n, S, 128), dtype)],
        interpret=interpret,
    )(scal, dt_st, y_st, m_st)


def _dt_filter_pass2(
    scal, prefixes, dt_st, y_st, m_st, d, build, n_coef, block, interpret
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d2 = d * d
    n = filt_rows(d)
    S, W = dt_st.shape[1], dt_st.shape[2]
    dtype = dt_st.dtype
    B = W // block
    pref_v = jnp.broadcast_to(prefixes[:, :, None], (n, S, 128))
    mk = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_dt_filter_apply_kernel, d=d, build=build, n_coef=n_coef),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (n, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            mk(1),
            mk(1),
            mk(1),
        ],
        out_specs=(
            mk(d),
            mk(d2),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, S, W), dtype),
            jax.ShapeDtypeStruct((d2, S, W), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, S, 128), dtype),
            pltpu.SMEM((1,), dtype),
        ],
        interpret=interpret,
    )(scal, pref_v, dt_st, y_st, m_st)


def strip_filter_dt(
    build,
    coeffs: Array,
    P0: Array,
    H: Array,
    R: Array,
    dts: Array,
    observations: Array,
    block: int | None = None,
    interpret: bool = False,
):
    """Fused-discretization strip filter; returns (b_tl, C_tl, ell).

    ``build``/``coeffs`` per SDEKernel.transition_coeffs; ``dts`` the (T,)
    inter-observation gaps (t0-prepended diff, as in ops/disc.py).
    Vmappable: the batched rule materializes the planes once
    (build_planes_tl) and rides the batched-sublane PLANE kernels — batched
    MCMC/GP stacks stay on a fused path even through the dt-engine entry."""
    from jax.custom_batching import custom_vmap

    from parallel_gps_tpu import config

    block, interpret = config.pallas_interpret_overrides(block, interpret)
    auto_block = block is None
    if auto_block:
        block = dt_strip_block(P0.shape[0], jnp.dtype(P0.dtype).itemsize)

    @custom_vmap
    def op(coeffs_, P0_, H_, R_, dts_, ys_):
        return _strip_filter_dt_impl(
            build, coeffs_, P0_, H_, R_, dts_, ys_, block, interpret
        )

    @op.def_vmap
    def _rule(axis_size, in_batched, coeffs_, P0_, H_, R_, dts_, ys_):  # noqa: ANN001
        from parallel_gps_tpu.kalman.pallas_scan import (
            pick_strip_block,
            strip_filter_op,
        )

        # The plane kernels pick their own measured-best block when this
        # entry auto-picked the dt-tuned one (512): the dt cap was only
        # swept for the unbatched dt kernels (ADVICE r4).  An explicitly
        # pinned block (tests, sweeps) still wins.
        pb = (
            pick_strip_block(P0_.shape[-1], jnp.dtype(P0_.dtype).itemsize)
            if auto_block
            else block
        )
        # Route through the custom_vmap-wrapped op: its batching rule
        # dispatches to the batched-sublane kernels.  vmapping the RAW
        # pallas_call would hand the batch axis to Pallas's default
        # batching (a prepended grid dim), which breaks the SMEM/carry
        # block specs on hardware (works only in interpret mode).
        planes_op = strip_filter_op(pb, interpret)

        def one(co, p0, h, r, dt, y):
            Fs, Qs, P0s = build_planes_tl(build, co, p0, dt)
            return planes_op(Fs, Qs, P0s, h, r, y)

        axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(one, in_axes=axes)(coeffs_, P0_, H_, R_, dts_, ys_)
        return out, (True, True, True)

    return op(coeffs, P0, H, R, dts, observations)


def _strip_filter_dt_impl(
    build, coeffs, P0, H, R, dts, observations, block, interpret
):
    d = P0.shape[0]
    d2 = d * d
    T = dts.shape[-1]
    S = N_STRIPS
    if block is None:
        block = dt_strip_block(d, jnp.dtype(P0.dtype).itemsize)
    ident_rows = tuple(k * d + k for k in range(d))
    n_coef = coeffs.shape[0]

    scal, dt_st, y_st, m_st, W, Tp = _dt_filter_prep(
        dts, P0, H, R, observations, coeffs, block, 1.0
    )
    totals = _dt_filter_pass1(
        scal, dt_st, y_st, m_st, d, build, n_coef, block, interpret
    )
    prefixes = _strip_exclusive_prefixes(
        totals[:, :, 0], d, _filt_combine_rows, ident_rows, reverse=False
    )
    b_st, c_st, ell = _dt_filter_pass2(
        scal, prefixes, dt_st, y_st, m_st, d, build, n_coef, block, interpret
    )
    b_tl = b_st.reshape(d, Tp)[:, :T]
    C_tl = c_st.reshape(d2, Tp)[:, :T].reshape(d, d, T)
    return b_tl, C_tl, ell[0]


# --------------------------------------------------------------------------
# Smoother
# --------------------------------------------------------------------------


def _dt_smoother_rows(
    scal_ref, dt_ref, b_ref, c_ref, dtb_ref, carry_ref, i, d, build, n_coef,
    pad,
):
    """Smoothing-element rows with next-step F/Q built from the 1-lane-
    shifted dt plane (the carry stashes ONE dt boundary column instead of
    the plane engine's 2d² F/Q columns).  SMEM: [P0 (d²) | last_flag |
    coeffs].  Front-pad positions are forced to the identity element (see
    pallas_scan._strip_smoother_rows)."""
    import jax.experimental.pallas as pl

    n = smooth_rows(d)
    d2 = d * d
    S, Lb = dt_ref.shape[1], dt_ref.shape[2]
    dtype = dt_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 0)
    is_last_lane = lane == (Lb - 1)

    rolled = _roll(dt_ref[0], 1, True)
    stash = carry_ref[n, :, 0:1]
    bound = dtb_ref[0, :, 0:1]
    col = jnp.where(i == 0, bound, stash)
    dt_next = jnp.where(
        is_last_lane, jnp.broadcast_to(col, (S, Lb)), rolled
    )
    Fn, Qn, _ = _dt_build_fq(scal_ref, dt_next, d, build, d2 + 1, n_coef)

    m = [b_ref[a] for a in range(d)]
    P = [[c_ref[a * d + c] for c in range(d)] for a in range(d)]

    last_here = jnp.logical_and(i == 0, scal_ref[d2] > 0.0)
    is_global_last = jnp.logical_and(
        jnp.logical_and(sub == S - 1, is_last_lane),
        jnp.full((S, Lb), last_here),
    )
    rows = _build_smoothing_rows(Fn, Qn, m, P, is_global_last, d)
    if pad:
        nB = pl.num_programs(0)
        W = nB * Lb
        s0, c0 = divmod(pad, W)
        tile_start = (nB - 1 - i) * Lb  # reverse index map
        lane_g = tile_start + lane
        is_pad = jnp.logical_or(
            sub < s0, jnp.logical_and(sub == s0, lane_g < c0)
        )
        idents = _ident_rows_list(n, ident_rows, (S, Lb), dtype)
        rows = [jnp.where(is_pad, idr, r) for idr, r in zip(idents, rows)]
    return rows


def _dt_smoother_scan_kernel(
    scal_ref, dt_ref, b_ref, c_ref, dtb_ref, totals_out, carry_ref, *, d,
    build, n_coef, pad,
):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    n = smooth_rows(d)
    S = dt_ref.shape[1]
    dtype = dt_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    @pl.when(i == 0)
    def _():
        pre = jnp.stack(
            _ident_rows_list(n, ident_rows, (S, carry_ref.shape[2]), dtype),
            axis=0,
        )
        carry_ref[0:n] = pre
        carry_ref[n:] = jnp.zeros_like(carry_ref[n:])

    rows = _dt_smoother_rows(
        scal_ref, dt_ref, b_ref, c_ref, dtb_ref, carry_ref, i, d, build,
        n_coef, pad,
    )
    init = [carry_ref[k, :, 0:1] for k in range(n)]
    edge = _strip_block_total(rows, _smooth_combine_rows, d, True, init)
    carry_ref[0:n] = jnp.broadcast_to(
        jnp.stack(edge, axis=0), (n,) + carry_ref.shape[1:]
    )
    carry_ref[n : n + 1] = jnp.broadcast_to(
        dt_ref[:][:, :, 0:1], (1,) + carry_ref.shape[1:]
    )
    totals_out[:] = carry_ref[0:n]


def _dt_smoother_apply_kernel(
    scal_ref, pref_ref, dt_ref, b_ref, c_ref, dtb_ref, g_out, l_out,
    carry_ref, *, d, build, n_coef, pad,
):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    n = smooth_rows(d)
    d2 = d * d
    ident_rows = tuple(k * d + k for k in range(d))

    @pl.when(i == 0)
    def _():
        carry_ref[0:n] = pref_ref[:]
        carry_ref[n:] = jnp.zeros_like(carry_ref[n:])

    rows = _dt_smoother_rows(
        scal_ref, dt_ref, b_ref, c_ref, dtb_ref, carry_ref, i, d, build,
        n_coef, pad,
    )
    init = [carry_ref[k, :, 0:1] for k in range(n)]
    out_rows, edge = _strip_chunked_scan(
        rows, _smooth_combine_rows, d, ident_rows, True, init
    )
    g_out[:] = jnp.stack(out_rows[d2 : d2 + d], axis=0)
    l_out[:] = jnp.stack(out_rows[d2 + d :], axis=0)
    carry_ref[0:n] = jnp.broadcast_to(
        jnp.stack(edge, axis=0), (n,) + carry_ref.shape[1:]
    )
    carry_ref[n : n + 1] = jnp.broadcast_to(
        dt_ref[:][:, :, 0:1], (1,) + carry_ref.shape[1:]
    )


def _dt_smoother_prep(dts, b_tl, C_tl, coeffs, P0, block, dtb_last, last_flag):
    """Strip reshape + FRONT padding (reverse scan; dt pads with 0, b with
    0, C with I) + cross-strip boundary dt columns + SMEM scalars."""
    d = b_tl.shape[0]
    d2 = d * d
    T = b_tl.shape[-1]
    dtype = b_tl.dtype
    S = N_STRIPS

    W = -(-T // (S * block)) * block
    Tp = S * W
    pad = Tp - T

    def pad_front(x, fill):
        if pad == 0:
            return x
        return jnp.concatenate(
            [jnp.broadcast_to(fill, x.shape[:-1] + (pad,)), x], axis=-1
        )

    eye_col = jnp.eye(d, dtype=dtype).reshape(d2, 1)
    dt_st = pad_front(
        dts.reshape(1, T).astype(dtype), jnp.zeros((1, 1), dtype)
    ).reshape(1, S, W)
    b_st = pad_front(b_tl, jnp.zeros((d, 1), dtype)).reshape(d, S, W)
    c_st = pad_front(C_tl.reshape(d2, T), eye_col).reshape(d2, S, W)

    # Cross-strip boundary dt: strip s's last element needs the dt at
    # global (s+1)·W — the first column of strip s+1.
    dtb = jnp.concatenate(
        [dt_st[:, 1:, 0], dtb_last.reshape(1, 1).astype(dtype)], axis=1
    )
    dtb_v = jnp.broadcast_to(dtb[:, :, None], (1, S, 128))

    scal = jnp.concatenate(
        [
            P0.reshape(d2).astype(dtype),
            jnp.asarray(last_flag, dtype).reshape(1),
            coeffs.astype(dtype).reshape(-1),
        ]
    )
    return scal, dt_st, b_st, c_st, dtb_v, W, Tp, pad


def _dt_smoother_pass1(
    scal, dt_st, b_st, c_st, dtb_v, d, build, n_coef, block, interpret, pad
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d2 = d * d
    n = smooth_rows(d)
    S, W = dt_st.shape[1], dt_st.shape[2]
    dtype = dt_st.dtype
    B = W // block
    rev = lambda i: (0, 0, B - 1 - i)  # noqa: E731
    mk = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), rev, memory_space=pltpu.VMEM
    )
    cst = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(
            _dt_smoother_scan_kernel, d=d, build=build, n_coef=n_coef, pad=pad
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            mk(1),
            mk(d),
            mk(d2),
            cst(1),
        ],
        out_specs=cst(n),
        out_shape=jax.ShapeDtypeStruct((n, S, 128), dtype),
        scratch_shapes=[pltpu.VMEM((n + 1, S, 128), dtype)],
        interpret=interpret,
    )(scal, dt_st, b_st, c_st, dtb_v)


def _dt_smoother_pass2(
    scal, prefixes, dt_st, b_st, c_st, dtb_v, d, build, n_coef, block,
    interpret, pad,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d2 = d * d
    n = smooth_rows(d)
    S, W = dt_st.shape[1], dt_st.shape[2]
    dtype = dt_st.dtype
    B = W // block
    pref_v = jnp.broadcast_to(prefixes[:, :, None], (n, S, 128))
    rev = lambda i: (0, 0, B - 1 - i)  # noqa: E731
    mk = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), rev, memory_space=pltpu.VMEM
    )
    cst = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(
            _dt_smoother_apply_kernel, d=d, build=build, n_coef=n_coef,
            pad=pad,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            cst(n),
            mk(1),
            mk(d),
            mk(d2),
            cst(1),
        ],
        out_specs=(mk(d), mk(d2)),
        out_shape=(
            jax.ShapeDtypeStruct((d, S, W), dtype),
            jax.ShapeDtypeStruct((d2, S, W), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((n + 1, S, 128), dtype)],
        interpret=interpret,
    )(scal, pref_v, dt_st, b_st, c_st, dtb_v)


def strip_smoother_dt(
    build,
    coeffs: Array,
    P0: Array,
    dts: Array,
    b_tl: Array,
    C_tl: Array,
    block: int | None = None,
    interpret: bool = False,
):
    """Fused-discretization strip smoother; returns (g_tl, L_tl).
    Vmappable via plane materialization (see strip_filter_dt)."""
    from jax.custom_batching import custom_vmap

    from parallel_gps_tpu import config

    block, interpret = config.pallas_interpret_overrides(block, interpret)
    auto_block = block is None
    if auto_block:
        block = dt_strip_block(b_tl.shape[0], jnp.dtype(b_tl.dtype).itemsize)

    @custom_vmap
    def op(coeffs_, P0_, dts_, b_, C_):
        return _strip_smoother_dt_impl(
            build, coeffs_, P0_, dts_, b_, C_, block, interpret
        )

    @op.def_vmap
    def _rule(axis_size, in_batched, coeffs_, P0_, dts_, b_, C_):  # noqa: ANN001
        from parallel_gps_tpu.kalman.pallas_scan import (
            pick_strip_block,
            strip_smoother_op,
        )

        pb = (
            pick_strip_block(P0_.shape[-1], jnp.dtype(P0_.dtype).itemsize)
            if auto_block
            else block
        )
        # custom_vmap-wrapped op → batched-sublane kernels (see the filter
        # rule above for why the raw pallas_call must not be vmapped).
        planes_op = strip_smoother_op(pb, interpret)

        def one(co, p0, dt, b__, c__):
            Fs, Qs, _ = build_planes_tl(build, co, p0, dt)
            return planes_op(Fs, Qs, b__, c__)

        axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(one, in_axes=axes)(coeffs_, P0_, dts_, b_, C_)
        return out, (True, True)

    return op(coeffs, P0, dts, b_tl, C_tl)


def _strip_smoother_dt_impl(
    build, coeffs, P0, dts, b_tl, C_tl, block, interpret
):
    d = b_tl.shape[0]
    d2 = d * d
    T = b_tl.shape[-1]
    dtype = b_tl.dtype
    if block is None:
        block = dt_strip_block(d, jnp.dtype(dtype).itemsize)
    ident_rows = tuple(k * d + k for k in range(d))
    n_coef = coeffs.shape[0]

    scal, dt_st, b_st, c_st, dtb_v, W, Tp, pad = _dt_smoother_prep(
        dts, b_tl, C_tl, coeffs, P0, block,
        jnp.zeros((), dtype), 1.0,
    )
    totals = _dt_smoother_pass1(
        scal, dt_st, b_st, c_st, dtb_v, d, build, n_coef, block, interpret,
        pad,
    )
    prefixes = _strip_exclusive_prefixes(
        totals[:, :, 0], d, _smooth_combine_rows, ident_rows, reverse=True
    )
    g_st, l_st = _dt_smoother_pass2(
        scal, prefixes, dt_st, b_st, c_st, dtb_v, d, build, n_coef, block,
        interpret, pad,
    )
    g_tl = g_st.reshape(d, Tp)[:, pad:]
    L_tl = l_st.reshape(d2, Tp)[:, pad:].reshape(d, d, T)
    return g_tl, L_tl


# --------------------------------------------------------------------------
# dt-native backward: fused Fisher tail
# --------------------------------------------------------------------------


def _dt_fisher_kernel(
    scal_ref, bnd_ref, dt_ref, b_ref, c_ref, g_ref, l_ref, y_ref, mask_ref,
    ddt_out, dy_out, acc_out, carry_ref, acc_ref, *, d, build, n_coef,
):
    """Fused Fisher-identity gradient tail (the dt-native backward).

    Computes, in ONE forward grid pass with F/Q rebuilt in registers from the
    dt plane, the cancellation-free Fisher cotangents of
    kalman/timelast.py::fisher_grads_from_smoothed —

        ∇Q_k = ½ (Pp⁻¹ D Pp⁻¹ + r rᵀ),  r_k = Pp_k⁻¹ δ_k
        ∇F_k = r_k m̂_{k−1}ᵀ + Pp⁻¹ D E_{k−1}ᵀ,  E_{k−1} = P_{k−1}F_kᵀPp_k⁻¹
        ∇P0  = F₀ᵀ (∇Q)₀ F₀  (+ the P∞-in-Q build dependence via the vjp)

    — and chains ∇F/∇Q straight to (coeffs, P0, dts) with ``jax.vjp`` of the
    in-register build (_build_fq_pure) INSIDE the kernel body (Pallas traces
    plain JAX, and the transposed ops are all elementwise), accumulating the
    scalar cotangents in SMEM across grid steps.  The tail is scan-free:
    every quantity is elementwise in k apart from one-lane backward shifts
    (m_{k−1}, P_{k−1}, m̂_{k−1}), supplied by the grid carry within a strip
    and by precomputed boundary columns across strips.  The (d, d, T) planes
    of the round-4 backward (build_planes_tl + XLA tail: ~4 extra full-size
    HBM pass groups) never exist.

    SMEM scal layout (shared with the dt filter): [P0 (d²) | h (d) | r |
    first_flag | coeffs].  Accumulator layout: [d_coeffs (n_coef) |
    d_P0 (d²) | d_H (d) | d_R].
    """
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    nB = pl.num_programs(0)
    d2 = d * d
    S, Lb = dt_ref.shape[1], dt_ref.shape[2]
    dtype = dt_ref.dtype
    n_acc = n_coef + d2 + d + 1

    @pl.when(i == 0)
    def _():
        for k in range(n_acc):
            acc_ref[k] = jnp.zeros((), dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 0)
    lane0 = lane == 0
    first_here = jnp.logical_and(i == 0, scal_ref[d2 + d + 1] > 0.0)
    is_first = jnp.logical_and(
        jnp.logical_and(sub == 0, lane0), jnp.full((S, Lb), first_here)
    )

    dt = dt_ref[0]
    y = y_ref[0]
    maskf = mask_ref[0]
    h = [scal_ref[d2 + k] for k in range(d)]
    r = scal_ref[d2 + d]

    b_rows = [b_ref[a] for a in range(d)]
    c_rows = [c_ref[a] for a in range(d2)]
    g_rows = [g_ref[a] for a in range(d)]
    l_rows = [l_ref[a] for a in range(d2)]

    # One-lane backward shifts: lane 0 comes from the previous block's last
    # column (carry) — or, at block 0, from the cross-strip boundary input.
    def prev_plane(row_k, cur):
        col = jnp.where(
            i == 0, bnd_ref[row_k, :, 0:1], carry_ref[row_k, :, 0:1]
        )
        return jnp.where(
            lane0, jnp.broadcast_to(col, (S, Lb)), _roll(cur, 1, False)
        )

    m_prev = [prev_plane(a, b_rows[a]) for a in range(d)]
    P_prev = [
        [prev_plane(d + a * d + c_, c_rows[a * d + c_]) for c_ in range(d)]
        for a in range(d)
    ]
    gh_prev = [prev_plane(d + d2 + a, g_rows[a]) for a in range(d)]

    # In-register F/Q build under jax.vjp: primals for the Fisher algebra,
    # vjp_fn for the (coeffs, P0, dt) chain rule below.
    c_tup = tuple(scal_ref[d2 + d + 2 + k] for k in range(n_coef))
    p0_tup = tuple(scal_ref[k] for k in range(d2))

    def tile_fn(ct, pt, dtt):
        P0v_ = [[pt[a * d + c_] for c_ in range(d)] for a in range(d)]
        F_, Q_ = _build_fq_pure(list(ct), P0v_, dtt, d, build)
        return tuple(tuple(row) for row in F_), tuple(tuple(row) for row in Q_)

    (F_t, Q_t), vjp_fn = jax.vjp(tile_fn, c_tup, p0_tup, dt)
    F = [list(row) for row in F_t]
    Q = [list(row) for row in Q_t]
    P0v = [[scal_ref[a * d + c_] for c_ in range(d)] for a in range(d)]

    # Global-first element: m₋₁ = 0, P₋₁ = P∞ (the E_prev formula below then
    # yields the pre-initial gain E₋₁ = P0 F0ᵀ Pp0⁻¹ of the XLA tail).
    zero = jnp.zeros((S, Lb), dtype)
    m_prev = [jnp.where(is_first, zero, m_prev[a]) for a in range(d)]
    P_prev = [
        [jnp.where(is_first, P0v[a][c_], P_prev[a][c_]) for c_ in range(d)]
        for a in range(d)
    ]

    mhat = g_rows
    Phat = [[l_rows[a * d + c_] for c_ in range(d)] for a in range(d)]
    mp = _mv(F, m_prev, d)
    FP = _mm(F, P_prev, d)
    Pp = _mm_symout(FP, F, Q, d)  # F P_prev Fᵀ + Q (upper-triangle aliased)
    Ppinv = _inv(Pp, d)
    delta = _vsub(mhat, mp, d)
    rk = _mv(Ppinv, delta, d)
    Dk = [[Phat[a][c_] - Pp[a][c_] for c_ in range(d)] for a in range(d)]
    PiD = _mm(Ppinv, Dk, d)
    PiDPi = _mm(PiD, Ppinv, d)
    dQ = [
        [0.5 * (PiDPi[a][c_] + rk[a] * rk[c_]) for c_ in range(d)]
        for a in range(d)
    ]
    E_prev = _mm(_mm(P_prev, _mt(F, d), d), Ppinv, d)
    Em_mhat = _mv(E_prev, mhat, d)
    mh_prev = [
        jnp.where(is_first, Em_mhat[a], gh_prev[a]) for a in range(d)
    ]
    dF = [
        [
            rk[a] * mh_prev[c_]
            + sum(PiD[a][k2] * E_prev[c_][k2] for k2 in range(d))
            for c_ in range(d)
        ]
        for a in range(d)
    ]

    # ∇P0 closed-form first-lane term F₀ᵀ (∇Q)₀ F₀.
    dP0f = _mm(_mm(_mt(F, d), dQ, d), F, d)

    # Chain ∇F/∇Q to (coeffs, P0, dts).  At padded lanes (dt = 0) the build
    # has exactly zero derivative w.r.t. every coefficient and P∞ entry, so
    # the scalar accumulators see no pad contamination; the d_dt plane at
    # pads is discarded by the [:T] slice outside.
    dF_t = tuple(tuple(row) for row in dF)
    dQ_t = tuple(tuple(row) for row in dQ)
    d_c_tup, d_p0_tup, d_dt = vjp_fn((dF_t, dQ_t))

    # Observation terms (masked), as in the XLA tail.
    Hm = sum(h[k2] * mhat[k2] for k2 in range(d))
    resid = y - Hm
    HPhat = [
        sum(h[k2] * Phat[k2][c_] for k2 in range(d)) for c_ in range(d)
    ]
    HPH = sum(h[c_] * HPhat[c_] for c_ in range(d))
    Nk = resid * resid + HPH
    dy = jnp.where(maskf > 0, -resid / r, 0.0)

    ddt_out[:] = d_dt[None]
    dy_out[:] = dy[None]

    for k in range(n_coef):
        acc_ref[k] = acc_ref[k] + d_c_tup[k]
    for idx in range(d2):
        a, c_ = divmod(idx, d)
        acc_ref[n_coef + idx] = (
            acc_ref[n_coef + idx]
            + d_p0_tup[idx]
            + jnp.sum(jnp.where(is_first, dP0f[a][c_], 0.0))
        )
    for a in range(d):
        acc_ref[n_coef + d2 + a] = acc_ref[n_coef + d2 + a] + jnp.sum(
            maskf * (resid * mhat[a] - HPhat[a])
        ) / r
    acc_ref[n_coef + d2 + d] = acc_ref[n_coef + d2 + d] + jnp.sum(
        0.5 * maskf * (Nk / (r * r) - 1.0 / r)
    )

    # Stash this block's last columns for the next block's shifts (all uses
    # of the carry happen above, so this write must stay last).
    last = [
        row[:, Lb - 1 : Lb] for row in (b_rows + c_rows + g_rows)
    ]
    carry_ref[:] = jnp.broadcast_to(
        jnp.stack(last, axis=0), carry_ref.shape
    )

    @pl.when(i == nB - 1)
    def _():
        for k in range(n_acc):
            acc_out[k] = acc_ref[k]


def _dt_fisher(
    build, coeffs, P0, H, R, dts, observations, b_tl, C_tl, g_tl, L_tl,
    block, interpret,
):
    """Run the fused Fisher-tail kernel; returns
    (d_coeffs, d_P0 (d,d, unsymmetrized), d_H (1,d), d_R (1,1),
    d_dts (T,), d_y like observations) — all UNSCALED by the output
    cotangent (the caller folds gbar).

    Vmappable: batched callers (vmapped training / MCMC chains) fall back
    to the round-4 XLA tail per batch element — build_planes_tl under
    jax.vjp + fisher_grads_from_smoothed — because the raw pallas_call's
    grid-carry logic does not survive the Pallas vmap batching rule."""
    from jax.custom_batching import custom_vmap

    from parallel_gps_tpu import config

    block, interpret = config.pallas_interpret_overrides(block, interpret)
    if block is None:
        block = dt_strip_block(P0.shape[0], jnp.dtype(P0.dtype).itemsize)

    @custom_vmap
    def op(coeffs_, P0_, H_, R_, dts_, ys_, b_, C_, g_, L_):
        return _dt_fisher_kernel_impl(
            build, coeffs_, P0_, H_, R_, dts_, ys_, b_, C_, g_, L_, block,
            interpret,
        )

    @op.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        from parallel_gps_tpu.kalman.timelast import (
            fisher_grads_from_smoothed,
        )
        from parallel_gps_tpu.types import LGSSMTL

        def one(co, p0, h, r, dt, ys_, b_, C_, g_, L_):
            (Fs, Qs, P0s), vjp_fn = jax.vjp(
                lambda c, p, d_: build_planes_tl(build, c, p, d_),
                co, p0, dt,
            )
            ssm = LGSSMTL(P0s, Fs, Qs, h, r)
            ct_ssm, ct_y = fisher_grads_from_smoothed(
                ssm, ys_, b_, C_, g_, L_, jnp.ones((), dt.dtype)
            )
            d_co, d_p0, d_dt = vjp_fn((ct_ssm.Fs, ct_ssm.Qs, ct_ssm.P0))
            return d_co, d_p0, ct_ssm.H, ct_ssm.R, d_dt, ct_y

        axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(one, in_axes=axes)(*args)
        return out, (True,) * 6

    return op(
        coeffs, P0, H, R, dts, observations, b_tl, C_tl, g_tl, L_tl
    )


def _dt_fisher_kernel_impl(
    build, coeffs, P0, H, R, dts, observations, b_tl, C_tl, g_tl, L_tl,
    block, interpret,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = P0.shape[0]
    d2 = d * d
    T = dts.shape[-1]
    S = N_STRIPS
    dtype = P0.dtype
    n_coef = coeffs.shape[0]
    n_acc = n_coef + d2 + d + 1

    scal, dt_st, y_st, m_st, W, Tp = _dt_filter_prep(
        dts, P0, H, R, observations, coeffs, block, 1.0
    )

    # Strip-pack the moment planes.  End pads: b/g → 0 and C/L → I, so padded
    # lanes stay finite (Pp = P_prev = I under dt = 0) with exactly-zero
    # Fisher cotangents where it matters (see kernel docstring).
    eye_col = jnp.eye(d, dtype=dtype).reshape(d2, 1)

    def pack(x, fill):
        if Tp != T:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(fill, x.shape[:-1] + (Tp - T,))], axis=-1
            )
        return x.reshape(x.shape[0], S, W)

    b_st = pack(b_tl, jnp.zeros((d, 1), dtype))
    c_st = pack(C_tl.reshape(d2, T), eye_col)
    g_st = pack(g_tl, jnp.zeros((d, 1), dtype))
    l_st = pack(L_tl.reshape(d2, T), eye_col)

    # Cross-strip boundary columns: strip s's first lane shifts from strip
    # s−1's last lane (strip 0 is the global-first special case, masked).
    mom = jnp.concatenate([b_st, c_st, g_st], axis=0)  # (2d+d², S, W)
    nbr = 2 * d + d2
    bnd = jnp.concatenate(
        [jnp.zeros((nbr, 1), dtype), mom[:, :-1, W - 1]], axis=1
    )
    bnd_v = jnp.broadcast_to(bnd[:, :, None], (nbr, S, 128))

    B = W // block
    mk = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    cst = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    ddt_st, dy_st, acc = pl.pallas_call(
        partial(_dt_fisher_kernel, d=d, build=build, n_coef=n_coef),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            cst(nbr),
            mk(1),
            mk(d),
            mk(d2),
            mk(d),
            mk(d2),
            mk(1),
            mk(1),
        ],
        out_specs=(
            mk(1),
            mk(1),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, S, W), dtype),
            jax.ShapeDtypeStruct((1, S, W), dtype),
            jax.ShapeDtypeStruct((n_acc,), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((nbr, S, 128), dtype),
            pltpu.SMEM((n_acc,), dtype),
        ],
        interpret=interpret,
    )(scal, bnd_v, dt_st, b_st, c_st, g_st, l_st, y_st, m_st)

    d_coeffs = acc[:n_coef]
    d_P0 = acc[n_coef : n_coef + d2].reshape(d, d)
    d_H = acc[n_coef + d2 : n_coef + d2 + d].reshape(1, d)
    d_R = acc[n_coef + d2 + d].reshape(1, 1)
    d_dts = ddt_st.reshape(Tp)[:T]
    d_y = dy_st.reshape(Tp)[:T].reshape(observations.shape)
    return d_coeffs, d_P0, d_H, d_R, d_dts, d_y


# --------------------------------------------------------------------------
# High-level entry points
# --------------------------------------------------------------------------


def _dts_from_ts(ts: Array, t0=0.0) -> Array:
    ts = ts.reshape(-1)
    return jnp.diff(ts, prepend=jnp.asarray(t0, ts.dtype).reshape(1))


def _coeffs_or_raise(kernel):
    tc = kernel.transition_coeffs()
    if tc is None:
        raise ValueError(
            f"{type(kernel).__name__} has no elementwise transition closed"
            " form; use get_ssm_tl + the plane strip engine"
        )
    return tc


def pkf_dt(kernel, ts, R, observations, block=None, interpret=False):
    """Fused-discretization parallel filter from (kernel, times) directly —
    the (d, d, T) SSM planes never exist.  Returns (b_tl, C_tl, ell).
    Requires kernel.transition_coeffs() (Matérn family)."""
    coeffs, build = _coeffs_or_raise(kernel)
    sde = kernel.get_sde()
    dts = _dts_from_ts(ts).astype(sde.P0.dtype)
    return strip_filter_dt(
        build, coeffs, sde.P0, sde.H, jnp.asarray(R).reshape(1, 1),
        dts, observations, block=block, interpret=interpret,
    )


def build_planes_tl(build, coeffs: Array, P0: Array, dts: Array):
    """XLA rebuild of the time-last (Fs, Qs, P0) planes from the transition
    coefficients — numerically identical to ops/disc.py::discretize_tl with
    ``transitions_m1_tl = build`` (same symmetrize, same cancellation-free
    ``Q = −(AP + (AP)ᵀ + A Pᵀ Am1ᵀ)``).  Used only inside the dt-engine's
    custom VJP: the elementwise Fisher tail needs the planes once per
    BACKWARD pass, so the forward pipeline still never materializes them,
    and jax.vjp of this function supplies the chain rule plane-cotangents →
    (coeffs, P0, dts)."""
    from parallel_gps_tpu.ops.linalg import symmetrize

    d = P0.shape[0]
    T = dts.shape[0]
    c = [coeffs[k] for k in range(coeffs.shape[0])]
    rows = build(c, dts)
    zero = jnp.zeros_like(dts)
    Am1 = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.broadcast_to(
                        rows[i][j] if rows[i][j] is not None else zero, (T,)
                    )
                    for j in range(d)
                ],
                0,
            )
            for i in range(d)
        ],
        0,
    )  # (d, d, T)
    P0s = symmetrize(P0)
    eye_tl = jnp.broadcast_to(
        jnp.eye(d, dtype=Am1.dtype)[:, :, None], (d, d, T)
    )
    Fs = Am1 + eye_tl
    P0_tl = P0s[:, :, None]
    AP = jnp.sum(Am1[:, :, None, :] * P0_tl[None, :, :, :], axis=1)
    APAt = jnp.sum(
        AP[:, :, None, :] * Am1[None, :, :, :].swapaxes(1, 2), axis=1
    )
    Q = -(AP + jnp.swapaxes(AP, 0, 1) + APAt)
    Qs = 0.5 * (Q + jnp.swapaxes(Q, 0, 1))
    return Fs, Qs, P0s


@partial(jax.custom_vjp, nondiff_argnums=(0, 7, 8))
def _lml_dt_core(build, coeffs, P0, H, R, dts, observations, block, interpret):
    """LML via the dt-engine with Fisher-identity gradients.

    Forward: the fused-discretization strip filter (planes never exist).
    Backward: the fused-discretization strip smoother + the shared
    elementwise Fisher tail (timelast.fisher_grads_from_smoothed) on planes
    rebuilt ONCE in XLA (build_planes_tl), whose jax.vjp chains the plane
    cotangents to (coeffs, P0, dts).  The stationarity contract the Fisher
    tail requires (Q_k = P0 − F_k P0 F_kᵀ) holds by construction."""
    return strip_filter_dt(
        build, coeffs, P0, H, R, dts, observations,
        block=block, interpret=interpret,
    )[2]


def _lml_dt_core_fwd(build, coeffs, P0, H, R, dts, observations, block,
                     interpret):
    b_tl, C_tl, ell = strip_filter_dt(
        build, coeffs, P0, H, R, dts, observations,
        block=block, interpret=interpret,
    )
    return ell, (coeffs, P0, H, R, dts, observations, b_tl, C_tl)


def _lml_dt_core_bwd(build, block, interpret, residuals, gbar):
    coeffs, P0, H, R, dts, observations, b_tl, C_tl = residuals
    g_tl, L_tl = strip_smoother_dt(
        build, coeffs, P0, dts, b_tl, C_tl, block=block, interpret=interpret
    )
    d_coeffs, d_P0, d_H, d_R, d_dts, d_y = _dt_fisher(
        build, coeffs, P0, H, R, dts, observations, b_tl, C_tl, g_tl, L_tl,
        block, interpret,
    )
    # The P∞ cotangent contracts downstream with the symmetric output of
    # solve_lyap_vec; distribute it symmetrically (as the round-4
    # build_planes_tl chain did via symmetrize).
    d_P0 = 0.5 * (d_P0 + d_P0.T)
    g = gbar.astype(P0.dtype)
    return (
        g * d_coeffs, g * d_P0, g * d_H, g * d_R, g * d_dts, g * d_y
    )


_lml_dt_core.defvjp(_lml_dt_core_fwd, _lml_dt_core_bwd)


def lml_dt(kernel, ts, R, observations, block=None, interpret=False):
    """Log marginal likelihood via the dt-engine, DIFFERENTIABLE in the
    kernel hyperparameters, R, and the observations (Fisher-identity custom
    VJP; see _lml_dt_core).  The training step never materializes the
    (d, d, T) planes in its forward pipeline."""
    coeffs, build = _coeffs_or_raise(kernel)
    sde = kernel.get_sde()
    dts = _dts_from_ts(ts).astype(sde.P0.dtype)
    return _lml_dt_core(
        build, coeffs, sde.P0, sde.H, jnp.asarray(R).reshape(1, 1),
        dts, observations, block, interpret,
    )


def pkfs_dt(kernel, ts, R, observations, block=None, interpret=False):
    """Fused-discretization parallel filter + smoother; returns smoothed
    (g_tl (d, T), L_tl (d, d, T))."""
    tc = kernel.transition_coeffs()
    if tc is None:
        raise ValueError(
            f"{type(kernel).__name__} has no elementwise transition closed"
            " form; use get_ssm_tl + the plane strip engine"
        )
    coeffs, build = tc
    sde = kernel.get_sde()
    dts = _dts_from_ts(ts).astype(sde.P0.dtype)
    b_tl, C_tl, _ = strip_filter_dt(
        build, coeffs, sde.P0, sde.H, jnp.asarray(R).reshape(1, 1),
        dts, observations, block=block, interpret=interpret,
    )
    return strip_smoother_dt(
        build, coeffs, sde.P0, dts, b_tl, C_tl, block=block,
        interpret=interpret,
    )
