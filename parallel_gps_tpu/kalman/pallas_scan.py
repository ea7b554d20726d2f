"""Fused Pallas TPU kernels for the associative Kalman scans (d ≤ 3).

The XLA time-last engine (kalman/timelast.py) runs each Kogge-Stone round as
a separate HBM pass (~20 rounds at T=10⁶ → ~20× the optimal memory traffic).
The kernels here keep the whole scan in VMEM.  Two generations coexist:

1. **Plane scan** (``pallas_plane_scan``): element components packed as rows
   of an (n_comp, T) plane — time on lanes, components on sublanes:
     filtering:  rows = [A(d²), b(d), C(d²), J(d²), eta(d)]   (3d² + 2d)
     smoothing:  rows = [E(d²), g(d), L(d²)]                   (2d² + d)
   A single carry-scan pass: TPU grids run sequentially, so a VMEM scratch
   carries the running prefix across blocks — one HBM read + one write.
   Simple, used by the LGSSM-layout wrappers (`pkf_pallas`).

2. **Strip engine** (``strip_filter`` / ``strip_smoother``): the production
   path (see the section comment below).  Component rows of (1, L) occupy a
   single sublane — 7/8 of every vreg wasted; the strip engine splits the
   timeline into 8 sublane-resident strips so every combine op runs on full
   (8, Lb) registers, and fuses element construction + scan + streaming
   log-likelihood into the same kernels (~4× faster end-to-end).

Correctness is pinned against the XLA engine in tests (interpret mode on
CPU; native on TPU).  Gradients are NOT defined through the Pallas paths —
the differentiable XLA time-last engine is used under ``jax.grad`` (see
``pkf``'s engine dispatch).
"""
from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import Array

DEFAULT_BLOCK = 2048


def _round_mask(shape, shift, reverse: bool):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    if reverse:
        return lane < (shape[-1] - shift)
    return lane >= shift


def _roll(x, shift, reverse: bool):
    from jax.experimental.pallas import tpu as pltpu

    L = x.shape[-1]
    # pltpu.roll requires a non-negative shift; a left-roll by s is a
    # right-roll by L - s (circular).
    s = (L - shift) % L if reverse else shift
    return pltpu.roll(x, s, axis=x.ndim - 1)


# --------------------------------------------------------------------------
# Component-plane algebra: lists of (1, L) rows, unrolled over d.
# --------------------------------------------------------------------------


def _mat_rows(X, base, d):
    """Rows base..base+d²-1 of the packed plane as a d×d list-of-lists."""
    return [[X[base + i * d + j] for j in range(d)] for i in range(d)]


def _vec_rows(X, base, d):
    return [X[base + i] for i in range(d)]


def _mm(a, b, d):
    return [
        [sum(a[i][k] * b[k][j] for k in range(d)) for j in range(d)]
        for i in range(d)
    ]


def _mv(a, v, d):
    return [sum(a[i][k] * v[k] for k in range(d)) for i in range(d)]


def _mt(a, d):
    return [[a[j][i] for j in range(d)] for i in range(d)]


def _madd(a, b, d):
    return [[a[i][j] + b[i][j] for j in range(d)] for i in range(d)]


def _vadd(a, b, d):
    return [a[i] + b[i] for i in range(d)]


def _vsub(a, b, d):
    return [a[i] - b[i] for i in range(d)]


def _sym(a, d):
    return [[0.5 * (a[i][j] + a[j][i]) for j in range(d)] for i in range(d)]


def _mm_symout(a, bt, add, d):
    """``a · btᵀ + add`` for a product that is symmetric in exact arithmetic:
    only the d(d+1)/2 upper-triangle entries are computed and the lower
    triangle aliases them (free in row-list form) — replaces a full product
    followed by ``_sym`` in the hot combines."""
    out = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            v = sum(a[i][k] * bt[j][k] for k in range(d)) + add[i][j]
            out[i][j] = v
            out[j][i] = v
    return out


def _plus_eye(a, d):
    return [
        [a[i][j] + (1.0 if i == j else 0.0) for j in range(d)]
        for i in range(d)
    ]


def _mm_rect(a, b):
    """General (p×q)·(q×r) product on row lists (rectangular blocks for the
    Schur recursion below)."""
    p, q, r = len(a), len(b), len(b[0])
    return [
        [sum(a[i][k] * b[k][j] for k in range(q)) for j in range(r)]
        for i in range(p)
    ]


def _inv(M, d):
    if d > 3:
        # Schur-complement block recursion onto the closed-form base cases —
        # the list-of-rows counterpart of kalman/timelast.py::_inv, enabling
        # the fused strip/batched kernels for d > 3 (RBF order k ≤ 8 etc.).
        k = (d + 1) // 2
        A = [row[:k] for row in M[:k]]
        B = [row[k:] for row in M[:k]]
        C = [row[:k] for row in M[k:]]
        D = [row[k:] for row in M[k:]]
        Ainv = _inv(A, k)
        CAinv = _mm_rect(C, Ainv)
        AinvB = _mm_rect(Ainv, B)
        S = [
            [D[i][j] - sum(CAinv[i][t] * B[t][j] for t in range(k))
             for j in range(d - k)]
            for i in range(d - k)
        ]
        Sinv = _inv(S, d - k)
        TL_blk = _mm_rect(_mm_rect(AinvB, Sinv), CAinv)
        TL = [
            [Ainv[i][j] + TL_blk[i][j] for j in range(k)] for i in range(k)
        ]
        TR = [[-v for v in row] for row in _mm_rect(AinvB, Sinv)]
        BL = [[-v for v in row] for row in _mm_rect(Sinv, CAinv)]
        return [TL[i] + TR[i] for i in range(k)] + [
            BL[i] + Sinv[i] for i in range(d - k)
        ]
    if d == 1:
        return [[1.0 / M[0][0]]]
    if d == 2:
        a, b = M[0]
        c, e = M[1]
        det = a * e - b * c
        inv = 1.0 / det
        return [[e * inv, -b * inv], [-c * inv, a * inv]]
    if d == 3:
        a, b, c = M[0]
        e, f, g = M[1]
        h, i, j = M[2]
        A00 = f * j - g * i
        A01 = c * i - b * j
        A02 = b * g - c * f
        A10 = g * h - e * j
        A11 = a * j - c * h
        A12 = c * e - a * g
        A20 = e * i - f * h
        A21 = b * h - a * i
        A22 = a * f - b * e
        det = a * A00 + b * A10 + c * A20
        inv = 1.0 / det
        return [
            [A00 * inv, A01 * inv, A02 * inv],
            [A10 * inv, A11 * inv, A12 * inv],
            [A20 * inv, A21 * inv, A22 * inv],
        ]
    raise AssertionError("unreachable: d > 3 handled by Schur recursion")


def _filt_unpack(X, d):
    d2 = d * d
    A = _mat_rows(X, 0, d)
    b = _vec_rows(X, d2, d)
    C = _mat_rows(X, d2 + d, d)
    J = _mat_rows(X, 2 * d2 + d, d)
    eta = _vec_rows(X, 3 * d2 + d, d)
    return A, b, C, J, eta


def _filt_pack(A, b, C, J, eta, d):
    rows = (
        [A[i][j] for i in range(d) for j in range(d)]
        + list(b)
        + [C[i][j] for i in range(d) for j in range(d)]
        + [J[i][j] for i in range(d) for j in range(d)]
        + list(eta)
    )
    return jnp.concatenate(rows, axis=0)


def filt_rows(d: int) -> int:
    return 3 * d * d + 2 * d


def _filt_identity_plane(d: int, L: int, dtype) -> Array:
    """Identity element broadcast over L lanes: A=I, rest 0."""
    n = filt_rows(d)
    col = jnp.zeros((n, 1), dtype)
    for i in range(d):
        col = col.at[i * d + i, 0].set(1.0)
    return jnp.broadcast_to(col, (n, L))


def _filt_combine_rows(X1, X2, d):
    """filtering_operator on row lists (rows of any matching shape);
    returns the combined element as a flat row list."""
    A1, b1, C1, J1, eta1 = _filt_unpack(X1, d)
    A2, b2, C2, J2, eta2 = _filt_unpack(X2, d)
    V = _inv(_plus_eye(_mm(C1, J2, d), d), d)
    U = _mm(A2, V, d)
    A = _mm(U, A1, d)
    b = _vadd(_mv(U, _vadd(b1, _mv(C1, eta2, d), d), d), b2, d)
    # U C1 A2ᵀ = A2 (VC1) A2ᵀ is symmetric in exact arithmetic (push-through
    # identity: VC1 = C1Vᵀ), so only its upper triangle is computed.
    C = _mm_symout(_mm(U, C1, d), A2, C2, d)
    # C1 and J2 are symmetric (combine outputs mirrored symmetric; element
    # construction builds them from commutative products), so
    # I + J2 C1 = (I + C1 J2)ᵀ and its inverse is Vᵀ — the second matrix
    # inversion and the J2·C1 product drop out of the hot combine
    # (~15-20% of the filter scan's VPU work; row-list transpose is free).
    W = _mm(_mt(A1, d), _mt(V, d), d)
    eta = _vadd(_mv(W, _vsub(eta2, _mv(J2, b1, d), d), d), eta1, d)
    # (W J2) A1 = A1ᵀ (VᵀJ2) A1 symmetric likewise.
    J = _mm_symout(_mm(W, J2, d), _mt(A1, d), J1, d)
    return (
        [A[i][j] for i in range(d) for j in range(d)]
        + list(b)
        + [C[i][j] for i in range(d) for j in range(d)]
        + [J[i][j] for i in range(d) for j in range(d)]
        + list(eta)
    )


def _filt_combine(X1, X2, d):
    """filtering_operator on packed planes (row lists of (1, L))."""
    rows = _filt_combine_rows(X1, X2, d)
    return jnp.concatenate(rows, axis=0)


def _smooth_unpack(X, d):
    d2 = d * d
    E = _mat_rows(X, 0, d)
    g = _vec_rows(X, d2, d)
    L = _mat_rows(X, d2 + d, d)
    return E, g, L


def _smooth_pack(E, g, L, d):
    rows = (
        [E[i][j] for i in range(d) for j in range(d)]
        + list(g)
        + [L[i][j] for i in range(d) for j in range(d)]
    )
    return jnp.concatenate(rows, axis=0)


def smooth_rows(d: int) -> int:
    return 2 * d * d + d


def _smooth_identity_plane(d: int, L: int, dtype) -> Array:
    n = smooth_rows(d)
    col = jnp.zeros((n, 1), dtype)
    for i in range(d):
        col = col.at[i * d + i, 0].set(1.0)
    return jnp.broadcast_to(col, (n, L))


def _smooth_combine_rows(X1, X2, d):
    E1, g1, L1 = _smooth_unpack(X1, d)
    E2, g2, L2 = _smooth_unpack(X2, d)
    E = _mm(E2, E1, d)
    g = _vadd(_mv(E2, g1, d), g2, d)
    # E2 L1 E2ᵀ symmetric (L1 symmetric): upper triangle only.
    L = _mm_symout(_mm(E2, L1, d), E2, L2, d)
    return (
        [E[i][j] for i in range(d) for j in range(d)]
        + list(g)
        + [L[i][j] for i in range(d) for j in range(d)]
    )


def _smooth_combine(X1, X2, d):
    rows = _smooth_combine_rows(X1, X2, d)
    return jnp.concatenate(rows, axis=0)


def _build_filtering_rows(F, Q, y, mask, h, r, P0v, is_first, d):
    """Filtering-element rows [A | b | C | J | eta] from transition/noise
    row-lists plus observation tiles — the in-kernel counterpart of
    make_filtering_elements (reference pssgp/kalman/parallel.py:13-97),
    shared by the strip and batched filter kernels.

    ``h``/``r`` entries and the ``P0v`` rows may be Python scalars (strip
    engine: SMEM scalars) or per-sublane tiles (batched engine); the
    algebra broadcasts either.  ``is_first`` marks each series' t=0
    position, where the element updates against (m0=0, P0) — at those
    positions the ``y``/``mask`` tiles hold the series' first observation.
    """
    HQ = [sum(h[k] * Q[k][j] for k in range(d)) for j in range(d)]
    Sv = sum(h[j] * HQ[j] for j in range(d)) + r
    # Fold the missing-data mask into the gain/precision scalars once (a
    # masked step has K = 0, S⁻¹-weighted terms = 0 ⇒ A=F, C=Q, b=η=J=0,
    # the reference's NaN element) instead of masking every d² entry.
    Sinv_m = mask / Sv
    K = [HQ[j] * Sinv_m for j in range(d)]
    HF = [sum(h[k] * F[k][j] for k in range(d)) for j in range(d)]

    A = [[F[a][c] - K[a] * HF[c] for c in range(d)] for a in range(d)]
    b = [K[a] * y for a in range(d)]
    C = [[Q[a][c] - K[a] * HQ[c] for c in range(d)] for a in range(d)]
    Sy = Sinv_m * y
    eta = [HF[a] * Sy for a in range(d)]
    J = [[HF[a] * HF[c] * Sinv_m for c in range(d)] for a in range(d)]

    P0h = [sum(P0v[a][k] * h[k] for k in range(d)) for a in range(d)]
    S1 = sum(h[k] * P0h[k] for k in range(d)) + r
    K1 = [P0h[a] / S1 for a in range(d)]
    for a in range(d):
        b[a] = jnp.where(is_first, mask * (K1[a] * y), b[a])
        for c in range(d):
            A[a][c] = jnp.where(is_first, jnp.zeros_like(A[a][c]), A[a][c])
            C[a][c] = jnp.where(
                is_first, P0v[a][c] - mask * (K1[a] * P0h[c]), C[a][c]
            )
    return (
        [A[a][c] for a in range(d) for c in range(d)]
        + b
        + [C[a][c] for a in range(d) for c in range(d)]
        + [J[a][c] for a in range(d) for c in range(d)]
        + eta
    )


def _build_smoothing_rows(Fn, Qn, m, P, is_global_last, d):
    """Smoothing-element rows [E | g | L] from next-step transition/noise
    row-lists and filtered moments — the in-kernel counterpart of
    make_smoothing_elements (reference pssgp/kalman/parallel.py:155-173),
    shared by the strip and batched smoother kernels.  ``is_global_last``
    marks each series' final position: (E=0, g=m_T, L=P_T)."""
    FP = _mm(Fn, P, d)
    # FP Fnᵀ + Qn is symmetric (P, Qn symmetric): upper triangle + mirror.
    Pp = _mm_symout(FP, Fn, Qn, d)
    E = _mt(_mm(_inv(Pp, d), FP, d), d)
    g = _vsub(m, _mv(_mm(E, Fn, d), m, d), d)
    # L = P − E Pp Eᵀ, symmetric: precompute (Pp Eᵀ) once and fill the
    # upper triangle only.
    PpE = [
        [sum(Pp[k1][k2] * E[c][k2] for k2 in range(d)) for k1 in range(d)]
        for c in range(d)
    ]
    Lm = [[None] * d for _ in range(d)]
    for a in range(d):
        for c in range(a, d):
            v = P[a][c] - sum(E[a][k1] * PpE[c][k1] for k1 in range(d))
            Lm[a][c] = v
            Lm[c][a] = v
    for a in range(d):
        g[a] = jnp.where(is_global_last, m[a], g[a])
        for c in range(d):
            E[a][c] = jnp.where(is_global_last, jnp.zeros_like(E[a][c]), E[a][c])
            Lm[a][c] = jnp.where(is_global_last, P[a][c], Lm[a][c])
    return (
        [E[a][c] for a in range(d) for c in range(d)]
        + g
        + [Lm[a][c] for a in range(d) for c in range(d)]
    )


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------


def _split_rows(X, n):
    return [X[i : i + 1, :] for i in range(n)]


def _ident_plane(shape, ident_rows, dtype):
    """Identity-element plane built IN-kernel (pallas kernels must not close
    over array constants): rows in ``ident_rows`` are 1, the rest 0."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    is_one = row == ident_rows[0]
    for r in ident_rows[1:]:
        is_one = jnp.logical_or(is_one, row == r)
    return jnp.where(is_one, 1.0, 0.0).astype(dtype)


def _local_scan_kernel(x_ref, out_ref, *, d, combine, ident_rows, reverse):
    """Phase 1: in-VMEM Kogge-Stone over the block.  The block total is the
    last (first, for reverse) column of the scanned block — read back out on
    the host rather than emitted as a second output (TPU block specs require
    lane-aligned output blocks)."""
    X = x_ref[:]  # (n_rows, L)
    n, L = X.shape
    rounds = max(1, int(math.ceil(math.log2(L)))) if L > 1 else 0
    ident = _ident_plane(X.shape, ident_rows, X.dtype)
    shift = 1
    for _ in range(rounds):
        mask = _round_mask(X.shape, shift, reverse)
        partial_ = jnp.where(mask, _roll(X, shift, reverse), ident)
        X = combine(_split_rows(partial_, n), _split_rows(X, n), d)
        shift *= 2
    out_ref[:] = X


def _carry_scan_kernel(x_ref, out_ref, carry_ref, *, d, combine, ident_rows, reverse):
    """Single-pass block scan with a VMEM carry.

    TPU grids execute sequentially, so the carry scratch persists across
    grid steps: each step locally Kogge-Stone-scans its block in VMEM,
    folds in the running prefix (suffix, for reverse) of all earlier
    (later) blocks, writes the finished block out, and updates the carry
    with its own total.  ONE read + ONE write of the planes — vs the
    3-phase design's two full passes plus a strided totals gather (the
    gather alone cost more than the whole scan at T = 10⁶)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    X = x_ref[:]  # (n_rows, L)
    n, L = X.shape

    @pl.when(i == 0)
    def _():
        carry_ref[:] = _ident_plane(carry_ref.shape, ident_rows, X.dtype)

    rounds = max(1, int(math.ceil(math.log2(L)))) if L > 1 else 0
    ident = _ident_plane(X.shape, ident_rows, X.dtype)
    shift = 1
    for _ in range(rounds):
        mask = _round_mask(X.shape, shift, reverse)
        partial_ = jnp.where(mask, _roll(X, shift, reverse), ident)
        X = combine(_split_rows(partial_, n), _split_rows(X, n), d)
        shift *= 2

    prefix = jnp.broadcast_to(carry_ref[:, 0:1], (n, L))
    out = combine(_split_rows(prefix, n), _split_rows(X, n), d)
    out_ref[:] = out
    total_col = out[:, 0:1] if reverse else out[:, L - 1 : L]
    carry_ref[:] = jnp.broadcast_to(total_col, carry_ref.shape)


def pallas_plane_scan(
    planes: Array,
    d: int,
    kind: str,
    reverse: bool = False,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> Array:
    """Associative scan over the lane axis of packed element planes (n, T).

    kind: "filter" or "smoother".  T is identity-padded to a block multiple
    (padding at the FRONT for reverse scans so real elements keep their
    suffixes intact).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, T = planes.shape
    dtype = planes.dtype
    if kind == "filter":
        combine = _filt_combine
        ident_col = _filt_identity_plane(d, 1, dtype)
        assert n == filt_rows(d)
    elif kind == "smoother":
        combine = _smooth_combine
        ident_col = _smooth_identity_plane(d, 1, dtype)
        assert n == smooth_rows(d)
    else:
        raise ValueError(kind)

    B = -(-T // block)
    Tp = B * block
    if Tp != T:
        fill = jnp.broadcast_to(ident_col, (n, Tp - T))
        planes = (
            jnp.concatenate([planes, fill], axis=-1)
            if not reverse
            else jnp.concatenate([fill, planes], axis=-1)
        )

    kernel = partial(
        _carry_scan_kernel,
        d=d,
        combine=combine,
        ident_rows=tuple(i * d + i for i in range(d)),
        reverse=reverse,
    )
    # Reverse scans walk the blocks right-to-left so the carry accumulates
    # the suffix; the same index map is used for input and output.
    index_map = (lambda i: (0, B - 1 - i)) if reverse else (lambda i: (0, i))
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((n, block), index_map, memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((n, block), index_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Tp), dtype),
        scratch_shapes=[pltpu.VMEM((n, 128), dtype)],
        interpret=interpret,
    )(planes)

    if Tp != T:
        out = out[:, :T] if not reverse else out[:, Tp - T :]
    return out


def _transpose_kernel(x_ref, out_ref):
    out_ref[:] = x_ref[:].T


def plane_transpose(
    planes: Array, block: int = 8192, interpret: bool = False
) -> Array:
    """(n, T) → (T, n) via blockwise in-VMEM transposes.

    XLA's relayout for tiny-minor-dim transposes runs ~30× below HBM
    bandwidth at T = 10⁶ (measured ~25 ms for two (T,2,2)↔(2,2,T) moves);
    this kernel streams (n, block) tiles through VMEM at line rate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, T = planes.shape
    B = -(-T // block)
    Tp = B * block
    if Tp != T:
        planes = jnp.concatenate(
            [planes, jnp.zeros((n, Tp - T), planes.dtype)], axis=-1
        )
    out = pl.pallas_call(
        _transpose_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (block, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, n), planes.dtype),
        interpret=interpret,
    )(planes)
    return out[:T] if Tp != T else out


# --------------------------------------------------------------------------
# Strip-layout engine: 8 time-strips on sublanes — full VPU utilization.
#
# The fused kernels above operate on (1, L) component rows: Mosaic places a
# single row on one sublane, so every vector op wastes 7/8 of each (8, 128)
# vreg.  Here the timeline is split into S = 8 contiguous strips laid on the
# SUBLANE axis: planes become (rows, 8, W) and every combine op runs on
# (8, Lb) tiles at full register utilization (~8× the arithmetic throughput;
# XLA's lane→(sublane, lane) reshape is free, unlike its transposes).
#
# Two kernel passes per scan:
#   pass 1: per-strip carry scan (each sublane scans its own strip)
#           → scanned element planes + per-strip totals;
#   tiny XLA step: exclusive combine of the 8 strip totals;
#   pass 2: fold each strip's incoming prefix into its elements, emit the
#           moments (and, for the filter, the streaming log-likelihood).
#
# Same math as the fused kernels (reference pssgp/kalman/parallel.py:13-201);
# parity is pinned against the XLA time-last engine in tests.
# --------------------------------------------------------------------------

N_STRIPS = 8
DEFAULT_STRIP_BLOCK = 1024
VMEM_BUDGET_BYTES = 16 * 1024 * 1024  # v5e/v5p per-core VMEM


def pick_strip_block(d: int, itemsize: int = 4, vmem_budget: int = VMEM_BUDGET_BYTES) -> int:
    """Largest power-of-two strip block that fits the VMEM budget for the
    strip-filter scan pass (the heaviest of the four kernels).

    Scoped-VMEM model, validated against the measured d=3/f32 cliff
    (block=4096 → 26.5 MB > 16 MB; block=2048 fine): Mosaic double-buffers
    the streamed input+output blocks, and the in-kernel Kogge-Stone keeps
    ~3 live copies of the element rows:

        bytes ≈ (2·(in_rows + out_rows) + 3·n) · S · block · itemsize

    with in_rows = 2d²+2 (F, Q, y, mask), out_rows = n = 3d²+2d.  Clamped
    to [128, DEFAULT_STRIP_BLOCK]: per-element combine work grows as
    log2(block) + 2 and the scans are VPU-bound, so blocks beyond the
    measured-best 1024 only add rounds; smaller blocks are chosen when
    d/dtype push the scoped VMEM over budget (e.g. d=6 f32 → 512).
    """
    n = filt_rows(d)
    in_rows = 2 * d * d + 2
    per_lane = (2 * (in_rows + n) + 3 * n) * N_STRIPS * itemsize
    block = 128
    while block < DEFAULT_STRIP_BLOCK and (block * 2) * per_lane <= vmem_budget:
        block *= 2
    return block


def strip_align(d: int, itemsize: int = 4) -> int:
    """Time-axis alignment at which the strip kernels' input padding pass
    becomes a no-op: ``N_STRIPS * pick_strip_block(d, itemsize)``.

    The pack stage (``_strip_filter_prep``) end-pads every (d², T) plane to
    this multiple with identity elements — a FULL copy of F, Q, y, and mask
    when T is unaligned, which measured ~30% of LML and ~47% of pkfs wall
    at N=10M on a v5e (results/pad_ab.json).  Callers that control where
    the arrays are BORN (the model layer, benchmarks) should instead pad
    ``ts``/``ys`` to this multiple up front — dt=0 steps discretize to
    exact identity transitions (F=I, Q=0 in the cancellation-free form)
    and NaN observations are masked out, so results at real positions are
    bit-identical while every downstream plane is born aligned and the
    kernels copy nothing."""
    return N_STRIPS * pick_strip_block(d, itemsize)


def _ident_rows_list(n, ident_rows, shape, dtype):
    return [
        jnp.ones(shape, dtype) if k in ident_rows else jnp.zeros(shape, dtype)
        for k in range(n)
    ]


def _strip_ks_rounds(rows, combine_rows, d, ident_rows, reverse):
    """In-place Kogge-Stone over the lane axis of (S, Lb) row tiles."""
    S, Lb = rows[0].shape
    dtype = rows[0].dtype
    n = len(rows)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 1)
    idents = _ident_rows_list(n, ident_rows, (S, Lb), dtype)
    n_rounds = max(1, int(math.ceil(math.log2(Lb)))) if Lb > 1 else 0
    shift = 1
    for _ in range(n_rounds):
        if reverse:
            mask = lane < (Lb - shift)
        else:
            mask = lane >= shift
        partial_ = [
            jnp.where(mask, _roll(r, shift, reverse), idents[k])
            for k, r in enumerate(rows)
        ]
        rows = combine_rows(partial_, rows, d)
        shift *= 2
    return rows


_SCAN_CHUNK = 128  # one vreg of lanes


def _strip_chunked_scan(rows, combine_rows, d, ident_rows, reverse, init):
    """Inclusive scan of (S, Lb) row tiles seeded by the ``init`` prefix
    (suffix, for reverse) columns; returns (scanned rows, final carry cols).

    Kogge-Stone over the whole Lb-lane block costs log2(Lb) combines per
    element; here the block is scanned as sequential 128-lane (one-vreg)
    chunks — log2(128) = 7 KS rounds within each chunk plus ONE carry fold
    that also applies the incoming block prefix.  At the production
    block=1024 that is 8 combines per element instead of 11, ~25% less VPU
    work on a compute-bound scan (CLAUDE.md perf map), at identical math:
    the chunk carry chain reassociates exactly like the block carry chain.
    """
    S, Lb = rows[0].shape
    chunk = _SCAN_CHUNK
    if Lb <= chunk or Lb % chunk != 0:
        scanned = _strip_ks_rounds(rows, combine_rows, d, ident_rows, reverse)
        pref = [jnp.broadcast_to(p, (S, Lb)) for p in init]
        out = combine_rows(pref, scanned, d)
        edge = [o[:, 0:1] if reverse else o[:, Lb - 1 : Lb] for o in out]
        return out, edge
    n = len(rows)
    nc = Lb // chunk
    carry = init
    outs = [None] * nc
    order = range(nc - 1, -1, -1) if reverse else range(nc)
    for c in order:
        sub = [r[:, c * chunk : (c + 1) * chunk] for r in rows]
        sub = _strip_ks_rounds(sub, combine_rows, d, ident_rows, reverse)
        pref = [jnp.broadcast_to(p, (S, chunk)) for p in carry]
        folded = combine_rows(pref, sub, d)
        carry = [
            f[:, 0:1] if reverse else f[:, chunk - 1 : chunk] for f in folded
        ]
        outs[c] = folded
    out = [
        jnp.concatenate([outs[c][k] for c in range(nc)], axis=1)
        for k in range(n)
    ]
    return out, carry


def _strip_block_total(rows, combine_rows, d, reverse, init):
    """Per-strip running TOTAL of an (S, Lb) block of elements — the pass-1
    primitive.  Totals need no intra-block scan: each 128-lane chunk is
    folded with UNMASKED circular roll-rounds (the suffix-window fold — the
    total lane's combine chain never reads a wrapped lane, so the per-round
    select-with-identity of the scan drops out), and the chunk totals chain
    through a 1-lane carry column instead of a full-width prefix fold.
    ~35% fewer vector ops than scanning the block (lane COMPACTION — true
    pairwise-halving reduction — does not lower on this Mosaic toolchain:
    strided slices/minor-dim splits are rejected, so log2(128) full-width
    rounds per chunk is the floor).  Returns the updated carry columns."""
    S, Lb = rows[0].shape
    chunk = _SCAN_CHUNK if (Lb > _SCAN_CHUNK and Lb % _SCAN_CHUNK == 0) else Lb
    nc = Lb // chunk
    carry = init
    order = range(nc - 1, -1, -1) if reverse else range(nc)
    for c in order:
        sub = [r[:, c * chunk : (c + 1) * chunk] for r in rows]
        n_rounds = max(1, int(math.ceil(math.log2(chunk)))) if chunk > 1 else 0
        shift = 1
        for _ in range(n_rounds):
            rolled = [_roll(r, shift, reverse) for r in sub]
            sub = combine_rows(rolled, sub, d)
            shift *= 2
        tot = [
            r[:, 0:1] if reverse else r[:, chunk - 1 : chunk] for r in sub
        ]
        carry = combine_rows(carry, tot, d)
    return carry


def _strip_filter_rows(scal_ref, f_ref, q_ref, y_ref, mask_ref, i, d):
    """Shared element construction for the two filter passes: the filtering
    rows for this block's tile, with the global-first special element gated
    by the scal flag (off for time shards that do not own t=0)."""
    d2 = d * d
    S, Lb = f_ref.shape[1], f_ref.shape[2]
    F = [[f_ref[a * d + c] for c in range(d)] for a in range(d)]
    Q = [[q_ref[a * d + c] for c in range(d)] for a in range(d)]
    y = y_ref[0]  # (S, Lb)
    mask = mask_ref[0]
    h = [scal_ref[d2 + k] for k in range(d)]
    r = scal_ref[d2 + d]
    P0v = [[scal_ref[a * d + c] for c in range(d)] for a in range(d)]

    first_here = jnp.logical_and(i == 0, scal_ref[d2 + d + 1] > 0.0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 1)
    is_first = jnp.logical_and(
        jnp.logical_and(sub == 0, lane == 0), jnp.full((S, Lb), first_here)
    )
    rows = _build_filtering_rows(F, Q, y, mask, h, r, P0v, is_first, d)
    return rows, (F, Q, y, mask, h, r, P0v, is_first)


def _strip_filter_scan_kernel(
    scal_ref, f_ref, q_ref, y_ref, mask_ref, totals_out, carry_ref, *, d
):
    """Pass 1: build filtering elements and scan each strip's block —
    emitting ONLY the per-strip running totals.  The scanned element
    planes are deliberately not written: pass 2 rebuilds and re-scans them
    with the strip prefix seeded into its carry, which trades one extra
    in-VMEM scan for (3d²+2d) planes of HBM write+read traffic (the
    dominant cost at large T — BASELINE.md round-3 attribution)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    n = filt_rows(d)
    dtype = f_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.stack(
            _ident_rows_list(
                n, ident_rows, (f_ref.shape[1], carry_ref.shape[2]), dtype
            ),
            axis=0,
        )

    rows, _ = _strip_filter_rows(scal_ref, f_ref, q_ref, y_ref, mask_ref, i, d)
    init = [carry_ref[k, :, 0:1] for k in range(n)]
    edge = _strip_block_total(rows, _filt_combine_rows, d, False, init)
    carry_ref[:] = jnp.broadcast_to(jnp.stack(edge, axis=0), carry_ref.shape)
    totals_out[:] = carry_ref[:]


def _strip_filter_apply_kernel(
    scal_ref,
    pref_ref,
    f_ref,
    q_ref,
    y_ref,
    mask_ref,
    b_out,
    c_out,
    ell_out,
    carry_ref,
    acc_ref,
    *,
    d,
):
    """Pass 2 (recompute form): rebuild the filtering elements and re-scan
    them with the strip prefix seeded into the carry, emitting filtered
    moments + streaming log-likelihood.  The element planes from pass 1
    are never stored to HBM: rebuilding costs one extra in-VMEM scan of
    arithmetic the kernels have to spare (the measured limiter is HBM
    traffic, not combine count — BASELINE.md round-3 attribution), and
    saves (3d²+2d) planes of write+read.

    Seeding the carry with the full strip-prefix ELEMENT makes the scanned
    rows prefix-included directly (prefix ∘ within-strip scan ≡ scan seeded
    by prefix, by associativity), so no separate fold pass exists."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    nB = pl.num_programs(0)
    n = filt_rows(d)
    d2 = d * d
    S, Lb = f_ref.shape[1], f_ref.shape[2]
    dtype = f_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    @pl.when(i == 0)
    def _():
        carry_ref[:] = pref_ref[:]
        acc_ref[0] = jnp.zeros((), dtype)

    rows, (F, Q, y, mask, h, r, P0v, is_first) = _strip_filter_rows(
        scal_ref, f_ref, q_ref, y_ref, mask_ref, i, d
    )
    init = [carry_ref[k, :, 0:1] for k in range(n)]
    out_rows, edge = _strip_chunked_scan(
        rows, _filt_combine_rows, d, ident_rows, False, init
    )
    b_rows = out_rows[d2 : d2 + d]
    c_rows = out_rows[d2 + d : 2 * d2 + d]
    b_out[:] = jnp.stack(b_rows, axis=0)
    c_out[:] = jnp.stack(c_rows, axis=0)

    # Streaming log-likelihood (reference parallel.py:135-151): previous
    # moments are a 1-lane shift; lane 0 comes from the carry — at block 0
    # the carry was just seeded with the strip prefix (the filtered moment
    # at the end of the previous strip), at later blocks it holds the
    # previous block's final prefix-included element.
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

    # Innovation moments via quadratic forms: only the h-projection of the
    # predicted moments is needed, so hF·Pprev·hFᵀ + hQhᵀ replaces
    # materializing the full Pp (2d³ → ~2d² mul/adds per element).
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

    # Carry the full prefix-included element forward (read by the
    # likelihood's lane-0 path ABOVE, so this write must stay last).
    carry_ref[:] = jnp.broadcast_to(jnp.stack(edge, axis=0), carry_ref.shape)

    @pl.when(i == nB - 1)
    def _():
        ell_out[0] = acc_ref[0]


def _strip_exclusive_prefixes(totals, d, combine_rows, ident_rows, reverse, init=None):
    """Exclusive prefixes of the (n, S) strip totals — S−1 tiny combines.

    ``init`` (an (n, 1) element column) seeds the first (last, for reverse)
    strip's prefix instead of the identity — this is how an incoming
    cross-shard prefix is folded into the apply pass for free under the
    two-level distributed scan (no extra HBM pass)."""
    n, S = totals.shape
    if init is None:
        first = [
            jnp.ones((1, 1), totals.dtype)
            if k in ident_rows
            else jnp.zeros((1, 1), totals.dtype)
            for k in range(n)
        ]
    else:
        first = [init[k : k + 1, 0:1].astype(totals.dtype) for k in range(n)]

    def col(s):
        return [totals[k : k + 1, s : s + 1] for k in range(n)]

    prefs = [None] * S
    if not reverse:
        prefs[0] = first
        for s in range(1, S):
            prefs[s] = combine_rows(prefs[s - 1], col(s - 1), d)
    else:
        prefs[S - 1] = first
        for s in range(S - 2, -1, -1):
            prefs[s] = combine_rows(prefs[s + 1], col(s + 1), d)
    cols = [jnp.concatenate(p, axis=0) for p in prefs]  # each (n, 1)
    return jnp.concatenate(cols, axis=1)  # (n, S)


def _strip_filter_prep(Fs_tl, Qs_tl, P0, H, R, observations, block, first_flag):
    """Shared input staging for the strip filter: strip reshape, identity
    end-padding, and the SMEM scalar vector [P0 | h | r | first_flag]."""
    d = P0.shape[0]
    d2 = d * d
    T = Fs_tl.shape[-1]
    dtype = P0.dtype
    S = N_STRIPS

    ys = observations.reshape(T)
    mask = jnp.logical_not(jnp.isnan(ys))
    y = jnp.where(mask, jnp.nan_to_num(ys), 0.0)
    maskf = mask.astype(dtype)

    W = -(-T // (S * block)) * block
    Tp = S * W

    def pad_end(x, fill):
        if Tp == T:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(fill, x.shape[:-1] + (Tp - T,))], axis=-1
        )

    eye_col = jnp.eye(d, dtype=dtype).reshape(d2, 1)
    F_st = pad_end(Fs_tl.reshape(d2, T), eye_col).reshape(d2, S, W)
    Q_st = pad_end(Qs_tl.reshape(d2, T), jnp.zeros((d2, 1), dtype)).reshape(
        d2, S, W
    )
    y_st = pad_end(y[None], jnp.zeros((1, 1), dtype)).reshape(1, S, W)
    m_st = pad_end(maskf[None], jnp.zeros((1, 1), dtype)).reshape(1, S, W)

    scal = jnp.concatenate(
        [
            P0.reshape(d2),
            H[0].astype(dtype),
            R.reshape(1).astype(dtype),
            jnp.asarray(first_flag, dtype).reshape(1),
        ]
    )
    return scal, F_st, Q_st, y_st, m_st, W, Tp


def _strip_filter_pass1(scal, F_st, Q_st, y_st, m_st, d, block, interpret):
    """Pass 1 pallas call: per-strip carry scan → strip totals only (the
    element planes are rebuilt in pass 2 instead of stored)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d2 = d * d
    n = filt_rows(d)
    S, W = F_st.shape[1], F_st.shape[2]
    dtype = F_st.dtype
    B = W // block
    mk = lambda nrows, im: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), im, memory_space=pltpu.VMEM
    )
    fwd = lambda i: (0, 0, i)  # noqa: E731
    return pl.pallas_call(
        partial(_strip_filter_scan_kernel, d=d),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            mk(d2, fwd),
            mk(d2, fwd),
            mk(1, fwd),
            mk(1, fwd),
        ],
        out_specs=pl.BlockSpec(
            (n, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, S, 128), dtype),
        scratch_shapes=[pltpu.VMEM((n, S, 128), dtype)],
        interpret=interpret,
    )(scal, F_st, Q_st, y_st, m_st)


def _strip_filter_pass2(
    scal, prefixes, F_st, Q_st, y_st, m_st, d, block, interpret
):
    """Pass 2 pallas call: rebuild + re-scan with strip prefixes seeded,
    emit moments + ell."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d2 = d * d
    n = filt_rows(d)
    S, W = F_st.shape[1], F_st.shape[2]
    dtype = F_st.dtype
    B = W // block
    pref_v = jnp.broadcast_to(prefixes[:, :, None], (n, S, 128))
    mk = lambda nrows, im: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), im, memory_space=pltpu.VMEM
    )
    fwd = lambda i: (0, 0, i)  # noqa: E731
    return pl.pallas_call(
        partial(_strip_filter_apply_kernel, d=d),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            mk(d2, fwd),
            mk(d2, fwd),
            mk(1, fwd),
            mk(1, fwd),
        ],
        out_specs=(
            mk(d, fwd),
            mk(d2, fwd),
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
    )(scal, pref_v, F_st, Q_st, y_st, m_st)


def strip_filter(
    Fs_tl: Array,
    Qs_tl: Array,
    P0: Array,
    H: Array,
    R: Array,
    observations: Array,
    block: int = DEFAULT_STRIP_BLOCK,
    interpret: bool = False,
):
    """Strip-layout fused filter; returns (b_tl (d,T), C_tl (d,d,T), ell)."""
    d = P0.shape[0]
    d2 = d * d
    T = Fs_tl.shape[-1]
    S = N_STRIPS
    ident_rows = tuple(k * d + k for k in range(d))

    scal, F_st, Q_st, y_st, m_st, W, Tp = _strip_filter_prep(
        Fs_tl, Qs_tl, P0, H, R, observations, block, 1.0
    )
    totals = _strip_filter_pass1(
        scal, F_st, Q_st, y_st, m_st, d, block, interpret
    )
    prefixes = _strip_exclusive_prefixes(
        totals[:, :, 0], d, _filt_combine_rows, ident_rows, reverse=False
    )
    b_st, c_st, ell = _strip_filter_pass2(
        scal, prefixes, F_st, Q_st, y_st, m_st, d, block, interpret
    )
    b_tl = b_st.reshape(d, Tp)[:, :T]
    C_tl = c_st.reshape(d2, Tp)[:, :T].reshape(d, d, T)
    return b_tl, C_tl, ell[0]


def strip_filter_sharded(
    Fs_tl: Array,
    Qs_tl: Array,
    P0: Array,
    H: Array,
    R: Array,
    observations: Array,
    axis_name: str,
    block: int = DEFAULT_STRIP_BLOCK,
    interpret: bool = False,
):
    """Time-axis-sharded strip filter — the fused per-shard local scan of
    the two-level distributed scan (VERDICT r2 item 2).  Call INSIDE a
    ``shard_map`` whose ``axis_name`` shards the last (time) axis; inputs
    carry the local shard (…, T/P).

    The cross-shard combine rides one tiny ``all_gather`` of per-shard total
    elements, and the incoming shard prefix is folded into pass 2's per-strip
    prefixes — the distributed scan costs exactly the single-chip kernels
    plus the collective, with NO extra fix-up pass over HBM (VERDICT r2
    item 5).  Returns (b_tl, C_tl, ell) with ell the GLOBAL log-likelihood
    (psum'd, replicated across shards).  Forward-only, like strip_filter.
    """
    d = P0.shape[0]
    d2 = d * d
    T = Fs_tl.shape[-1]
    dtype = P0.dtype
    S = N_STRIPS
    n = filt_rows(d)
    ident_rows = tuple(k * d + k for k in range(d))

    idx = jax.lax.axis_index(axis_name)
    first_flag = (idx == 0).astype(dtype)

    scal, F_st, Q_st, y_st, m_st, W, Tp = _strip_filter_prep(
        Fs_tl, Qs_tl, P0, H, R, observations, block, first_flag
    )
    totals = _strip_filter_pass1(
        scal, F_st, Q_st, y_st, m_st, d, block, interpret
    )
    local_pref = _strip_exclusive_prefixes(
        totals[:, :, 0], d, _filt_combine_rows, ident_rows, reverse=False
    )
    # Shard total: the last strip's incoming prefix combined with its total.
    # The pack stage's end padding is exactly the identity for the filter
    # (F=I, Q=0, masked y), so the trailing padded lanes cannot contaminate
    # the total — this equals the running element at the last REAL position.
    shard_total = jnp.concatenate(
        _filt_combine_rows(
            [local_pref[k : k + 1, S - 1 : S] for k in range(n)],
            [totals[k : k + 1, S - 1, 0:1] for k in range(n)],
            d,
        ),
        axis=0,
    )  # (n, 1)
    gathered = jax.lax.all_gather(shard_total[:, 0], axis_name, axis=1)  # (n, P)
    shard_prefs = _strip_exclusive_prefixes(
        gathered, d, _filt_combine_rows, ident_rows, reverse=False
    )
    my_pref = jax.lax.dynamic_slice_in_dim(shard_prefs, idx, 1, axis=1)
    prefixes = _strip_exclusive_prefixes(
        totals[:, :, 0],
        d,
        _filt_combine_rows,
        ident_rows,
        reverse=False,
        init=my_pref,
    )
    b_st, c_st, ell = _strip_filter_pass2(
        scal, prefixes, F_st, Q_st, y_st, m_st, d, block, interpret
    )
    b_tl = b_st.reshape(d, Tp)[:, :T]
    C_tl = c_st.reshape(d2, Tp)[:, :T].reshape(d, d, T)
    return b_tl, C_tl, jax.lax.psum(ell[0], axis_name)


def strip_filter_sharded_onechip(
    Fs_tl: Array,
    Qs_tl: Array,
    P0: Array,
    H: Array,
    R: Array,
    observations: Array,
    n_shards: int,
    block: int = DEFAULT_STRIP_BLOCK,
    interpret: bool = False,
):
    """One-device executor of :func:`strip_filter_sharded`'s EXACT per-shard
    program, shards run sequentially: ``axis_index``/``all_gather``/``psum``
    become a host-side loop + concatenation, everything else (prep, the
    pass-1/pass-2 kernels, the prefix folds, the first-flag handling) is the
    same code with the same shapes.

    Purpose (VERDICT r3 item 8): the runtime cannot express an n_shards ≥ 2
    time mesh on ONE physical chip (a jax.sharding.Mesh needs distinct
    devices; v5e has a single core, no megacore), so the pod path's
    nontrivial cross-shard prefixes could otherwise only execute under
    CPU-interpret shard_map tests.  This runs them on real TPU hardware;
    the collective itself is exercised by the 8-virtual-device shard_map
    tests (tests/test_sharded.py)."""
    d = P0.shape[0]
    d2 = d * d
    n = filt_rows(d)
    ident_rows = tuple(k * d + k for k in range(d))
    T = Fs_tl.shape[-1]
    assert T % n_shards == 0
    Tl = T // n_shards
    ys = observations.reshape(T)

    states = []
    shard_totals = []
    for p in range(n_shards):
        sl = slice(p * Tl, (p + 1) * Tl)
        scal, F_st, Q_st, y_st, m_st, W, Tp = _strip_filter_prep(
            Fs_tl[..., sl], Qs_tl[..., sl], P0, H, R, ys[sl], block,
            1.0 if p == 0 else 0.0,
        )
        totals = _strip_filter_pass1(
            scal, F_st, Q_st, y_st, m_st, d, block, interpret
        )
        local_pref = _strip_exclusive_prefixes(
            totals[:, :, 0], d, _filt_combine_rows, ident_rows, reverse=False
        )
        shard_total = jnp.concatenate(
            _filt_combine_rows(
                [local_pref[k : k + 1, N_STRIPS - 1 : N_STRIPS] for k in range(n)],
                [totals[k : k + 1, N_STRIPS - 1, 0:1] for k in range(n)],
                d,
            ),
            axis=0,
        )
        shard_totals.append(shard_total[:, 0])
        states.append((scal, F_st, Q_st, y_st, m_st, totals, Tp))

    gathered = jnp.stack(shard_totals, axis=1)  # (n, P)
    shard_prefs = _strip_exclusive_prefixes(
        gathered, d, _filt_combine_rows, ident_rows, reverse=False
    )
    bs, cs, ells = [], [], []
    for p, (scal, F_st, Q_st, y_st, m_st, totals, Tp) in enumerate(states):
        prefixes = _strip_exclusive_prefixes(
            totals[:, :, 0], d, _filt_combine_rows, ident_rows,
            reverse=False, init=shard_prefs[:, p : p + 1],
        )
        b_st, c_st, ell = _strip_filter_pass2(
            scal, prefixes, F_st, Q_st, y_st, m_st, d, block, interpret
        )
        bs.append(b_st.reshape(d, Tp)[:, :Tl])
        cs.append(c_st.reshape(d2, Tp)[:, :Tl])
        ells.append(ell[0])
    b_tl = jnp.concatenate(bs, axis=-1)
    C_tl = jnp.concatenate(cs, axis=-1).reshape(d, d, T)
    return b_tl, C_tl, sum(ells)


# --------------------------------------------------------------------------
# Batched engine: BATCH on sublanes × time on lanes.
#
# The strip engine above splits ONE series into 8 sublane strips and pays a
# cross-strip prefix fix-up (two kernel passes + tiny glue).  For batched
# work (vmapped MCMC chains / independent GPs — BASELINE.json config 5) the
# batch axis itself fills the sublanes: each sublane is a COMPLETE series,
# so the per-sublane lane scans are independent and the whole filter
# (elements + scan + moments + streaming log-likelihood) is ONE kernel pass
# with a VMEM carry — strictly less machinery than the single-series path.
# Round 1 fell back to the XLA time-last engine under vmap (log2(T) full HBM
# passes); this engine is the batch-aware fused path VERDICT.md item 5 asks
# for, exposed transparently through ``jax.custom_batching.custom_vmap`` on
# the single-series entry points.
# --------------------------------------------------------------------------


def _batched_filter_kernel(
    scal_ref, f_ref, q_ref, y_ref, mask_ref, b_out, c_out, ell_out,
    carry_ref, acc_ref, *, d, nb
):
    """Single-pass batched filter: 8 series on sublanes, carry across time
    blocks.  The (group, time-block) iteration space is flattened to a 1-D
    grid (i = g·nb + b) — time blocks iterate innermost, so the VMEM carry
    resets at each group's first block."""
    import jax.experimental.pallas as pl

    i_b = pl.program_id(0) % nb
    n = filt_rows(d)
    d2 = d * d
    S, Lb = f_ref.shape[1], f_ref.shape[2]
    dtype = f_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    def col(k):
        return jnp.broadcast_to(scal_ref[k, :, 0:1], (S, Lb))

    @pl.when(i_b == 0)
    def _():
        carry_ref[:] = jnp.stack(
            _ident_rows_list(n, ident_rows, (S, carry_ref.shape[2]), dtype),
            axis=0,
        )
        acc_ref[:] = jnp.zeros_like(acc_ref)

    F = [[f_ref[a * d + c] for c in range(d)] for a in range(d)]
    Q = [[q_ref[a * d + c] for c in range(d)] for a in range(d)]
    y = y_ref[0]
    mask = mask_ref[0]
    P0v = [[col(a * d + c) for c in range(d)] for a in range(d)]
    h = [col(d2 + k) for k in range(d)]
    r = col(d2 + d)

    # Every series' first element: lane 0 of time-block 0, ALL sublanes.
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 1)
    lane0 = lane == 0
    is_first = jnp.logical_and(lane0, jnp.full((S, Lb), i_b == 0))
    rows = _build_filtering_rows(F, Q, y, mask, h, r, P0v, is_first, d)
    init = [carry_ref[k, :, 0:1] for k in range(n)]
    out_rows, out_edge = _strip_chunked_scan(
        rows, _filt_combine_rows, d, ident_rows, False, init
    )
    b_rows = out_rows[d2 : d2 + d]
    c_rows = out_rows[d2 + d : 2 * d2 + d]
    b_out[:] = jnp.stack(b_rows, axis=0)
    c_out[:] = jnp.stack(c_rows, axis=0)

    # Streaming log-likelihood (reference parallel.py:135-151): previous
    # moments are a 1-lane shift; lane 0 of each block comes from the carry
    # prefix element's (b, C) — the filtered moments at the end of the
    # previous block — and the series' very first lane uses (0, P0).
    mprev = [
        jnp.where(
            lane0,
            jnp.broadcast_to(carry_ref[d2 + a, :, 0:1], (S, Lb)),
            _roll(b_rows[a], 1, False),
        )
        for a in range(d)
    ]
    Pprev = [
        [
            jnp.where(
                lane0,
                jnp.broadcast_to(
                    carry_ref[d2 + d + a * d + c, :, 0:1], (S, Lb)
                ),
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

    # Innovation moments via quadratic forms: only the h-projection of the
    # predicted moments is needed, so hF·Pprev·hFᵀ + hQhᵀ replaces
    # materializing the full Pp (2d³ → ~2d² mul/adds per element).
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
    logp = jnp.where(mask > 0, logp, 0.0)
    # Per-sublane accumulation: fold the block's lanes into the (S, 128)
    # accumulator in 128-lane chunks (lane-position sums; the host reduces
    # the final 128 lanes).
    acc = acc_ref[:]
    if Lb >= 128:
        for k in range(Lb // 128):
            acc = acc + logp[:, k * 128 : (k + 1) * 128]
    else:  # small test blocks: accumulate into the first Lb lanes
        acc = acc + jnp.concatenate(
            [logp, jnp.zeros((S, 128 - Lb), dtype)], axis=-1
        )
    acc_ref[:] = acc
    ell_out[0] = acc

    carry_ref[:] = jnp.broadcast_to(
        jnp.stack(out_edge, axis=0), carry_ref.shape
    )


def _batched_smoother_kernel(
    h_ref, f_ref, q_ref, b_ref, c_ref, *refs, d, nb, project
):
    """Single-pass batched smoother (reverse over time blocks): 8 series on
    sublanes; the carry holds the suffix element plus the next block's
    boundary F/Q columns; optional fused H-projection (mean/var planes,
    ``project``) on the side.  1-D flattened grid (see the filter kernel)."""
    if project:
        g_out, l_out, mean_out, var_out, carry_ref = refs
    else:
        g_out, l_out, carry_ref = refs
    import jax.experimental.pallas as pl

    i_b = pl.program_id(0) % nb
    n = smooth_rows(d)
    d2 = d * d
    S, Lb = f_ref.shape[1], f_ref.shape[2]
    dtype = f_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    @pl.when(i_b == 0)
    def _():
        pre = jnp.stack(
            _ident_rows_list(n, ident_rows, (S, carry_ref.shape[2]), dtype),
            axis=0,
        )
        carry_ref[0:n] = pre
        carry_ref[n:] = jnp.zeros_like(carry_ref[n:])

    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 1)
    is_last_lane = lane == (Lb - 1)

    def next_val(base_ref, k, stash_row):
        rolled = _roll(base_ref[k], 1, True)
        stash = jnp.broadcast_to(
            carry_ref[n + stash_row + k, :, 0:1], (S, Lb)
        )
        return jnp.where(is_last_lane, stash, rolled)

    Fn = [[next_val(f_ref, a * d + c, 0) for c in range(d)] for a in range(d)]
    Qn = [[next_val(q_ref, a * d + c, d2) for c in range(d)] for a in range(d)]
    m = [b_ref[a] for a in range(d)]
    P = [[c_ref[a * d + c] for c in range(d)] for a in range(d)]

    # Every series' LAST element: last lane of the last time block, which is
    # grid step 0 of the reverse walk.
    is_global_last = jnp.logical_and(
        is_last_lane, jnp.full((S, Lb), i_b == 0)
    )
    rows = _build_smoothing_rows(Fn, Qn, m, P, is_global_last, d)
    init = [carry_ref[k, :, 0:1] for k in range(n)]
    out_rows, out_edge = _strip_chunked_scan(
        rows, _smooth_combine_rows, d, ident_rows, True, init
    )
    g_rows = out_rows[d2 : d2 + d]
    l_rows = out_rows[d2 + d :]
    g_out[:] = jnp.stack(g_rows, axis=0)
    l_out[:] = jnp.stack(l_rows, axis=0)

    if project:
        # Fused H-projection: posterior mean/variance of f, straight to planes.
        h = [jnp.broadcast_to(h_ref[k, :, 0:1], (S, Lb)) for k in range(d)]
        mean_out[0] = sum(h[a] * g_rows[a] for a in range(d))
        var_out[0] = sum(
            h[a] * h[c] * l_rows[a * d + c] for a in range(d) for c in range(d)
        )

    carry_ref[0:n] = jnp.broadcast_to(
        jnp.stack(out_edge, axis=0), (n,) + carry_ref.shape[1:]
    )
    carry_ref[n : n + d2] = jnp.broadcast_to(
        f_ref[:][:, :, 0:1], (d2,) + carry_ref.shape[1:]
    )
    carry_ref[n + d2 :] = jnp.broadcast_to(
        q_ref[:][:, :, 0:1], (d2,) + carry_ref.shape[1:]
    )


def _pad_batch(x, B_pad, axis):
    B = x.shape[axis]
    if B == B_pad:
        return x
    reps = [x.take(jnp.asarray([B - 1]), axis=axis)] * (B_pad - B)
    return jnp.concatenate([x] + reps, axis=axis)


def batched_strip_filter(
    Fs_bt: Array,  # (d, d, B, T)
    Qs_bt: Array,
    P0_b: Array,  # (B, d, d)
    H_b: Array,  # (B, 1, d)
    R_b: Array,  # (B, 1, 1)
    ys_b: Array,  # (B, T)
    block: int = DEFAULT_STRIP_BLOCK,
    interpret: bool = False,
):
    """Batched fused filter; returns (b (d, B, T), C (d, d, B, T), ell (B,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if block > 128 and block % 128 != 0:
        # The per-sublane log-likelihood accumulator folds lanes in 128-wide
        # chunks; a trailing partial chunk would be silently dropped.
        raise ValueError(f"block must be <=128 or a multiple of 128, got {block}")
    d = P0_b.shape[-1]
    d2 = d * d
    B, T = ys_b.shape
    dtype = P0_b.dtype
    S = N_STRIPS
    B_pad = -(-B // S) * S
    G = B_pad // S
    NB = -(-T // block)
    Tp = NB * block

    mask = jnp.logical_not(jnp.isnan(ys_b))
    y = jnp.where(mask, jnp.nan_to_num(ys_b), 0.0)
    maskf = mask.astype(dtype)

    def pad(x, fill):  # pad batch (axis -2) and time (axis -1, at the END)
        x = _pad_batch(x, B_pad, x.ndim - 2)
        if Tp != T:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(fill, x.shape[:-1] + (Tp - T,))], axis=-1
            )
        return x

    eye_col = jnp.eye(d, dtype=dtype).reshape(d2, 1, 1)
    F_p = pad(Fs_bt.reshape(d2, B, T), eye_col)
    Q_p = pad(Qs_bt.reshape(d2, B, T), jnp.zeros((d2, 1, 1), dtype))
    y_p = pad(y[None], jnp.zeros((1, 1, 1), dtype))
    m_p = pad(maskf[None], jnp.zeros((1, 1, 1), dtype))

    # Per-series scalars, broadcast along a 128-lane axis:
    # rows = [P0 (d²), h (d), r (1)].
    scal = jnp.concatenate(
        [
            jnp.moveaxis(P0_b.reshape(B, d2), 0, 1),
            jnp.moveaxis(H_b.reshape(B, d).astype(dtype), 0, 1),
            jnp.moveaxis(R_b.reshape(B, 1).astype(dtype), 0, 1),
        ],
        axis=0,
    )  # (nscal, B)
    scal = _pad_batch(scal, B_pad, 1)
    scal_v = jnp.broadcast_to(scal[:, :, None], scal.shape + (128,))

    n = filt_rows(d)
    mk = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, block),
        lambda i: (0, i // NB, i % NB),
        memory_space=pltpu.VMEM,
    )
    cst = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, 128),
        lambda i: (0, i // NB, 0),
        memory_space=pltpu.VMEM,
    )

    b_p, c_p, ell_p = pl.pallas_call(
        partial(_batched_filter_kernel, d=d, nb=NB),
        grid=(G * NB,),
        in_specs=[cst(d2 + d + 1), mk(d2), mk(d2), mk(1), mk(1)],
        out_specs=(mk(d), mk(d2), cst(1)),
        out_shape=(
            jax.ShapeDtypeStruct((d, B_pad, Tp), dtype),
            jax.ShapeDtypeStruct((d2, B_pad, Tp), dtype),
            jax.ShapeDtypeStruct((1, B_pad, 128), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, S, 128), dtype),
            pltpu.VMEM((S, 128), dtype),
        ],
        interpret=interpret,
    )(scal_v, F_p, Q_p, y_p, m_p)

    b_bt = b_p[:, :B, :T]
    C_bt = c_p[:, :B, :T].reshape(d, d, B, T)
    ell = jnp.sum(ell_p[0, :B, :], axis=-1)
    return b_bt, C_bt, ell


def batched_strip_smoother(
    Fs_bt: Array,  # (d, d, B, T)
    Qs_bt: Array,
    b_bt: Array,  # (d, B, T)
    C_bt: Array,  # (d, d, B, T)
    H_b: Array,  # (B, 1, d)
    block: int = DEFAULT_STRIP_BLOCK,
    interpret: bool = False,
    project: bool = True,
):
    """Batched fused smoother; returns (g (d, B, T), L (d, d, B, T),
    mean (B, T), var (B, T)) — the last two are the fused H-projections,
    or (g, L) alone with ``project=False`` (callers that only need the
    state moments skip two (B, T) output planes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = b_bt.shape[0]
    d2 = d * d
    B, T = b_bt.shape[-2:]
    dtype = b_bt.dtype
    S = N_STRIPS
    B_pad = -(-B // S) * S
    G = B_pad // S
    NB = -(-T // block)
    Tp = NB * block
    pad_t = Tp - T

    def pad(x, fill):  # batch pad + FRONT time pad (reverse scan)
        x = _pad_batch(x, B_pad, x.ndim - 2)
        if pad_t:
            x = jnp.concatenate(
                [jnp.broadcast_to(fill, x.shape[:-1] + (pad_t,)), x], axis=-1
            )
        return x

    eye_col = jnp.eye(d, dtype=dtype).reshape(d2, 1, 1)
    # Front padding with (F=I, Q=0, m=0, P=I) yields exact identity
    # smoothing elements (E=I, g=0, L=0), so the suffix flows through
    # unchanged into the (discarded) padded prefix.
    F_p = pad(Fs_bt.reshape(d2, B, T), eye_col)
    Q_p = pad(Qs_bt.reshape(d2, B, T), jnp.zeros((d2, 1, 1), dtype))
    b_p = pad(b_bt, jnp.zeros((d, 1, 1), dtype))
    c_p = pad(C_bt.reshape(d2, B, T), eye_col)

    h = jnp.moveaxis(H_b.reshape(B, d).astype(dtype), 0, 1)  # (d, B)
    h = _pad_batch(h, B_pad, 1)
    h_v = jnp.broadcast_to(h[:, :, None], h.shape + (128,))

    n = smooth_rows(d)
    rev = lambda i: (0, i // NB, NB - 1 - i % NB)  # noqa: E731
    mk = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), rev, memory_space=pltpu.VMEM
    )
    cst = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, 128),
        lambda i: (0, i // NB, 0),
        memory_space=pltpu.VMEM,
    )

    out_specs = (mk(d), mk(d2)) + ((mk(1), mk(1)) if project else ())
    out_shape = (
        jax.ShapeDtypeStruct((d, B_pad, Tp), dtype),
        jax.ShapeDtypeStruct((d2, B_pad, Tp), dtype),
    ) + (
        (
            jax.ShapeDtypeStruct((1, B_pad, Tp), dtype),
            jax.ShapeDtypeStruct((1, B_pad, Tp), dtype),
        )
        if project
        else ()
    )
    outs = pl.pallas_call(
        partial(_batched_smoother_kernel, d=d, nb=NB, project=project),
        grid=(G * NB,),
        in_specs=[cst(d), mk(d2), mk(d2), mk(d), mk(d2)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((n + 2 * d2, S, 128), dtype)],
        interpret=interpret,
    )(h_v, F_p, Q_p, b_p, c_p)

    g_p, l_p = outs[0], outs[1]
    g_bt = g_p[:, :B, pad_t:]
    L_bt = l_p[:, :B, pad_t:].reshape(d, d, B, T)
    if not project:
        return g_bt, L_bt
    mean_p, var_p = outs[2], outs[3]
    return g_bt, L_bt, mean_p[0, :B, pad_t:], var_p[0, :B, pad_t:]


# --------------------------------------------------------------------------
# custom_vmap wiring: vmapping the single-series fused entry points (batched
# GPs / MCMC chains) dispatches to the batched-sublane kernels above instead
# of failing at Mosaic lowering (round 1 required config.set_pallas_lml(False)
# and fell back to the XLA engine's log2(T) HBM passes).
# --------------------------------------------------------------------------


def _bcast(x, axis_size, batched):
    """Bring an operand to a leading batch axis (broadcast if unbatched)."""
    if batched:
        return x
    return jnp.broadcast_to(x[None], (axis_size,) + x.shape)


@lru_cache(maxsize=None)
def strip_filter_op(block: int = DEFAULT_STRIP_BLOCK, interpret: bool = False):
    """(Fs_tl, Qs_tl, P0, H, R, ys) -> (b_tl, C_tl, ell), vmappable."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(Fs_tl, Qs_tl, P0, H, R, ys):
        return strip_filter(
            Fs_tl, Qs_tl, P0, H, R, ys, block=block, interpret=interpret
        )

    @op.def_vmap
    def _rule(axis_size, in_batched, Fs, Qs, P0, H, R, ys):  # noqa: ANN001
        fb, qb, pb, hb, rb, yb = in_batched
        B = axis_size
        Fs_bt = jnp.moveaxis(_bcast(Fs, B, fb), 0, 2)  # (d, d, B, T)
        Qs_bt = jnp.moveaxis(_bcast(Qs, B, qb), 0, 2)
        P0_b = _bcast(P0, B, pb)
        H_b = _bcast(H, B, hb)
        R_b = _bcast(R, B, rb)
        ys_b = _bcast(ys, B, yb).reshape(B, -1)
        b, C, ell = batched_strip_filter(
            Fs_bt, Qs_bt, P0_b, H_b, R_b, ys_b,
            block=block, interpret=interpret,
        )
        return (
            (jnp.moveaxis(b, 1, 0), jnp.moveaxis(C, 2, 0), ell),
            (True, True, True),
        )

    return op


@lru_cache(maxsize=None)
def strip_smoother_op(block: int = DEFAULT_STRIP_BLOCK, interpret: bool = False):
    """(Fs_tl, Qs_tl, b_tl, C_tl) -> (g_tl, L_tl), vmappable."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def op(Fs_tl, Qs_tl, b_tl, C_tl):
        return strip_smoother(
            Fs_tl, Qs_tl, b_tl, C_tl, block=block, interpret=interpret
        )

    @op.def_vmap
    def _rule(axis_size, in_batched, Fs, Qs, b_tl, C_tl):  # noqa: ANN001
        fb, qb, bb, cb = in_batched
        B = axis_size
        Fs_bt = jnp.moveaxis(_bcast(Fs, B, fb), 0, 2)
        Qs_bt = jnp.moveaxis(_bcast(Qs, B, qb), 0, 2)
        b_bt = jnp.moveaxis(_bcast(b_tl, B, bb), 0, 1)  # (d, B, T)
        C_bt = jnp.moveaxis(_bcast(C_tl, B, cb), 0, 2)
        d = b_bt.shape[0]
        # H only feeds the projection outputs, skipped here (project=False).
        H_b = jnp.zeros((B, 1, d), b_bt.dtype)
        g, L = batched_strip_smoother(
            Fs_bt, Qs_bt, b_bt, C_bt, H_b,
            block=block, interpret=interpret, project=False,
        )
        return (jnp.moveaxis(g, 1, 0), jnp.moveaxis(L, 2, 0)), (True, True)

    return op


def _strip_smoother_rows(
    scal_ref, f_ref, q_ref, b_ref, c_ref, fb_ref, qb_ref, carry_ref, i, d, pad
):
    """Shared smoothing-element construction for the two smoother passes:
    cross-block F/Q columns ride the carry stash (rows n..n+2d²); the
    cross-strip boundary columns come from fb/qb.  ``scal_ref[0]`` gates
    the global-last special element off for time shards that do not own
    t=T−1.  Front-pad positions (static ``pad`` > 0) are forced to the
    identity element so strip totals stay pure-real — the pad/real
    boundary element is otherwise NOT the identity (it reads the first
    real F/Q column), which would contaminate cross-shard totals."""
    import jax.experimental.pallas as pl

    n = smooth_rows(d)
    d2 = d * d
    S, Lb = f_ref.shape[1], f_ref.shape[2]
    dtype = f_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (S, Lb), 0)
    is_last_lane = lane == (Lb - 1)

    def next_val(base_ref, k, stash_row, bound_ref):
        rolled = _roll(base_ref[k], 1, True)
        stash = carry_ref[n + stash_row + k, :, 0:1]
        bound = bound_ref[k, :, 0:1]
        col = jnp.where(i == 0, bound, stash)
        return jnp.where(is_last_lane, jnp.broadcast_to(col, (S, Lb)), rolled)

    Fn = [[next_val(f_ref, a * d + c, 0, fb_ref) for c in range(d)] for a in range(d)]
    Qn = [
        [next_val(q_ref, a * d + c, d2, qb_ref) for c in range(d)]
        for a in range(d)
    ]
    m = [b_ref[a] for a in range(d)]
    P = [[c_ref[a * d + c] for c in range(d)] for a in range(d)]

    last_here = jnp.logical_and(i == 0, scal_ref[0] > 0.0)
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
        rows = [
            jnp.where(is_pad, idr, r) for idr, r in zip(idents, rows)
        ]
    return rows


def _strip_smoother_scan_kernel(
    scal_ref, f_ref, q_ref, b_ref, c_ref, fb_ref, qb_ref, totals_out,
    carry_ref, *, d, pad
):
    """Pass 1 (reverse): build smoothing elements in-VMEM and scan blocks
    right-to-left per strip, emitting ONLY the per-strip totals — pass 2
    rebuilds and re-scans with the strip suffix seeded (same traffic trade
    as the filter: one extra in-VMEM scan for (2d²+d) planes of HBM
    write+read)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    n = smooth_rows(d)
    d2 = d * d
    S = f_ref.shape[1]
    dtype = f_ref.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    @pl.when(i == 0)
    def _():
        pre = jnp.stack(
            _ident_rows_list(n, ident_rows, (S, carry_ref.shape[2]), dtype),
            axis=0,
        )
        carry_ref[0:n] = pre
        carry_ref[n:] = jnp.zeros_like(carry_ref[n:])

    rows = _strip_smoother_rows(
        scal_ref, f_ref, q_ref, b_ref, c_ref, fb_ref, qb_ref, carry_ref, i,
        d, pad
    )
    init = [carry_ref[k, :, 0:1] for k in range(n)]
    edge = _strip_block_total(rows, _smooth_combine_rows, d, True, init)
    carry_ref[0:n] = jnp.broadcast_to(
        jnp.stack(edge, axis=0), (n,) + carry_ref.shape[1:]
    )
    carry_ref[n : n + d2] = jnp.broadcast_to(
        f_ref[:][:, :, 0:1], (d2,) + carry_ref.shape[1:]
    )
    carry_ref[n + d2 :] = jnp.broadcast_to(
        q_ref[:][:, :, 0:1], (d2,) + carry_ref.shape[1:]
    )
    totals_out[:] = carry_ref[0:n]


def _strip_smoother_apply_kernel(
    scal_ref, pref_ref, f_ref, q_ref, b_ref, c_ref, fb_ref, qb_ref,
    g_out, l_out, carry_ref, *, d, pad
):
    """Pass 2 (recompute form): rebuild the smoothing elements and re-scan
    right-to-left with the strip suffix seeded into the carry, emitting the
    smoothed moments directly (prefix ∘ scan ≡ scan seeded by prefix)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    n = smooth_rows(d)
    d2 = d * d
    ident_rows = tuple(k * d + k for k in range(d))

    @pl.when(i == 0)
    def _():
        carry_ref[0:n] = pref_ref[:]
        carry_ref[n:] = jnp.zeros_like(carry_ref[n:])

    rows = _strip_smoother_rows(
        scal_ref, f_ref, q_ref, b_ref, c_ref, fb_ref, qb_ref, carry_ref, i,
        d, pad
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
    carry_ref[n : n + d2] = jnp.broadcast_to(
        f_ref[:][:, :, 0:1], (d2,) + carry_ref.shape[1:]
    )
    carry_ref[n + d2 :] = jnp.broadcast_to(
        q_ref[:][:, :, 0:1], (d2,) + carry_ref.shape[1:]
    )


def _strip_smoother_prep(Fs_tl, Qs_tl, b_tl, C_tl, block, fb_last, qb_last):
    """Shared input staging for the strip smoother: strip reshape, identity
    FRONT-padding (reverse scan), and the cross-strip boundary F/Q columns.
    ``fb_last``/``qb_last`` are the boundary columns for the LAST strip —
    identity/zero on a single chip (unused at the global last element), the
    next shard's first F/Q column under sharding."""
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
    F_st = pad_front(Fs_tl.reshape(d2, T), eye_col).reshape(d2, S, W)
    Q_st = pad_front(Qs_tl.reshape(d2, T), jnp.zeros((d2, 1), dtype)).reshape(
        d2, S, W
    )
    b_st = pad_front(b_tl, jnp.zeros((d, 1), dtype)).reshape(d, S, W)
    c_st = pad_front(C_tl.reshape(d2, T), eye_col).reshape(d2, S, W)

    # Cross-strip boundary F/Q: strip s's last element needs the column at
    # global (s+1)·W — the first column of strip s+1.
    fb = jnp.concatenate([F_st[:, 1:, 0], fb_last.reshape(d2, 1)], axis=1)
    qb = jnp.concatenate([Q_st[:, 1:, 0], qb_last.reshape(d2, 1)], axis=1)
    fb_v = jnp.broadcast_to(fb[:, :, None], (d2, S, 128))
    qb_v = jnp.broadcast_to(qb[:, :, None], (d2, S, 128))
    return F_st, Q_st, b_st, c_st, fb_v, qb_v, W, Tp, pad


def _strip_smoother_pass1(
    scal, F_st, Q_st, b_st, c_st, fb_v, qb_v, d, block, interpret, pad
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d2 = d * d
    n = smooth_rows(d)
    S, W = F_st.shape[1], F_st.shape[2]
    dtype = F_st.dtype
    B = W // block
    rev = lambda i: (0, 0, B - 1 - i)  # noqa: E731
    mk = lambda nrows, im: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), im, memory_space=pltpu.VMEM
    )
    cst = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_strip_smoother_scan_kernel, d=d, pad=pad),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            mk(d2, rev),
            mk(d2, rev),
            mk(d, rev),
            mk(d2, rev),
            cst(d2),
            cst(d2),
        ],
        out_specs=cst(n),
        out_shape=jax.ShapeDtypeStruct((n, S, 128), dtype),
        scratch_shapes=[pltpu.VMEM((n + 2 * d2, S, 128), dtype)],
        interpret=interpret,
    )(scal, F_st, Q_st, b_st, c_st, fb_v, qb_v)


def _strip_smoother_pass2(
    scal, prefixes, F_st, Q_st, b_st, c_st, fb_v, qb_v, d, block, interpret,
    pad,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d2 = d * d
    n = smooth_rows(d)
    S, W = F_st.shape[1], F_st.shape[2]
    dtype = F_st.dtype
    B = W // block
    pref_v = jnp.broadcast_to(prefixes[:, :, None], (n, S, 128))
    rev = lambda i: (0, 0, B - 1 - i)  # noqa: E731
    mk = lambda nrows, im: pl.BlockSpec(  # noqa: E731
        (nrows, S, block), im, memory_space=pltpu.VMEM
    )
    cst = lambda nrows: pl.BlockSpec(  # noqa: E731
        (nrows, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_strip_smoother_apply_kernel, d=d, pad=pad),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            cst(n),
            mk(d2, rev),
            mk(d2, rev),
            mk(d, rev),
            mk(d2, rev),
            cst(d2),
            cst(d2),
        ],
        out_specs=(mk(d, rev), mk(d2, rev)),
        out_shape=(
            jax.ShapeDtypeStruct((d, S, W), dtype),
            jax.ShapeDtypeStruct((d2, S, W), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((n + 2 * d2, S, 128), dtype)],
        interpret=interpret,
    )(scal, pref_v, F_st, Q_st, b_st, c_st, fb_v, qb_v)


def strip_smoother(
    Fs_tl: Array,
    Qs_tl: Array,
    b_tl: Array,
    C_tl: Array,
    block: int = DEFAULT_STRIP_BLOCK,
    interpret: bool = False,
):
    """Strip-layout fused smoother; returns (g_tl (d,T), L_tl (d,d,T))."""
    d = b_tl.shape[0]
    d2 = d * d
    T = b_tl.shape[-1]
    dtype = b_tl.dtype
    ident_rows = tuple(k * d + k for k in range(d))

    eye_col = jnp.eye(d, dtype=dtype).reshape(d2)
    F_st, Q_st, b_st, c_st, fb_v, qb_v, W, Tp, pad = _strip_smoother_prep(
        Fs_tl, Qs_tl, b_tl, C_tl, block, eye_col, jnp.zeros((d2,), dtype)
    )
    scal = jnp.ones((1,), dtype)  # owns the global last element
    totals = _strip_smoother_pass1(
        scal, F_st, Q_st, b_st, c_st, fb_v, qb_v, d, block, interpret, pad
    )
    prefixes = _strip_exclusive_prefixes(
        totals[:, :, 0], d, _smooth_combine_rows, ident_rows, reverse=True
    )
    g_st, l_st = _strip_smoother_pass2(
        scal, prefixes, F_st, Q_st, b_st, c_st, fb_v, qb_v, d, block,
        interpret, pad,
    )
    g_tl = g_st.reshape(d, Tp)[:, pad:]
    L_tl = l_st.reshape(d2, Tp)[:, pad:].reshape(d, d, T)
    return g_tl, L_tl


def strip_smoother_sharded_onechip(
    Fs_tl: Array,
    Qs_tl: Array,
    b_tl: Array,
    C_tl: Array,
    n_shards: int,
    block: int = DEFAULT_STRIP_BLOCK,
    interpret: bool = False,
):
    """One-device executor of :func:`strip_smoother_sharded`'s per-shard
    program (see :func:`strip_filter_sharded_onechip`): the ``ppermute`` of
    the next shard's first F/Q column and the suffix-total ``all_gather``
    become explicit slices over the sequential shard loop."""
    d = b_tl.shape[0]
    d2 = d * d
    dtype = b_tl.dtype
    n = smooth_rows(d)
    ident_rows = tuple(k * d + k for k in range(d))
    T = b_tl.shape[-1]
    assert T % n_shards == 0
    Tl = T // n_shards

    states = []
    shard_totals = []
    for p in range(n_shards):
        sl = slice(p * Tl, (p + 1) * Tl)
        last = p == n_shards - 1
        if last:
            fb_last = jnp.zeros((d2,), dtype)
            qb_last = jnp.zeros((d2,), dtype)
        else:
            fb_last = Fs_tl[:, :, (p + 1) * Tl].reshape(d2)
            qb_last = Qs_tl[:, :, (p + 1) * Tl].reshape(d2)
        F_st, Q_st, b_st, c_st, fb_v, qb_v, W, Tp, pad = _strip_smoother_prep(
            Fs_tl[..., sl], Qs_tl[..., sl], b_tl[..., sl], C_tl[..., sl],
            block, fb_last, qb_last,
        )
        scal = jnp.asarray(1.0 if last else 0.0, dtype).reshape(1)
        totals = _strip_smoother_pass1(
            scal, F_st, Q_st, b_st, c_st, fb_v, qb_v, d, block, interpret,
            pad,
        )
        local_pref = _strip_exclusive_prefixes(
            totals[:, :, 0], d, _smooth_combine_rows, ident_rows,
            reverse=True,
        )
        shard_total = jnp.concatenate(
            _smooth_combine_rows(
                [local_pref[k : k + 1, 0:1] for k in range(n)],
                [totals[k : k + 1, 0, 0:1] for k in range(n)],
                d,
            ),
            axis=0,
        )
        shard_totals.append(shard_total[:, 0])
        states.append((scal, F_st, Q_st, b_st, c_st, fb_v, qb_v, totals, Tp,
                       pad))

    gathered = jnp.stack(shard_totals, axis=1)
    shard_prefs = _strip_exclusive_prefixes(
        gathered, d, _smooth_combine_rows, ident_rows, reverse=True
    )
    gs, ls = [], []
    for p, (scal, F_st, Q_st, b_st, c_st, fb_v, qb_v, totals, Tp, pad) in (
        enumerate(states)
    ):
        prefixes = _strip_exclusive_prefixes(
            totals[:, :, 0], d, _smooth_combine_rows, ident_rows,
            reverse=True, init=shard_prefs[:, p : p + 1],
        )
        g_st, l_st = _strip_smoother_pass2(
            scal, prefixes, F_st, Q_st, b_st, c_st, fb_v, qb_v, d, block,
            interpret, pad,
        )
        gs.append(g_st.reshape(d, Tp)[:, pad:])
        ls.append(l_st.reshape(d2, Tp)[:, pad:])
    g = jnp.concatenate(gs, axis=-1)
    L = jnp.concatenate(ls, axis=-1).reshape(d, d, T)
    return g, L


def strip_smoother_sharded(
    Fs_tl: Array,
    Qs_tl: Array,
    b_tl: Array,
    C_tl: Array,
    axis_name: str,
    block: int = DEFAULT_STRIP_BLOCK,
    interpret: bool = False,
):
    """Time-axis-sharded strip smoother (reverse scan) — see
    :func:`strip_filter_sharded`.  Call inside ``shard_map``; the local
    shard's last smoothing element needs the NEXT shard's first F/Q column
    (one ``ppermute``), and the incoming cross-shard suffix is folded into
    pass 2's per-strip prefixes.  Returns local (g_tl, L_tl)."""
    d = b_tl.shape[0]
    d2 = d * d
    T = b_tl.shape[-1]
    dtype = b_tl.dtype
    n = smooth_rows(d)
    ident_rows = tuple(k * d + k for k in range(d))

    idx = jax.lax.axis_index(axis_name)
    n_sh = jax.lax.axis_size(axis_name)
    last_flag = (idx == n_sh - 1).astype(dtype)

    # Next shard's first F/Q column (zeros into the last shard — unused
    # there: its boundary position is the global last element).
    perm = [(k + 1, k) for k in range(n_sh - 1)]
    fb_last = jax.lax.ppermute(Fs_tl[:, :, 0].reshape(d2), axis_name, perm)
    qb_last = jax.lax.ppermute(Qs_tl[:, :, 0].reshape(d2), axis_name, perm)

    F_st, Q_st, b_st, c_st, fb_v, qb_v, W, Tp, pad = _strip_smoother_prep(
        Fs_tl, Qs_tl, b_tl, C_tl, block, fb_last, qb_last
    )
    scal = last_flag.reshape(1)
    totals = _strip_smoother_pass1(
        scal, F_st, Q_st, b_st, c_st, fb_v, qb_v, d, block, interpret, pad
    )
    local_pref = _strip_exclusive_prefixes(
        totals[:, :, 0], d, _smooth_combine_rows, ident_rows, reverse=True
    )
    # Shard suffix-total: strip 0's incoming suffix combined with its total.
    # Front-pad positions are forced to the identity element in-kernel
    # (_strip_smoother_rows), so the raw totals are pure-real and this
    # equals the running element at the first REAL position.
    shard_total = jnp.concatenate(
        _smooth_combine_rows(
            [local_pref[k : k + 1, 0:1] for k in range(n)],
            [totals[k : k + 1, 0, 0:1] for k in range(n)],
            d,
        ),
        axis=0,
    )  # (n, 1)
    gathered = jax.lax.all_gather(shard_total[:, 0], axis_name, axis=1)
    shard_prefs = _strip_exclusive_prefixes(
        gathered, d, _smooth_combine_rows, ident_rows, reverse=True
    )
    my_pref = jax.lax.dynamic_slice_in_dim(shard_prefs, idx, 1, axis=1)
    prefixes = _strip_exclusive_prefixes(
        totals[:, :, 0],
        d,
        _smooth_combine_rows,
        ident_rows,
        reverse=True,
        init=my_pref,
    )
    g_st, l_st = _strip_smoother_pass2(
        scal, prefixes, F_st, Q_st, b_st, c_st, fb_v, qb_v, d, block,
        interpret, pad,
    )
    g_tl = g_st.reshape(d, Tp)[:, pad:]
    L_tl = l_st.reshape(d2, Tp)[:, pad:].reshape(d, d, T)
    return g_tl, L_tl
