"""Fused Pallas TPU kernels for the associative Kalman scans (d ≤ 3).

The XLA time-last engine (kalman/timelast.py) runs each Kogge-Stone round as
a separate HBM pass (~20 rounds at T=10⁶ → ~20× the optimal memory traffic).
These kernels fuse the whole *local* scan: each grid step DMAs one block of
element planes into VMEM, runs every round in-register/VMEM, and writes the
scanned block plus its total back once — HBM traffic drops to one read and
one write of the planes per phase.

Layout: element components are packed as rows of a (n_comp, T) plane so the
time axis is the 128-lane dimension and components are sublanes:
  filtering:  rows = [A(d²), b(d), C(d²), J(d²), eta(d)]   (3d² + 2d rows)
  smoothing:  rows = [E(d²), g(d), L(d²)]                   (2d² + d rows)

Three-phase structure (same math as ops/scan.py's blocked scan):
  1. kernel: per-block inclusive Kogge-Stone scan + emit block totals;
  2. host: exclusive prefix of the B block totals (tiny, XLA);
  3. kernel: combine each block's incoming prefix into its scanned elements.

Correctness is pinned against the XLA engine in tests (interpret mode on
CPU; native on TPU).  Everything is wrapped in a ``jax.custom_vjp``-free,
purely functional API — gradients are NOT defined through the Pallas path
(the XLA time-last engine is used under ``jax.grad``; see ``pkf``'s engine
dispatch).
"""
from __future__ import annotations

import math
from functools import partial

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


def _plus_eye(a, d):
    return [
        [a[i][j] + (1.0 if i == j else 0.0) for j in range(d)]
        for i in range(d)
    ]


def _inv(M, d):
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
    raise ValueError(f"pallas scan supports d <= 3, got {d}")


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


def _filt_combine(X1, X2, d):
    """filtering_operator on packed planes (row lists of (1, L))."""
    A1, b1, C1, J1, eta1 = _filt_unpack(X1, d)
    A2, b2, C2, J2, eta2 = _filt_unpack(X2, d)
    U = _mm(A2, _inv(_plus_eye(_mm(C1, J2, d), d), d), d)
    A = _mm(U, A1, d)
    b = _vadd(_mv(U, _vadd(b1, _mv(C1, eta2, d), d), d), b2, d)
    C = _madd(_mm(_mm(U, C1, d), _mt(A2, d), d), C2, d)
    W = _mm(_mt(A1, d), _inv(_plus_eye(_mm(J2, C1, d), d), d), d)
    eta = _vadd(_mv(W, _vsub(eta2, _mv(J2, b1, d), d), d), eta1, d)
    J = _madd(_mm(_mm(W, J2, d), A1, d), J1, d)
    return _filt_pack(A, b, _sym(C, d), _sym(J, d), eta, d)


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


def _smooth_combine(X1, X2, d):
    E1, g1, L1 = _smooth_unpack(X1, d)
    E2, g2, L2 = _smooth_unpack(X2, d)
    E = _mm(E2, E1, d)
    g = _vadd(_mv(E2, g1, d), g2, d)
    L = _madd(_mm(_mm(E2, L1, d), _mt(E2, d), d), L2, d)
    return _smooth_pack(E, g, L, d)


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


def _apply_prefix_kernel(x_ref, pref_ref, out_ref, *, d, combine):
    """Phase 3: combine the block's incoming prefix into every element.

    ``pref_ref`` carries the full (n, B) prefix table (lane-aligned block
    specs can't deliver single columns); the block's own column is selected
    by grid position."""
    import jax.experimental.pallas as pl

    X = x_ref[:]
    n, L = X.shape
    i = pl.program_id(0)
    # Mosaic can't vector-load one dynamic lane; select column i with a
    # masked lane reduction instead (B is tiny).
    table = pref_ref[:]  # (n, B)
    lane = jax.lax.broadcasted_iota(jnp.int32, table.shape, 1)
    col = jnp.sum(
        jnp.where(lane == i, table, jnp.zeros_like(table)),
        axis=1,
        keepdims=True,
    )  # (n, 1)
    P = jnp.broadcast_to(col, (n, L))
    out_ref[:] = combine(_split_rows(P, n), _split_rows(X, n), d)


def _exclusive_prefix_host(combine_tl, totals, ident_col, reverse):
    """Exclusive prefix of the (n, B) block totals, as in ops/scan.py."""
    if reverse:
        totals = jnp.flip(totals, axis=-1)

    def op(a, b):
        n = a.shape[0]
        return combine_tl(
            [a[i : i + 1] for i in range(n)], [b[i : i + 1] for i in range(n)]
        )

    inclusive = jax.lax.associative_scan(op, totals, axis=-1)
    prefixes = jnp.concatenate(
        [ident_col.astype(totals.dtype), inclusive[:, :-1]], axis=-1
    )
    if reverse:
        prefixes = jnp.flip(prefixes, axis=-1)
    return prefixes


def pallas_plane_scan(
    planes: Array,
    d: int,
    kind: str,
    reverse: bool = False,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> Array:
    """Associative scan over the lane axis of packed element planes (n, T).

    kind: "filter" or "smoother".  T is identity-padded to a block multiple.
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
        # NOTE: for reverse scans padding must sit at the FRONT so real
        # elements keep their suffixes intact; adjust the final slice below.

    local_kernel = partial(
        _local_scan_kernel,
        d=d,
        combine=combine,
        ident_rows=tuple(i * d + i for i in range(d)),
        reverse=reverse,
    )
    scanned = pl.pallas_call(
        local_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (n, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, Tp), dtype),
        interpret=interpret,
    )(planes)
    # Block totals: last (first, for reverse) column of each block.
    if reverse:
        totals = scanned[:, ::block]
    else:
        totals = scanned[:, block - 1 :: block]

    def combine_tl(a_rows, b_rows):
        return combine(a_rows, b_rows, d)

    prefixes = _exclusive_prefix_host(combine_tl, totals, ident_col, reverse)

    apply_kernel = partial(_apply_prefix_kernel, d=d, combine=combine)
    out = pl.pallas_call(
        apply_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, Tp), dtype),
        interpret=interpret,
    )(scanned, prefixes)

    if Tp != T:
        out = out[:, :T] if not reverse else out[:, Tp - T :]
    return out
