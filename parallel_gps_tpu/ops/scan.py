"""Single-device two-level (blocked) associative scan.

Lives in ``ops`` (below the Kalman engines in the layering) so the engines
can use it without import cycles; ``parallel_gps_tpu.parallel`` re-exports it.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _pick_block(T: int, cap: int = 4096, floor: int = 128):
    """Power-of-two block length ≤ cap with ≥ 2 blocks; None → flat scan."""
    if T < 2 * floor:
        return None
    b = cap
    while b > T // 2:
        b //= 2
    return max(b, floor)


def blocked_associative_scan(
    operator: Callable,
    elems,
    identity,
    reverse: bool = False,
    block: int | None = None,
):
    """Single-device two-level associative scan.

    ``jax.lax.associative_scan`` unrolls ceil(log2 T) recursion levels of the
    full combine into the HLO graph — at T=10⁶ with the Kalman element
    algebra that is minutes of XLA compile time for ~0.2 s of runtime.  This
    variant reshapes T into (B, L) blocks, runs ONE vmapped inner scan
    (log2 L unrolled levels), chains the B block totals with a ``lax.scan``
    (a single compiled body; B tiny sequential steps on-device), and applies
    each block's incoming prefix with one combine.  Compile cost drops to
    log2 L + O(1) combines; runtime stays within a few percent of the flat
    scan.

    ``identity`` must be the operator's identity element (prefix of the
    first block); combining with it is exact on both sides, so lengths that
    don't divide the block are identity-padded (at most block−1 wasted
    elements) rather than falling back to the deep flat scan.  Matches
    ``lax.associative_scan(..., reverse=...)`` semantics.
    """
    leaves = jax.tree.leaves(elems)
    T = leaves[0].shape[0]
    if block is None:
        block = _pick_block(T)
    if block is None or T < 2 * block:
        return jax.lax.associative_scan(operator, elems, axis=0, reverse=reverse)
    B = -(-T // block)  # ceil
    Tp = B * block
    if Tp != T:
        pad = Tp - T

        def _pad(x, ident):
            fill = jnp.broadcast_to(ident, (pad,) + ident.shape).astype(x.dtype)
            return jnp.concatenate([x, fill], axis=0)

        elems = jax.tree.map(_pad, elems, identity)

    e2 = jax.tree.map(lambda x: x.reshape((B, block) + x.shape[1:]), elems)
    inner = jax.vmap(
        lambda e: jax.lax.associative_scan(operator, e, axis=0, reverse=reverse)
    )(e2)

    # Exclusive prefix of the B block totals: inclusive flat scan over the
    # (tiny) totals + shift-in of the identity.  A sequential ``lax.scan``
    # here costs ~1 ms per loop iteration of device while-loop overhead —
    # 0.5 s at B=244 — whereas these log2(B) combine levels on B·d² elements
    # run in microseconds.
    def _exclusive(totals):
        inclusive = jax.lax.associative_scan(operator, totals, axis=0)
        return jax.tree.map(
            lambda inc, ident: jnp.concatenate(
                [ident[None].astype(inc.dtype), inc[:-1]], axis=0
            ),
            inclusive,
            identity,
        )

    if reverse:
        # Incoming suffix of block b = totals of later blocks combined from
        # the right, applied on the LEFT of local results.
        totals = jax.tree.map(lambda x: jnp.flip(x[:, 0], axis=0), inner)
        prefixes_f = _exclusive(totals)
        prefixes = jax.tree.map(lambda x: jnp.flip(x, axis=0), prefixes_f)
    else:
        totals = jax.tree.map(lambda x: x[:, -1], inner)
        prefixes = _exclusive(totals)

    out = operator(jax.tree.map(lambda x: x[:, None], prefixes), inner)
    return jax.tree.map(
        lambda x: x.reshape((Tp,) + x.shape[2:])[:T], out
    )


