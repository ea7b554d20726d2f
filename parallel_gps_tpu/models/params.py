"""Parameter transforms, trainability masks and priors.

The reference delegates constrained↔unconstrained parameter handling to
GPflow's ``Parameter(transform=positive())`` (reference: pssgp/model.py:67)
and samples/optimizes in unconstrained space via ``SamplingHelper``
(reference: pssgp/experiments/common.py:96-97).  Here the equivalents are
pure pytree transforms:

  - model/kernel pytrees store *constrained* values;
  - ``unconstrain``/``constrain`` map positive-valued hyperparameters through
    a softplus bijector, identified by field name — every positively
    constrained quantity in the framework is called ``variance``,
    ``lengthscales``, ``period`` or ``noise_variance``;
  - optimizers and MCMC run on the unconstrained pytree; losses/targets wrap
    with ``constrain``.

Trainability (GPflow ``set_trainable``) becomes a boolean mask pytree for
``optax.masked`` / frozen-leaf replacement.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

POSITIVE_FIELD_NAMES = frozenset(
    {"variance", "lengthscales", "period", "noise_variance"}
)


def softplus(x):
    return jax.nn.softplus(x)


def inv_softplus(y):
    # Stable inverse: y + log(1 - exp(-y)) = y + log(-expm1(-y)).
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def _leaf_name(path) -> str:
    for entry in reversed(path):
        if isinstance(entry, jax.tree_util.GetAttrKey):
            return entry.name
        if isinstance(entry, jax.tree_util.DictKey):
            return str(entry.key)
    return ""


def _is_positive(path) -> bool:
    return _leaf_name(path) in POSITIVE_FIELD_NAMES


def unconstrain(tree):
    """Map positive-constrained leaves to unconstrained space (softplus⁻¹)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: inv_softplus(x) if _is_positive(p) else x, tree
    )


def constrain(tree):
    """Inverse of :func:`unconstrain`."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: softplus(x) if _is_positive(p) else x, tree
    )


def as_arrays(tree, dtype=None):
    """Canonicalize all leaves to jnp arrays of the default float dtype."""
    if dtype is None:
        from parallel_gps_tpu.config import default_float

        dtype = default_float()
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), tree)


def trainable_mask(tree, predicate: Callable[[str], bool]):
    """Boolean mask pytree: predicate receives the dotted leaf path."""

    def path_str(path) -> str:
        parts = []
        for entry in path:
            if isinstance(entry, jax.tree_util.GetAttrKey):
                parts.append(entry.name)
            elif isinstance(entry, jax.tree_util.SequenceKey):
                parts.append(str(entry.idx))
            elif isinstance(entry, jax.tree_util.DictKey):
                parts.append(str(entry.key))
        return ".".join(parts)

    return jax.tree_util.tree_map_with_path(
        lambda p, x: bool(predicate(path_str(p))), tree
    )


def log_prior(tree, priors: dict):
    """Sum of prior log-densities over matching leaves of the
    *unconstrained* tree.

    ``priors`` maps a dotted-path *suffix* (e.g. ``"kernel.lengthscales"``)
    to either

      - a callable ``logpdf(u) -> scalar`` evaluated on the UNCONSTRAINED
        leaf (reference: gpflow ``PriorOn.UNCONSTRAINED``,
        pssgp/experiments/toy_models/mcmc.py:30-44), or
      - a tuple ``(logpdf, "constrained")``: evaluated on the constrained
        value softplus(u), plus the log-Jacobian of the transform — gpflow's
        default ``PriorOn.CONSTRAINED`` under unconstrained sampling
        (reference: sunspot/map.py:30-52, co2/mcmc.py:42-62 set priors
        without prior_on).
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    total = 0.0
    for path, leaf in flat:
        parts = []
        for entry in path:
            if isinstance(entry, jax.tree_util.GetAttrKey):
                parts.append(entry.name)
            elif isinstance(entry, jax.tree_util.SequenceKey):
                parts.append(str(entry.idx))
            elif isinstance(entry, jax.tree_util.DictKey):
                parts.append(str(entry.key))
        dotted = ".".join(parts)
        # Longest matching suffix wins, at most one prior per leaf — so a
        # fully-qualified path like "kernels.0.kernels.1.variance" is never
        # shadowed by a shorter one ("kernels.1.variance") that happens to be
        # a string suffix of it.
        matches = [
            s
            for s in priors
            if dotted == s or dotted.endswith("." + s)
        ]
        if matches:
            best = max(matches, key=len)
            spec = priors[best]
            if isinstance(spec, tuple):
                logpdf, on = spec
            else:
                logpdf, on = spec, "unconstrained"
            if on == "constrained" and _is_positive(path):
                value = softplus(leaf)
                # + log|d softplus(u)/du| = log sigmoid(u) = -softplus(-u)
                total = total + jnp.sum(logpdf(value)) + jnp.sum(
                    -jax.nn.softplus(-leaf)
                )
            else:
                total = total + jnp.sum(logpdf(leaf))
    return total
