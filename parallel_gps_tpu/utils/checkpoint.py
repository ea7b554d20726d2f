"""Pytree checkpointing for hyperparameters, posteriors and sweep results.

The reference persists results ad hoc (``np.savez`` + an ``eval``-based
parameter restore, pssgp/experiments/sunspot/map.py:103-106 — explicitly NOT
reproduced, see SURVEY.md §5).  Here any JAX pytree round-trips through a
single ``.npz`` file: leaves are stored by flattened index, treedef as repr
for a human-readable sidecar check, and restoration fills a caller-provided
structure-matching pytree — no ``eval``, no pickling of code.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["__treedef_repr__"] = np.asarray(repr(treedef))
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    np.savez(path, **payload)


def load_pytree(path: str, like):
    """Load a pytree saved by :func:`save_pytree`.

    ``like`` supplies the structure (its leaf values are ignored); leaf
    dtypes follow what was saved.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        leaves, treedef = jax.tree_util.tree_flatten(like)
        # Checkpoints written before the treedef sidecar existed have only
        # leaf_{i} keys — fall back to the leaf-count check for those.
        if "__treedef_repr__" in data.files:
            saved_repr = str(data["__treedef_repr__"])
            if saved_repr != repr(treedef):
                raise ValueError(
                    "checkpoint structure mismatch: saved treedef\n"
                    f"  {saved_repr}\ndoes not match the provided 'like' pytree\n"
                    f"  {treedef!r}"
                )
        n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
        if n_saved != len(leaves):
            raise ValueError(
                f"checkpoint has {n_saved} leaves, 'like' has {len(leaves)}"
            )
        saved = [data[f"leaf_{i}"] for i in range(len(leaves))]
        return jax.tree_util.tree_unflatten(treedef, saved)
