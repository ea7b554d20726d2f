"""Checkpointing and profiling utilities."""
import os

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from parallel_gps_tpu.kernels import Matern32
from parallel_gps_tpu.utils.checkpoint import load_pytree, save_pytree
from parallel_gps_tpu.utils.profiling import timed


def test_pytree_checkpoint_round_trip(tmp_path):
    tree = {
        "kernel": Matern32(variance=jnp.asarray(1.5), lengthscales=jnp.asarray(0.3)),
        "noise_variance": jnp.asarray(0.07),
        "history": jnp.arange(5.0),
    }
    path = os.path.join(tmp_path, "ckpt", "params.npz")
    save_pytree(path, tree)
    like = {
        "kernel": Matern32(variance=jnp.zeros(()), lengthscales=jnp.zeros(())),
        "noise_variance": jnp.zeros(()),
        "history": jnp.zeros((5,)),
    }
    restored = load_pytree(path, like)
    npt.assert_allclose(float(restored["kernel"].variance), 1.5)
    npt.assert_allclose(float(restored["kernel"].lengthscales), 0.3)
    npt.assert_allclose(float(restored["noise_variance"]), 0.07)
    npt.assert_allclose(np.asarray(restored["history"]), np.arange(5.0))


def test_pytree_checkpoint_rejects_structure_mismatch(tmp_path):
    import pytest

    path = os.path.join(tmp_path, "params.npz")
    save_pytree(path, {"a": jnp.ones(3), "b": jnp.zeros(())})
    with pytest.raises(ValueError, match="structure mismatch"):
        load_pytree(path, {"a": jnp.ones(3), "c": jnp.zeros(())})
    with pytest.raises(ValueError, match="structure mismatch"):
        load_pytree(path, [jnp.ones(3), jnp.zeros(())])


def test_timed_blocks_on_sync():
    x = jnp.ones((64, 64))
    results = {}
    with timed("matmul", results) as box:
        box["sync"] = x @ x
    assert results["matmul"] > 0.0
