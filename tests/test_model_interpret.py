"""Off-TPU coverage of the model layer's fused-engine branches (VERDICT r4
item 9): ``config.set_pallas_interpret(True)`` forces ``_fused_engine_ok``
on CPU with interpret-mode kernels and tiny blocks, driving the model glue
(alignment arithmetic, coeff plumbing, moveaxis conventions) through
``lml_dt`` / ``pkfs_dt`` / the plane strip kernels end-to-end — the branches
of models/ssgp.py::_lml_impl/_predict_f_impl that otherwise execute only on
TPU hardware."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest
from flax import struct

from parallel_gps_tpu import config
from parallel_gps_tpu.kernels import Matern32, Matern52, RBF
from parallel_gps_tpu.models import StateSpaceGP
from parallel_gps_tpu.toymodels import obs_noise, sinu


@pytest.fixture(autouse=True, scope="module")
def _no_compile_cache():
    """The persistent compilation cache SEGFAULTS on this module's
    interpret-mode model programs (reproduced thrice in full-suite runs:
    twice serializing a freshly compiled executable in
    put_executable_and_time, once executing a deserialized one) — plain
    compile-and-run is fine, so the cache is disabled for this module.
    ``reset_cache()`` is required on BOTH sides: jax memoizes the
    is-cache-used decision once per process (compilation_cache.py:64),
    so flipping the flag alone is a no-op after the first compile."""
    from jax._src import compilation_cache as _cc

    jax.config.update("jax_enable_compilation_cache", False)
    _cc.reset_cache()
    yield
    jax.config.update("jax_enable_compilation_cache", True)
    _cc.reset_cache()


@pytest.fixture
def interpret_mode():
    config.set_pallas_interpret(True)
    yield
    config.set_pallas_interpret(False)


def _data(T=301, seed=0):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.rand(T))
    y = obs_noise(sinu(t), 0.1, seed)
    y[rng.choice(T, T // 10, replace=False)] = np.nan
    return t, y


@struct.dataclass
class _NoDtMatern52(Matern52):
    """Matern52 with the dt-engine hook withheld — exercises the model's
    born-aligned PLANE strip branch rather than the dt branch."""

    def transition_coeffs(self):
        return None


@pytest.mark.parametrize(
    "kern",
    [Matern52(0.9, 0.4), RBF(1.1, 0.5, order=3), _NoDtMatern52(0.9, 0.4)],
    ids=["m52_dt", "rbf3_dt", "m52_plane"],
)
def test_model_lml_fused_branch_matches_xla(kern, interpret_mode):
    t, y = _data()
    m = StateSpaceGP.create((t, y), kern, noise_variance=0.1)
    assert m._fused_engine_ok()
    ell_fused = float(m.log_marginal_likelihood())
    config.set_pallas_interpret(False)
    assert not m._fused_engine_ok()
    ell_xla = float(m.log_marginal_likelihood())
    npt.assert_allclose(ell_fused, ell_xla, rtol=1e-9)


@pytest.mark.parametrize(
    "kern",
    [Matern52(0.9, 0.4), _NoDtMatern52(0.9, 0.4)],
    ids=["m52_dt", "m52_plane"],
)
def test_model_predict_fused_branch_matches_xla(kern, interpret_mode):
    t, y = _data(T=257, seed=3)
    rng = np.random.RandomState(5)
    Xnew = rng.rand(23) * 1.2 - 0.1  # deliberately unsorted, some outside
    m = StateSpaceGP.create((t, y), kern, noise_variance=0.1)
    mean_f, var_f = m.predict_f(Xnew)
    config.set_pallas_interpret(False)
    mean_x, var_x = m.predict_f(Xnew)
    npt.assert_allclose(mean_f, mean_x, rtol=1e-7, atol=1e-9)
    npt.assert_allclose(var_f, var_x, rtol=1e-7, atol=1e-9)


def test_model_training_grads_through_dt_branch(interpret_mode):
    """value_and_grad of the model loss through the dt-engine dispatch (the
    MCMC/MAP hot path) == the XLA engine's, CPU interpret mode."""
    t, y = _data(T=173, seed=7)

    def loss(p):
        m = StateSpaceGP.create(
            (t, y), Matern52(p[0], p[1]), noise_variance=p[2]
        )
        return m.training_loss()

    p0 = jnp.asarray([0.9, 0.45, 0.12], jnp.float64)
    v_f, g_f = jax.value_and_grad(loss)(p0)
    config.set_pallas_interpret(False)
    v_x, g_x = jax.value_and_grad(loss)(p0)
    npt.assert_allclose(float(v_f), float(v_x), rtol=1e-10)
    npt.assert_allclose(g_f, g_x, rtol=1e-7, atol=1e-10)
