"""Parameter transforms, trainability masks and prior attachment.

Covers the machinery the reference delegates to GPflow ``Parameter``
(reference: pssgp/model.py:67, experiments/common.py:96-97): the softplus
bijector round-trip, path-suffix prior matching (including dict keys and the
longest-suffix disambiguation), and both prior placements — unconstrained
(toy_models/mcmc.py:30-44) and gpflow-default constrained with transform
log-Jacobian (sunspot/map.py:30-52, co2/mcmc.py:42-62).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallel_gps_tpu.models.params import (
    constrain,
    inv_softplus,
    log_prior,
    softplus,
    trainable_mask,
    unconstrain,
)


def _normal_logpdf(mu, sigma):
    def logpdf(x):
        return (
            -0.5 * ((x - mu) / sigma) ** 2
            - np.log(sigma)
            - 0.5 * np.log(2 * np.pi)
        )

    return logpdf


def test_softplus_round_trip():
    for v in [1e-4, 0.1, 1.0, 50.0, 5500.0]:
        u = inv_softplus(jnp.asarray(v))
        assert np.isfinite(float(u))
        np.testing.assert_allclose(float(softplus(u)), v, rtol=1e-12)


def test_constrain_unconstrain_only_touch_positive_fields():
    tree = {
        "kernel": {"variance": jnp.asarray(2.0), "order": jnp.asarray(3.0)},
        "noise_variance": jnp.asarray(0.5),
    }
    u = unconstrain(tree)
    # 'order' is not a positive-constrained field name: untouched.
    assert float(u["kernel"]["order"]) == 3.0
    assert float(u["kernel"]["variance"]) != 2.0
    round_trip = constrain(u)
    np.testing.assert_allclose(float(round_trip["kernel"]["variance"]), 2.0, rtol=1e-12)
    np.testing.assert_allclose(float(round_trip["noise_variance"]), 0.5, rtol=1e-12)


def test_unconstrained_prior_evaluated_on_raw_leaf():
    u = {"kernel": {"variance": inv_softplus(jnp.asarray(2.0))}}
    pri = {"kernel.variance": _normal_logpdf(0.0, 1.0)}
    got = float(log_prior(u, pri))
    want = float(_normal_logpdf(0.0, 1.0)(u["kernel"]["variance"]))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_constrained_prior_adds_log_jacobian():
    raw = inv_softplus(jnp.asarray(2.0))
    u = {"kernel": {"variance": raw}}
    pri = {"kernel.variance": (_normal_logpdf(2.0, 1.0), "constrained")}
    got = float(log_prior(u, pri))
    # logpdf at the constrained value + log sigmoid(u) (softplus Jacobian)
    want = float(_normal_logpdf(2.0, 1.0)(2.0)) + float(
        -jax.nn.softplus(-raw)
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_prior_path_matching_dict_and_sequence_keys():
    # Dict root + nested list: both key kinds must appear in the dotted path.
    u = {
        "kernel": {
            "kernels": [
                {"variance": jnp.asarray(0.3)},
                {"variance": jnp.asarray(0.7)},
            ]
        }
    }
    pri = {"kernels.1.variance": _normal_logpdf(0.0, 1.0)}
    got = float(log_prior(u, pri))
    want = float(_normal_logpdf(0.0, 1.0)(0.7))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_longest_suffix_wins():
    # "kernels.1.variance" is a string suffix of "kernels.0.kernels.1.variance";
    # each leaf must bind to its own (longest) match, not be double-counted.
    u = {
        "kernels": [
            {"kernels": [{"variance": jnp.asarray(1.0)}, {"variance": jnp.asarray(2.0)}]},
            {"variance": jnp.asarray(3.0)},
        ]
    }
    pri = {
        "kernels.0.kernels.1.variance": lambda x: x * 10.0,
        "kernels.1.variance": lambda x: x,
    }
    got = float(log_prior(u, pri))
    np.testing.assert_allclose(got, 2.0 * 10.0 + 3.0, rtol=1e-12)


def test_log_prior_gradient_flows():
    raw = inv_softplus(jnp.asarray(0.1))
    u = {"noise_variance": raw}
    pri = {"noise_variance": (_normal_logpdf(0.5, 0.1), "constrained")}
    g = jax.grad(lambda t: log_prior(t, pri))(u)
    assert np.isfinite(float(g["noise_variance"]))
    assert abs(float(g["noise_variance"])) > 0


@pytest.mark.parametrize("frozen", ["noise_variance", "kernel.variance"])
def test_trainable_mask_freezes_by_path(frozen):
    tree = {"kernel": {"variance": jnp.asarray(1.0)}, "noise_variance": jnp.asarray(0.5)}
    mask = trainable_mask(tree, lambda p: not p.endswith(frozen))
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    n_frozen = sum(1 for _, v in flat if not v)
    assert n_frozen == 1
