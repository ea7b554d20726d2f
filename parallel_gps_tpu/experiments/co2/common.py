"""CO2 experiment shared pieces (reference: pssgp/experiments/co2/common.py,
mcmc.py:42-65): merged NOAA weekly+monthly Mauna Loa data and the composite
quasi-periodic covariance

    co2_cov = Periodic(SE; σ²=5 fixed, ℓ, period=1 fixed, order=qp)
              * Matern32(σ²=0.1, ℓ=50)        [periodic damping]
              + Matern32(σ²=1, ℓ=100)         [long-term trend]

with Normal priors on the trainable hyperparameters and the observation
noise fixed (non-trainable).
"""
from __future__ import annotations

import numpy as np

from parallel_gps_tpu.datasets import load_co2
from parallel_gps_tpu.kernels import Matern32, Periodic


def get_data(n_training: int | None, data_dir: str | None = None):
    return load_co2(n_training, data_dir)


def get_covariance_function(qp_order: int = 3):
    periodic = Periodic(
        variance=5.0, lengthscales=1.0, period=1.0, order=qp_order
    )
    damping = Matern32(variance=0.1, lengthscales=50.0)
    trend = Matern32(variance=1.0, lengthscales=100.0)
    return periodic * damping + trend


def normal_logpdf(mu: float, sigma: float):
    def logpdf(x):
        return (
            -0.5 * ((x - mu) / sigma) ** 2
            - np.log(sigma)
            - 0.5 * np.log(2 * np.pi)
        )

    return logpdf


# Priors mirror reference co2/mcmc.py:42-62; paths address the kernel tree
# (Sum of (Product of (Periodic, damping M32), trend M32)).  The reference
# never sets prior_on, so these are gpflow-default CONSTRAINED-space priors
# (evaluated on softplus(u) plus the transform log-Jacobian).
def get_priors() -> dict:
    return {
        "kernels.0.kernels.0.lengthscales": (normal_logpdf(5.0, 1.0), "constrained"),
        "kernels.0.kernels.1.variance": (normal_logpdf(0.1, 1e-3), "constrained"),
        "kernels.0.kernels.1.lengthscales": (normal_logpdf(50.0, 10.0), "constrained"),
        "kernels.1.variance": (normal_logpdf(1.0, 0.1), "constrained"),
        "kernels.1.lengthscales": (normal_logpdf(100.0, 50.0), "constrained"),
    }


def trainable(path: str) -> bool:
    """Noise, periodic variance and period are fixed
    (reference: co2/mcmc.py:35-39,46-57)."""
    if path.endswith("noise_variance"):
        return False
    if "kernels.0.kernels.0" in path and (
        path.endswith("variance") or path.endswith("period")
    ):
        return False
    return True
