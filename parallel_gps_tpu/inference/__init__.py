from parallel_gps_tpu.inference.mcmc import (
    dual_averaging_warmup,
    find_reasonable_step_size,
    hmc_kernel,
    mala_kernel,
    nuts_kernel,
    sample_chain,
    sample_chains,
)
from parallel_gps_tpu.inference.optim import (
    fit_adam,
    fit_lbfgs,
    make_loss,
    make_log_posterior,
)

__all__ = [
    "fit_adam",
    "fit_lbfgs",
    "make_loss",
    "make_log_posterior",
    "hmc_kernel",
    "mala_kernel",
    "nuts_kernel",
    "sample_chain",
    "sample_chains",
    "dual_averaging_warmup",
    "find_reasonable_step_size",
]
