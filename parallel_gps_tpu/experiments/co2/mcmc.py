"""CO2 MCMC experiment — the composite-kernel showcase (reference:
pssgp/experiments/co2/mcmc.py): HMC posteriors of the quasi-periodic sum
kernel on n=3192 merged Mauna Loa observations, float64, noise fixed.

Usage::

    python -m parallel_gps_tpu.experiments.co2.mcmc --model pssgp \
        --data-dir /path/with/co2_weekly_mlo.txt
"""
from __future__ import annotations

import numpy as np

from parallel_gps_tpu.experiments import common as C
from parallel_gps_tpu.experiments.co2.common import (
    get_covariance_function,
    get_data,
    get_priors,
    trainable,
)


def _plot(args, model, samples, t, y, y_mean):
    import os

    from parallel_gps_tpu.experiments.plots import plot_posterior_predictive

    # ``y`` arrives mean-centered (the model is zero-mean); ``y_offset``
    # shifts both data and predictive draws back to ppm for the figure.
    plot_posterior_predictive(
        model,
        samples,
        t,
        y,
        os.path.join(args.out_dir, f"co2_mcmc_{args.model}_{args.mcmc}.png"),
        trainable=trainable,
        y_offset=y_mean,
        title=f"CO2 posterior predictive (qp_order={args.qp_order}, {args.mcmc})",
    )


def run(args) -> dict:
    import jax

    C.set_dtype(args.dtype, args.platform)
    t, y = get_data(args.n_training, args.data_dir)
    # Center the observations (the model is zero-mean).
    y_mean = float(np.mean(y))
    if getattr(args, "no_run", False):
        if args.plot:
            import os

            model = C.get_model(
                args.model,
                (t, y - y_mean),
                get_covariance_function(args.qp_order),
                args.noise_variance,
                stable=args.stable,
            )
            samples = C.load_samples(
                os.path.join(
                    args.out_dir, f"co2_mcmc_{args.model}_{args.mcmc}.npz"
                ),
                model,
            )
            _plot(args, model, samples, t, y - y_mean, y_mean)
        return {}

    model = C.get_model(
        args.model,
        (t, y - y_mean),
        get_covariance_function(args.qp_order),
        args.noise_variance,
        stable=args.stable,
        device=C.model_device_from_args(args),
    )
    samples, acc, wall = C.run_one_mcmc(
        model,
        get_priors(),
        algo=args.mcmc,
        n_samples=args.n_samples,
        burnin=args.burnin,
        step_size=args.step_size,
        warmup=args.warmup,
        trainable=trainable,
        progress=args.progress,
    )
    print(f"n={t.shape[0]}: accept={acc:.3f} wall={wall:.1f}s")
    C.save_results(
        args.out_dir,
        f"co2_mcmc_{args.model}_{args.mcmc}",
        walls=np.asarray([wall]),
        accepts=np.asarray([acc]),
        y_mean=y_mean,
        **{
            f"sample_{j}": np.asarray(leaf)
            for j, leaf in enumerate(jax.tree_util.tree_leaves(samples))
        },
    )
    if args.plot:
        _plot(args, model, samples, t, y - y_mean, y_mean)
    return {"wall": wall, "accept": acc}


def main():
    p = C.base_parser(__doc__)
    p.add_argument("--n-training", type=int, default=3192)
    p.add_argument("--mcmc", default="hmc", choices=[m.value for m in C.MCMCEnum])
    p.add_argument("--n-samples", type=int, default=1000)
    p.add_argument("--burnin", type=int, default=100)
    p.add_argument("--step-size", type=float, default=0.01)
    p.add_argument("--warmup", type=int, default=0,
                   help="dual-averaging step-size adaptation iterations (0 = the reference's fixed-step protocol)")
    p.add_argument("--plot", action="store_true", help="posterior-predictive spaghetti figure")
    p.add_argument("--no-run", action="store_true", help="skip sampling (reload saved results)")
    p.set_defaults(noise_variance=0.05)
    run(p.parse_args())


if __name__ == "__main__":
    main()
