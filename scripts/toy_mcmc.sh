#!/usr/bin/env bash
# Toy MCMC sweep (reference: experiments/toy_models/mcmc.sh): HMC/MALA/NUTS x
# {Matern32, Matern52, RBF} x {pssgp, ssgp, gp}, step size 0.01, float32 for
# the state-space models, float64 for the dense GP.
set -euo pipefail
cd "$(dirname "$0")/.."
py=parallel_gps_tpu.experiments.toy_models.mcmc
common=(--step-size 0.01 --rbf-order 6 --rbf-balance-iter 10 --qp-order 6
        --data-model sine --noise-variance 0.1
        --log2-sizes ${LOG2_SIZES:-7 8 10 12 14}
        --n-samples "${N_SAMPLES:-1000}" --burnin "${BURNIN:-100}"
        --out-dir "${OUT_DIR:-results/toy_mcmc}")

for mcmc in hmc mala nuts; do
  for cov in Matern32 Matern52 RBF; do
    python -m $py --mcmc=$mcmc --model=pssgp --cov=$cov --dtype=float32 "${common[@]}"
    python -m $py --mcmc=$mcmc --model=ssgp --cov=$cov --dtype=float32 "${common[@]}"
    python -m $py --mcmc=$mcmc --model=gp --cov=$cov --dtype=float64 "${common[@]}"
  done
done
