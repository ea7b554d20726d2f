#!/usr/bin/env bash
# CO2 composite-kernel HMC (reference: experiments/co2/mcmc.sh): the
# quasi-periodic showcase Periodic(SE)*Matern32 + Matern32, qp order 3,
# step size 0.01, fixed noise 0.05, float64, full n=3192 series.
set -euo pipefail
cd "$(dirname "$0")/.."
py=parallel_gps_tpu.experiments.co2.mcmc
for model in gp pssgp ssgp; do
  python -m $py --mcmc=hmc --model=$model --qp-order "${QP_ORDER:-3}" --step-size 0.01 \
    --noise-variance 0.05 --dtype "${DTYPE:-float64}" \
    --n-training "${N_TRAINING:-3192}" \
    --n-samples "${N_SAMPLES:-1000}" --burnin "${BURNIN:-100}" \
    --out-dir "${OUT_DIR:-results/co2_mcmc}"
done
