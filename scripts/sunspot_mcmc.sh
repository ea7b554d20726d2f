#!/usr/bin/env bash
# Sunspot HMC sweep (reference: experiments/sunspots/mcmc.sh): step size 1,
# noise variance 300, float64, n in {3000, 300, 50}.
set -euo pipefail
cd "$(dirname "$0")/.."
py=parallel_gps_tpu.experiments.sunspot.mcmc
python -m $py --mcmc=hmc --model="${MODEL:-pssgp}" --step-size 1.0 \
  --noise-variance 300 --dtype "${DTYPE:-float64}" --sizes ${SIZES:-3000 300 50} \
  --n-samples "${N_SAMPLES:-1000}" --burnin "${BURNIN:-100}" \
  --out-dir "${OUT_DIR:-results/sunspot_mcmc}"
