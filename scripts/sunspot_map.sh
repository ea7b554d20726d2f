#!/usr/bin/env bash
# Sunspot MAP/L-BFGS sweep (reference: experiments/sunspots/map.sh):
# n in {1200, 2200, 3200}, noise variance 350, float64, dense prediction
# at pred_factor x n interpolation points.
set -euo pipefail
cd "$(dirname "$0")/.."
py=parallel_gps_tpu.experiments.sunspot.map
common=(--noise-variance 350 --dtype "${DTYPE:-float64}"
        --sizes ${SIZES:-1200 2200 3200} --maxiter "${MAXITER:-100}" --pred-factor "${PRED_FACTOR:-30}" --out-dir "${OUT_DIR:-results/sunspot_map}")

for model in pssgp ssgp gp; do
  python -m $py --model=$model "${common[@]}"
done
