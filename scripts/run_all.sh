#!/usr/bin/env bash
# Full experiment battery (reference: experiments/toy_models/run_all.sh).
set -euo pipefail
cd "$(dirname "$0")"
bash ./toy_speed_and_stability.sh
bash ./toy_mcmc.sh
bash ./sunspot_map.sh
bash ./sunspot_mcmc.sh
bash ./co2_mcmc.sh
