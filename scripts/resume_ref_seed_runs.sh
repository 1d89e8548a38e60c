#!/bin/bash
# Resume the reference torch seed-variance runs (VERDICT r3 #2) from the
# checkpoints preserved in data/ref_seed_runs/ if the /tmp workdirs are gone.
#
# SELF-PLAY legs (seeds 2/3): COMPLETE as of round 4 — curves merged into
# data/learning_curve_parity_selfplay.json (gap of seed-means 0.9%,
# gap/sigma 0.25). Re-running them is only needed to reproduce.
#
# SINGLE-AGENT legs (seeds 2/3): COMPLETE as of round 5 — all 152 updates,
# curves merged into data/learning_curve_parity.json (reference 3-seed band:
# converged-half means 2158/2137/2059, sigma 2.5%; gap of seed-means vs ours
# 2.7%, gap/sigma 1.30). The preserved driver checkpoints are the FINAL
# (update-152) states; re-running below is a no-op resume that just re-merges.
#   python scripts/seed_variance.py --mode single --band-only
set -e
cd "$(dirname "$0")/.."
for s in 2 3; do
  mkdir -p /tmp/ref_single_seed$s
  src=data/ref_seed_runs/single_seed${s}_driver_checkpoint.pkl
  [ -e "$src" ] && cp "$src" /tmp/ref_single_seed$s/driver_checkpoint.pkl
  OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 python scripts/run_reference_single_full.py \
    --train-seed $s --workdir /tmp/ref_single_seed$s &
done
wait
