#!/bin/bash
# Resume the reference torch seed-variance runs (VERDICT r3 #2) from the
# checkpoints preserved in data/ref_seed_runs/ if the /tmp workdirs are gone.
# Each run trains the reference SelfPlayPPO at the fixed seed-1 parity pool
# with config seed N; curves merge into data/learning_curve_parity_selfplay.json
# as reference_rewards_seedN. After both finish:
#   python scripts/seed_variance.py --mode selfplay --band-only
set -e
cd "$(dirname "$0")/.."
for s in 2 3; do
  mkdir -p /tmp/ref_sp_seed$s/models /tmp/ref_sp_seed$s/data
  for f in data/ref_seed_runs/seed${s}_checkpoint_update_*.pth; do
    [ -e "$f" ] && cp "$f" /tmp/ref_sp_seed$s/models/"$(basename "${f#data/ref_seed_runs/seed${s}_}")"
  done
  OMP_NUM_THREADS=1 nice -n 10 python scripts/run_reference_selfplay_full.py \
    --updates 91 --train-seed $s --workdir /tmp/ref_sp_seed$s &
done
wait
