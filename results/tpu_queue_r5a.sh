#!/bin/bash
# Round-5 TPU queue, phase A: the two never-executed reference grids
# (VERDICT r4 missing #2). Serial — the chip is single-client.
# Run from /root/repo:  bash results/tpu_queue_r5a.sh
set -x
cd /root/repo

# 1. K x comm_radius DAGGER grid under stochastic dynamics
#    (reference cfg/rad_stoch.cfg: 12 sections, N=50).
timeout 14000 python -u train.py cfg/rad_stoch.cfg \
  --metrics results/rad_stoch_metrics.jsonl \
  > results/rad_stoch_run.log 2>&1

# 2. Per-K stochastic transfer checkpoints
#    (reference cfg/transfer_stoch.cfg: 4 sections, saves fname models).
timeout 8000 python -u train.py cfg/transfer_stoch.cfg \
  --metrics results/transfer_stoch_metrics.jsonl \
  > results/transfer_stoch_run.log 2>&1

echo QUEUE_R5A_DONE
