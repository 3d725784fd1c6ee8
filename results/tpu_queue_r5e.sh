#!/bin/bash
# Round-5 TPU queue, phase E: flagship regimes at the per-N certified
# geometries (32k: edge2/cap24; 100k+: edge1/cap16), then trainings.
set -x
cd /root/repo

# 1. Band scaling vs the r4 tables (32k 41% / 100k 70% at D=8).
timeout 7000 python -u scripts/bench_scaling.py --n 32768 \
  --edge-mult 2.0 --cap 24 > results/scaling_band_n32k_r5.log 2>&1
timeout 7000 python -u scripts/bench_scaling.py --n 100000 \
  > results/scaling_band_n100k_r5.log 2>&1

# 2. The 1M flagship full horizon (target <= 450 ms/step, overflow=0;
#    fused single-pass frame+apply now enabled at every N).
timeout 7000 python -u scripts/run_1m.py > results/run_1m_r5.log 2>&1

# 3. DDPG at N=4,096 (16x the reference's dense ceiling) end-to-end.
timeout 7000 python -u train.py cfg/ddpg_n4k.cfg \
  --metrics results/ddpg_n4k_metrics.jsonl \
  > results/ddpg_n4k_run.log 2>&1

# 4. TwoFlocks at N=32,768, canonical 400-episode budget.
timeout 14000 python -u train.py cfg/dagger_twoflocks_n32k_long.cfg \
  --metrics results/twoflocks_long_metrics.jsonl \
  > results/twoflocks_long_run.log 2>&1

# 5. Score the long TwoFlocks checkpoint on the SAME 24 paired seeds.
timeout 3000 python -u evaluate.py cfg/dagger_twoflocks.cfg \
  --actor-path models/actor_FlockingTwoFlocks-v0_dagger_twoflocks_n32k_long.npz \
  --k 3 --n-agents 32768 --episodes 24 --per-episode \
  --cell-margin 1.6 --cell-cap 32 \
  > results/twoflocks_long_hist.log 2>&1

echo QUEUE_R5E_DONE
