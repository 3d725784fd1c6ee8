#!/bin/bash
# Round-4 TPU queue, phase C (after phase B): the 100k-agent training
# stretch + scoring + showcase trajectory of the at-scale-trained policy.
set -x
cd /root/repo

# 1. DAGGER end-to-end at N=100,000 on one chip.
timeout 14000 python -u train.py cfg/dagger_n100k.cfg \
  --metrics results/dagger_n100k_metrics.jsonl \
  --state-dir results/state_n100k --checkpoint-every 50 \
  > results/dagger_n100k_train.log 2>&1

# 2. Score it in its own regime (vs zero-shot -540.4) and dump the
#    showcase trajectory of the AT-SCALE-TRAINED policy.
timeout 4000 python -u evaluate.py cfg/dagger_n100k.cfg \
  --actor-path models/actor_FlockingRelative-v0_dagger_n100k.npz \
  --n-agents 100000 --episodes 3 \
  --save-trajectory results/traj_n100k_trained.npz \
  > results/n100k_eval_self.log 2>&1

echo QUEUE_R4C_DONE
