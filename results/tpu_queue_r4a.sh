#!/bin/bash
# Round-4 TPU queue, phase A: large-N DAGGER training (serial — the chip
# is single-client). Run from /root/repo:  bash results/tpu_queue_r4a.sh
set -x
cd /root/repo

# 1. The target: the N=100-trained canonical checkpoint's zero-shot reward
#    at N=32768 (what the at-scale training must beat), + expert context.
timeout 2000 python -u evaluate.py cfg/dagger.cfg \
  --actor-path models/actor_FlockingRelative-v0_dagger_k3.npz \
  --n-agents 32768 --episodes 5 \
  > results/zeroshot_n32768.log 2>&1
timeout 2000 python -u evaluate.py cfg/baseline.cfg --expert \
  --n-agents 32768 --episodes 5 \
  > results/expert_n32768.log 2>&1

# 2. The headline: DAGGER end-to-end at N=32,768 on one chip.
timeout 14000 python -u train.py cfg/dagger_n32k.cfg \
  --metrics results/dagger_n32k_metrics.jsonl \
  --state-dir results/state_n32k --checkpoint-every 25 \
  > results/dagger_n32k_train.log 2>&1

# 3. Score the at-scale-trained policy: its own regime + zero-shot UP to
#    100k (vs the small-N checkpoint's -540.4 there).
timeout 3000 python -u evaluate.py cfg/dagger_n32k.cfg \
  --actor-path models/actor_FlockingRelative-v0_dagger_n32k.npz \
  --n-agents 32768 --episodes 5 \
  > results/n32k_eval_self.log 2>&1
timeout 3000 python -u evaluate.py cfg/dagger_n32k.cfg \
  --actor-path models/actor_FlockingRelative-v0_dagger_n32k.npz \
  --n-agents 100000 --episodes 3 \
  > results/n32k_eval_100k.log 2>&1

echo QUEUE_R4A_DONE
