#!/bin/bash
# Serial TPU job queue #2 (VERDICT items 5, 6, 9 + flagship checkpoint).
# Each job is a separate process so the single chip is never contended.
set -x
cd /root/repo
mkdir -p models results

# 1. Flagship DAGGER re-run: produces models/actor_FlockingRelative-v0_dagger_k3
#    (round-1 run predates checkpoint export surviving in the tree).
python train.py cfg/dagger.cfg --metrics results/dagger_metrics_r2.jsonl \
  > results/dagger_rerun.log 2>&1

# 2. DDPG learning curve (VERDICT missing #6) — reference gnn_ddpg.py defaults.
timeout 3600 python train.py cfg/ddpg.cfg --metrics results/ddpg_metrics.jsonl \
  > results/ddpg_run.log 2>&1

# 3. Transfer checkpoints: one DAGGER run per K in {1..4} at N=50
#    (reference cfg/transfer.cfg; used by test_model_transfer.py).
python train.py cfg/transfer.cfg --metrics results/transfer_train_metrics.jsonl \
  > results/transfer_train.log 2>&1

# 4. Accelerated-training A/B (VERDICT weak #6): 16 vmapped rollout envs,
#    same total episodes/updates/beta schedule as cfg/dagger.cfg.
python train.py cfg/dagger_fast.cfg --metrics results/dagger_fast_metrics.jsonl \
  > results/dagger_fast_run.log 2>&1

# 5. Cross-K transfer table at the training scale (N=50).
python evaluate.py cfg/transfer.cfg \
  --actor-base models/actor_FlockingRelative-v0_transfer \
  > results/transfer_eval_k.log 2>&1

# 6. Cross-env + cross-N + cross-K transfer grid: FlockingRelative-trained
#    checkpoints evaluated on the TwoFlocks merge task, N in {50..250}
#    (reference test_model_transfer.py driven by cfg/n_twoflocks.cfg).
python evaluate.py cfg/n_twoflocks.cfg \
  --actor-base models/actor_FlockingRelative-v0_transfer \
  > results/transfer_eval_twoflocks.log 2>&1

# 7. Zero-shot swarm-size transfer of the flagship checkpoint, 10x-1000x
#    beyond the training N (large-N path auto-selects blocked/pcells).
for N in 1000 10000; do
  python evaluate.py cfg/dagger.cfg \
    --actor-path models/actor_FlockingRelative-v0_dagger_k3.npz \
    --n-agents $N --episodes 10 \
    > results/zeroshot_n${N}.log 2>&1
done
python evaluate.py cfg/dagger.cfg \
  --actor-path models/actor_FlockingRelative-v0_dagger_k3.npz \
  --n-agents 100000 --episodes 3 \
  > results/zeroshot_n100000.log 2>&1

# 8. Expert baselines at the same swarm sizes (sections: centralized False/True).
for N in 1000 10000; do
  python evaluate.py cfg/baseline.cfg --expert --n-agents $N --episodes 10 \
    > results/expert_n${N}.log 2>&1
done
python evaluate.py cfg/baseline.cfg --expert --n-agents 100000 --episodes 3 \
  > results/expert_n100000.log 2>&1

echo QUEUE2_DONE
