#!/bin/bash
# Serial TPU job queue, round 3: re-certified measurements at HEAD after
# the lattice-init bf16 fix (VERDICT r2 items 3, 4, 7, 8). One job at a
# time — the single chip must never be contended.
set -x
cd /root/repo
mkdir -p models results

# 1. Flagship DAGGER retrain at HEAD -> canonical checkpoint
#    models/actor_FlockingRelative-v0_dagger_k3.npz (models/ is gitignored,
#    so the artifact must be reproducible by exactly this command).
timeout 3000 python train.py cfg/dagger.cfg \
  --metrics results/dagger_metrics_r3.jsonl \
  > results/dagger_rerun_r3.log 2>&1

# 2. Large-N path shootout at HEAD (RESULTS §3; decides pallas_kernels
#    fate per VERDICT item 8).
timeout 5400 python scripts/bench_large_n.py \
  --n 10000 32768 100000 --paths blocked cells pcells \
  > results/bench_large_n_r3.log 2>&1
timeout 2400 python scripts/bench_large_n.py \
  --n 10000 32768 --paths pallas \
  > results/bench_large_n_r3_pallas.log 2>&1

# 3. Per-device-band scaling on the real chip (RESULTS §5 / BASELINE
#    2-host target proxy).
timeout 5400 python scripts/bench_scaling.py --mode band --n 32768 \
  --path pcells > results/scaling_band_n32k_r3.log 2>&1
timeout 5400 python scripts/bench_scaling.py --mode band --n 100000 \
  --path pcells > results/scaling_band_n100k_r3.log 2>&1

# 4. Zero-shot swarm-size transfer + expert baselines at HEAD
#    (RESULTS §4c; evaluate.py now hard-fails on overflow>0).
for N in 1000 10000; do
  timeout 3000 python evaluate.py cfg/dagger.cfg \
    --actor-path models/actor_FlockingRelative-v0_dagger_k3.npz \
    --n-agents $N --episodes 10 \
    > results/zeroshot_n${N}.log 2>&1
done
timeout 3000 python evaluate.py cfg/dagger.cfg \
  --actor-path models/actor_FlockingRelative-v0_dagger_k3.npz \
  --n-agents 100000 --episodes 3 \
  > results/zeroshot_n100000.log 2>&1
for N in 1000 10000; do
  timeout 3000 python evaluate.py cfg/baseline.cfg --expert --n-agents $N \
    --episodes 10 > results/expert_n${N}.log 2>&1
done
timeout 3000 python evaluate.py cfg/baseline.cfg --expert --n-agents 100000 \
  --episodes 3 > results/expert_n100000.log 2>&1

# 5. Headline bench at HEAD (also warms the driver's compile cache).
timeout 3000 python bench.py > results/bench_r3.log 2>&1

echo QUEUE_R3_DONE
