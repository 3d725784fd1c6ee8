#!/bin/bash
# Round-4 TPU queue, phase B (after phase A): certification at HEAD, new
# bench protocol, sharded-build scaling, 1M full horizon, canonical DDPG,
# 100k trajectory dump. Serial — the chip is single-client.
set -x
cd /root/repo

# 1. On-chip certification at HEAD (sharded-build refactor + chunked scan).
timeout 4000 python -u scripts/verify_cells_tpu.py \
  > results/verify_cells_tpu_r4.log 2>&1

# 2. Headline bench with the sustained (dispatch-amortized) metric.
timeout 4000 python -u bench.py > results/bench_r4.log 2>&1

# 3. Band-mode scaling with the sharded grid build (targets: >=80% at D=4,
#    >=70% at D=8 for N=100k).
timeout 4000 python -u scripts/bench_scaling.py --n 100000 --path pcells \
  > results/scaling_band_n100k_r4.log 2>&1
timeout 4000 python -u scripts/bench_scaling.py --n 32768 --path pcells \
  > results/scaling_band_n32k_r4.log 2>&1

# 4. N=1M FULL horizon (T=200) via chunked scans; also dumps a trajectory.
timeout 4000 python -u scripts/run_1m.py --traj results/traj_n1m.npz \
  > results/zeroshot_n1000000.log 2>&1

# 5. Canonical DDPG at HEAD: both policy classes (tanh + reference-exact
#    unbounded) -> regenerates results/ddpg_metrics.jsonl from HEAD code.
rm -f results/ddpg_metrics.jsonl
timeout 8000 python -u train.py cfg/ddpg.cfg \
  --metrics results/ddpg_metrics.jsonl \
  > results/ddpg_canonical_run.log 2>&1

# 6. 100k-agent flocking trajectory dump (policy = canonical checkpoint).
timeout 4000 python -u evaluate.py cfg/dagger.cfg \
  --actor-path models/actor_FlockingRelative-v0_dagger_k3.npz \
  --n-agents 100000 --episodes 1 \
  --save-trajectory results/traj_n100k.npz \
  > results/traj_n100k.log 2>&1

echo QUEUE_R4B_DONE
