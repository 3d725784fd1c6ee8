#!/bin/bash
# Round-5 phase G: flagship regimes with the occupancy-adaptive kernels.
set -x
cd /root/repo
timeout 3000 python -u scripts/bench_scaling.py --n 100000 --steps 200 --chain 2 \
  > results/scaling_band_n100k_r5c.log 2>&1
timeout 2000 python -u scripts/bench_large_n.py --n 32768 --paths pcells \
  --steps 200 --episodes 4 --edge-mult 2.0 --cap 24 \
  > results/bench_e2c24_n32k_r5g.log 2>&1
timeout 2000 python -u scripts/bench_large_n.py --n 100000 --paths pcells \
  --steps 200 --episodes 4 \
  > results/bench_e1_n100k_r5g.log 2>&1
timeout 7000 python -u scripts/run_1m.py > results/run_1m_r5g.log 2>&1
echo QUEUE_R5G_DONE
