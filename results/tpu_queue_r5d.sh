#!/bin/bash
# Round-5 TPU queue, phase D: certify the r5 pack/unpack layout rewrite,
# choose the overflow-safe cell-edge config, then the flagship regimes.
set -x
cd /root/repo

# 1. On-chip cert of the pack/unpack layout rewrite (ops/ gate, full).
timeout 14000 python -u scripts/verify_cells_tpu.py \
  > results/verify_cells_tpu_r5b.log 2>&1
echo "verify rc=$?"

# 2. Component roofline with the new layouts (edge 1 and edge 2).
timeout 7000 python -u scripts/roofline_pcells.py --n 100000 --reps 20 \
  > results/roofline_n100k_v2.log 2>&1
timeout 7000 python -u scripts/roofline_pcells.py --n 100000 --reps 20 \
  --edge-mult 2.0 > results/roofline_n100k_v2e2.log 2>&1
timeout 7000 python -u scripts/roofline_pcells.py --n 32768 --reps 30 \
  --edge-mult 2.0 > results/roofline_n32k_v2e2.log 2>&1

# 3. Overflow-safe edge search at full horizon (T=200).
timeout 3000 python -u scripts/bench_large_n.py --n 32768 --steps 200 \
  --paths pcells --edge-mult 1.5 > results/bench_e15_n32k.log 2>&1
timeout 3000 python -u scripts/bench_large_n.py --n 100000 --steps 200 \
  --paths pcells --edge-mult 1.5 > results/bench_e15_n100k.log 2>&1
timeout 3000 python -u scripts/bench_large_n.py --n 32768 --steps 200 \
  --paths pcells --edge-mult 2.0 --cap 24 > results/bench_e2c24_n32k.log 2>&1
timeout 3000 python -u scripts/bench_large_n.py --n 100000 --steps 200 \
  --paths pcells --edge-mult 2.0 --cap 24 > results/bench_e2c24_n100k.log 2>&1
# baseline re-measure at the r5 layouts, edge 1 (r4 comparison row)
timeout 3000 python -u scripts/bench_large_n.py --n 32768 --steps 200 \
  --paths pcells > results/bench_e1_n32k_v2.log 2>&1
timeout 3000 python -u scripts/bench_large_n.py --n 100000 --steps 200 \
  --paths pcells > results/bench_e1_n100k_v2.log 2>&1

echo QUEUE_R5D_DONE
