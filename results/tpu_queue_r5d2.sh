#!/bin/bash
# Round-5 TPU queue, phase D2: re-cert the pack revert, settle the
# edge2/cap24 question at 100k (the anomalous overflow=N-24 episode),
# and re-measure the headline step times at the final layouts.
set -x
cd /root/repo

timeout 7000 python -u scripts/verify_cells_tpu.py --quick \
  > results/verify_cells_tpu_r5d2.log 2>&1
echo "verify quick rc=$?"

# edge2/cap24 at 100k: 4 episodes with per-episode overflow/finite checks
timeout 3000 python -u scripts/bench_large_n.py --n 100000 --steps 200 \
  --episodes 4 --paths pcells --edge-mult 2.0 --cap 24 \
  > results/bench_e2c24_n100k_v3.log 2>&1

# final-layout step times (the RESULTS §3 r5 row)
timeout 3000 python -u scripts/bench_large_n.py --n 32768 --steps 200 \
  --paths pcells --edge-mult 2.0 --cap 24 \
  > results/bench_e2c24_n32k_v3.log 2>&1
timeout 3000 python -u scripts/bench_large_n.py --n 100000 --steps 200 \
  --paths pcells > results/bench_e1_n100k_v3.log 2>&1
timeout 3000 python -u scripts/bench_large_n.py --n 32768 --steps 200 \
  --paths pcells > results/bench_e1_n32k_v3.log 2>&1

echo QUEUE_R5D2_DONE
