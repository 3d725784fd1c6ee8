#!/bin/bash
# Round-5 TPU queue, phase B (serial — the chip is single-client):
#   1. TwoFlocks decentralized expert at N=32k (paired seeds, gap anchor)
#   2. On-chip cert of the split-table frame_apply (pre-commit gate for
#      the ops/pallas_cells.py change)
#   3. Roofline accounting at N=32k and N=100k
set -x
cd /root/repo

timeout 3000 python -u scripts/twoflocks_decent_expert.py \
  --n 32768 --episodes 24 \
  > results/twoflocks_n32k_decent_hist.log 2>&1

timeout 14000 python -u scripts/verify_cells_tpu.py \
  > results/verify_cells_tpu_r5.log 2>&1
echo "verify rc=$?"

timeout 7000 python -u scripts/roofline_pcells.py --n 32768 --reps 30 \
  > results/roofline_n32k.log 2>&1
timeout 7000 python -u scripts/roofline_pcells.py --n 100000 --reps 20 \
  > results/roofline_n100k.log 2>&1

echo QUEUE_R5B_DONE
