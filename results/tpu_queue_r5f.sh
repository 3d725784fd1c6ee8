#!/bin/bash
# Round-5 phase F: edge_mult=1.5/cap=16 geometry certification
# (2.25x less kernel compute + slot traffic than edge1/cap16, more
# overflow headroom than the rejected edge2/cap24).
set -x
cd /root/repo
timeout 2000 python -u scripts/bench_large_n.py --n 32768 --paths pcells \
  --steps 200 --episodes 4 --edge-mult 1.5 \
  > results/bench_e15_n32k_v2.log 2>&1
timeout 2000 python -u scripts/bench_large_n.py --n 100000 --paths pcells \
  --steps 200 --episodes 4 --edge-mult 1.5 \
  > results/bench_e15_n100k_v2.log 2>&1
timeout 7000 python -u scripts/run_1m.py --edge-mult 1.5 \
  > results/run_1m_e15.log 2>&1
echo QUEUE_R5F_DONE
