#!/bin/bash
# Round-5 TPU queue, phase C: the edge_mult experiment + flagship regimes.
set -x
cd /root/repo

# 0. Quick re-cert (the make_pcell_spec edge_mult param touched ops/;
#    default-preserving, but the gate is the gate).
timeout 7000 python -u scripts/verify_cells_tpu.py --quick \
  > results/verify_cells_tpu_r5_quick.log 2>&1
echo "verify quick rc=$?"

# 1. Roofline at the candidate cell edges (the r5 occupancy lever).
timeout 7000 python -u scripts/roofline_pcells.py --n 32768 --reps 30 \
  --edge-mult 2.0 > results/roofline_n32k_e2.log 2>&1
timeout 7000 python -u scripts/roofline_pcells.py --n 100000 --reps 20 \
  --edge-mult 2.0 > results/roofline_n100k_e2.log 2>&1

# 2. Full-horizon overflow check + step time at the canonical sizes with
#    edge 2 (the gate decides whether flocking compression ever exceeds
#    cap=16 at occupancy ~3.8).
timeout 3000 python -u scripts/bench_large_n.py --n 32768 --steps 200 \
  --paths pcells --edge-mult 2.0 > results/bench_e2_n32k.log 2>&1 \
  || echo "bench_large_n n32k rc=$?"
timeout 3000 python -u scripts/bench_large_n.py --n 100000 --steps 200 \
  --paths pcells --edge-mult 2.0 > results/bench_e2_n100k.log 2>&1 \
  || echo "bench_large_n n100k rc=$?"

# 3. Band scaling at both N with the better edge (vs r4 tables).
timeout 7000 python -u scripts/bench_scaling.py --n 32768 --edge-mult 2.0 \
  > results/scaling_band_n32k_r5.log 2>&1
timeout 7000 python -u scripts/bench_scaling.py --n 100000 --edge-mult 2.0 \
  > results/scaling_band_n100k_r5.log 2>&1

# 4. The 1M flagship with chunk-aware fusion + edge 2 (target <= 450 ms/step).
timeout 7000 python -u scripts/run_1m.py --edge-mult 2.0 \
  > results/run_1m_r5.log 2>&1

echo QUEUE_R5C_DONE
