#!/bin/bash
# Round-4 phase D: bench rerun (phase-B attempt hit a transient backend
# FailedPrecondition on first dispatch) + 1M first-episode validity retry.
set -x
cd /root/repo
timeout 4000 python -u bench.py > results/bench_r4.log 2>&1
timeout 3000 python -u scripts/run_1m.py > results/run_1m_retry.log 2>&1
echo QUEUE_R4D_DONE
