#!/bin/bash
# Serial TPU job queue #1 (canonical experiments, VERDICT items 1-2)
set -x
cd /root/repo
python train.py cfg/baseline.cfg > results/baseline_run.log 2>&1
python evaluate.py cfg/dagger.cfg --actor-path /root/reference/models/actor_FlockingRelative-v0_dagger_k3 > results/refckpt_eval.log 2>&1
python train.py cfg/cloning.cfg --metrics results/cloning_metrics.jsonl --state-dir results/state > results/cloning_run.log 2>&1
echo QUEUE1_DONE
