#!/bin/bash
# Round-4 phase E: XProf the fused N=100k step (why was the pack fusion
# net-neutral at D=1?) + the D=8 band program for the residual floor.
set -x
cd /root/repo
timeout 3000 python -u scripts/profile_large_n.py --n 100000 --path pcells \
  > results/profile_n100k_r4.log 2>&1
echo QUEUE_R4E_DONE
