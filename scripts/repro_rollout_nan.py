"""On-chip repro of BENCH_r02's broken N=100k pcells rollout (VERDICT r2
item 1): per-step rewards + overflow for the policy-mode and expert-mode
rollouts, to locate where NaN enters.

    python -u scripts/repro_rollout_nan.py [N] [T] [path] [mode]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from multiagent_gnn_policies_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()

import jax

from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
T = int(sys.argv[2]) if len(sys.argv) > 2 else 25
path = sys.argv[3] if len(sys.argv) > 3 else "pcells"
mode = sys.argv[4] if len(sys.argv) > 4 else "policy"

acfg = ActorConfig(n_s=6, n_a=2, hidden=(32, 32), k=3, ind_agg=0)
params = init_actor(jax.random.key(0), acfg)
p = FlockingParams(n_agents=N, episode_steps=T, max_resets=2)

print(f"[{time.strftime('%H:%M:%S')}] N={N} T={T} path={path} mode={mode}",
      flush=True)
t0 = time.time()
r, x, ovf = rollout_large(
    params, acfg, jax.random.key(3), p, path=path,
    expert_mode=(mode == "expert"), return_overflow=True,
)
r = np.asarray(r)
x = np.asarray(x)
print(f"[{time.strftime('%H:%M:%S')}] done in {time.time()-t0:.1f}s "
      f"(compile+run)", flush=True)
print("overflow:", int(ovf), flush=True)
print("reward per step:", np.array2string(r, precision=2, threshold=60),
      flush=True)
finite = np.isfinite(r)
if not finite.all():
    print("FIRST NON-FINITE REWARD at step", int(np.argmin(finite)), flush=True)
print("final x finite:", int(np.sum(~np.isfinite(x))), "bad of", x.size,
      flush=True)
