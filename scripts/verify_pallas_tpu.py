import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from multiagent_gnn_policies_tpu.utils.jax_setup import enable_persistent_cache
enable_persistent_cache()
import torch
from multiagent_gnn_policies_tpu.models.torch_import import actor_params_from_state_dict
from multiagent_gnn_policies_tpu.models.actor import ActorConfig
from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

print("backend:", jax.default_backend(), jax.devices(), flush=True)
params = actor_params_from_state_dict(
    torch.load("/root/reference/models/actor_FlockingRelative-v0_dagger_k3", map_location="cpu"))
acfg = ActorConfig(n_s=6, n_a=2, hidden=(32, 32), k=3, ind_agg=0)

def run(n, steps, use_pallas, key=0, max_resets=2):
    p = FlockingParams(n_agents=n, episode_steps=steps, max_resets=max_resets)
    t0 = time.perf_counter()
    r, fx = rollout_large(params, acfg, jax.random.key(key), p, use_pallas=use_pallas)
    r.block_until_ready()
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    r2, _ = rollout_large(params, acfg, jax.random.key(key + 1), p, use_pallas=use_pallas)
    r2.block_until_ready()
    t = time.perf_counter() - t0
    print(f"N={n} T={steps} pallas={use_pallas}: compile+run {t_first:.1f}s, "
          f"steady {t:.2f}s ({steps/t:.1f} steps/s), "
          f"r[0]={float(r2[0]):.2f} r[-1]={float(r2[-1]):.2f} sum={float(jnp.sum(r)):.2f}",
          flush=True)
    return r

stage = sys.argv[1] if len(sys.argv) > 1 else "small"
if stage == "small":
    ra = run(512, 20, False)
    rb = run(512, 20, True)
    dr = float(jnp.max(jnp.abs(ra - rb) / (jnp.abs(ra) + 1e-6)))
    print(f"N=512 parity xla vs pallas: max rel dr={dr:.2e}", flush=True)
elif stage == "xla10k":
    run(10000, 200, False)
elif stage == "pallas10k":
    run(10000, 200, True)
elif stage == "xla100k":
    run(100000, 20, False)
elif stage == "pallas100k":
    run(100000, 20, True)
