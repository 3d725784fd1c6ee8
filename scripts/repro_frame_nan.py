"""Minimal on-chip repro for the round-2 _frame_kernel NaN (VERDICT item 1).

Single frame() call at configurable N on the real TPU, compared channel-by-
channel against blocked_frame. Positions come from /tmp/x12000.npy when
present (skips the reset compile). Run:

    python -u scripts/repro_frame_nan.py 12000
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from multiagent_gnn_policies_tpu.utils.jax_setup import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams, reset
from multiagent_gnn_policies_tpu.ops.blocked import blocked_frame
from multiagent_gnn_policies_tpu.ops import pallas_cells as pc


def stage(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


N = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
p = FlockingParams(n_agents=N)
cache = f"/tmp/x{N}.npy"
if os.path.exists(cache):
    x = jnp.asarray(np.load(cache))
    stage(f"loaded positions from {cache}")
else:
    stage("compiling reset...")
    state, _ = jax.jit(reset, static_argnums=1)(jax.random.PRNGKey(0), p)
    x = state.x
    np.save(cache, np.asarray(x))
stage(f"x finite={bool(jnp.all(jnp.isfinite(x)))} N={N}")

spec = pc.make_pcell_spec(p)
stage(f"spec={spec} cy_pad={spec.cy_pad}")

t0 = time.time()
grid = jax.jit(pc.build_pcell_grid, static_argnums=1)(x[:, :2], spec)
stage(f"grid built ({time.time()-t0:.1f}s) overflow={int(grid.overflow)}")

t0 = time.time()
fq = jax.jit(pc.frame, static_argnums=(2, 3, 4, 5))(
    x, grid, spec, p, True, False
)
jax.block_until_ready(fq)
stage(f"pcells frame done ({time.time()-t0:.1f}s)")

from multiagent_gnn_policies_tpu.parallel.large_n import pick_block
blk = pick_block(N)
t0 = time.time()
ref = jax.jit(blocked_frame, static_argnums=(1, 2, 3))(x, p, True, blk)
jax.block_until_ready(ref)
stage(f"blocked frame done ({time.time()-t0:.1f}s, block={blk})")

for name in ("values", "degree", "expert", "min_r2"):
    a = np.atleast_1d(np.asarray(getattr(fq, name)))
    b = np.atleast_1d(np.asarray(getattr(ref, name)))
    nan_a = int(np.sum(~np.isfinite(a)))
    err = float(np.max(np.abs(a - b))) if nan_a == 0 else float("nan")
    print(f"{name:8s} nan={nan_a:8d} maxerr={err:.3e}", flush=True)
    if nan_a and a.ndim == 2:
        bad = np.unique(np.where(~np.isfinite(a))[0])
        print("  bad agents:", bad[:10], "... total", len(bad), flush=True)
        print("  bad agent slots:", np.asarray(grid.slot)[bad[:10]], flush=True)
        print("  channels with nan:", np.unique(np.where(~np.isfinite(a))[1]),
              flush=True)
