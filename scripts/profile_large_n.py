#!/usr/bin/env python3
"""Capture an XProf trace of one steady-state large-N episode and print a
per-op time breakdown (top ops by self time) from the trace.

    python -u scripts/profile_large_n.py --n 100000 --path pcells

The breakdown drives kernel-optimization priorities for the flagship
N=100k path (RESULTS §3); reading the trace locally avoids needing
TensorBoard in this environment.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_trace(log_dir: str, top: int = 25) -> None:
    """Parse the .trace.json.gz XProf export and print self-time per op."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(f"(no trace.json.gz under {log_dir} — open with xprof/TB)")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep TPU-device complete events; aggregate duration by name
    tot = defaultdict(float)
    cnt = defaultdict(int)
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tpu_pids = {pid for pid, name in pid_names.items()
                if "TPU" in str(name) or "/device" in str(name)}
    for e in events:
        if e.get("ph") != "X":
            continue
        if tpu_pids and e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    grand = sum(tot.values())
    print(f"\ntrace: {path}\ntotal device-op time: {grand/1e3:.1f} ms "
          f"(sum over ops; overlaps possible)")
    print(f"{'op':64s} {'ms':>9s} {'%':>6s} {'count':>6s}")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{name[:64]:64s} {us/1e3:9.2f} {100*us/max(grand,1e-9):6.1f} "
              f"{cnt[name]:6d}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--path", default="pcells")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--out", default="/tmp/xprof_large_n")
    ap.add_argument("--edge-mult", type=float, default=1.0,
                    help="pcells cell-edge multiple (make_pcell_spec)")
    ap.add_argument("--cap", type=int, default=None,
                    help="cell slot capacity override")
    ap.add_argument("--force-n-dev", type=int, default=None,
                    help="band-mode emulation: profile device 0's program "
                         "of a D-chip mesh (scripts/bench_scaling.py "
                         "semantics; results NOT a valid episode)")
    args = ap.parse_args(argv)

    from multiagent_gnn_policies_tpu.utils.jax_setup import (
        enable_persistent_cache,
        respect_platform_env,
    )

    respect_platform_env()
    enable_persistent_cache()
    import jax
    import numpy as np

    from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
    from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
    from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large
    from multiagent_gnn_policies_tpu.utils.profiling import trace

    acfg = ActorConfig(n_s=6, n_a=2, hidden=(32, 32), k=3, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    p = FlockingParams(n_agents=args.n, episode_steps=args.steps,
                       max_resets=2)

    kw = {}
    if args.force_n_dev:
        from jax.sharding import Mesh

        kw = dict(mesh=Mesh(np.asarray(jax.devices()[:1]), ("agents",)),
                  force_n_dev=args.force_n_dev)

    def run(key):
        r, _, ovf = rollout_large(params, acfg, key, p, path=args.path,
                                  return_overflow=True,
                                  cell_edge_mult=args.edge_mult,
                                  cap=args.cap, **kw)
        return float(np.asarray(r).sum()), int(ovf)

    t0 = time.time()
    tot, ovf = run(jax.random.key(3))        # compile + warm
    print(f"warm episode: {time.time()-t0:.1f}s reward={tot:.1f} "
          f"overflow={ovf}", flush=True)
    t0 = time.time()
    with trace(args.out):
        tot, ovf = run(jax.random.key(4))
    dt = time.time() - t0
    print(f"traced episode: {dt:.2f}s = {1e3*dt/args.steps:.2f} ms/step "
          f"(overflow={ovf})", flush=True)
    summarize_trace(args.out)


if __name__ == "__main__":
    main()
