#!/usr/bin/env python3
"""Large-N path shootout on the real TPU: blocked vs cells vs pcells.

Per (N, path): compile+first-episode time, steady steps/s, aggregated
edges/s, overflow. Used to pick the auto-selected path thresholds in
parallel/large_n.py (the numbers quoted in its docstrings and BENCH JSON).

    python scripts/bench_large_n.py --n 10000 100000 --paths blocked pcells
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 3
HIDDEN = (32, 32)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, nargs="+", default=[10_000, 100_000])
    ap.add_argument("--paths", nargs="+",
                    default=["blocked", "cells", "pcells"])
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--edge-mult", type=float, default=1.0,
                    help="pcells cell-edge multiple (make_pcell_spec)")
    ap.add_argument("--cap", type=int, default=None,
                    help="cell slot capacity override")
    args = ap.parse_args(argv)

    from multiagent_gnn_policies_tpu.utils.jax_setup import (
        enable_persistent_cache,
        respect_platform_env,
    )

    respect_platform_env()
    enable_persistent_cache()
    import jax

    from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
    from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
    from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

    acfg = ActorConfig(n_s=6, n_a=2, hidden=HIDDEN, k=K, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    print(f"device: {jax.devices()[0]}", flush=True)

    for n in args.n:
        p = FlockingParams(n_agents=n, episode_steps=args.steps, max_resets=2)
        for path in args.paths:
            try:
                t0 = time.perf_counter()
                r, _, ovf = rollout_large(
                    params, acfg, jax.random.key(3), p, path=path,
                    return_overflow=True, cell_edge_mult=args.edge_mult,
                    cap=args.cap,
                )
                float(np.asarray(r).sum())
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                max_ovf, bad = 0, 0
                for e in range(args.episodes):
                    r, _, ovf = rollout_large(
                        params, acfg, jax.random.key(4 + e), p, path=path,
                        return_overflow=True,
                        cell_edge_mult=args.edge_mult, cap=args.cap,
                    )
                    tot = float(np.asarray(r).sum())
                    max_ovf = max(max_ovf, int(ovf))
                    bad += 0 if np.isfinite(tot) else 1
                ovf = max_ovf
                dt = (time.perf_counter() - t0) / args.episodes
                sps = args.steps / dt
                print(
                    f"N={n:>7} {path:>8}: compile+first {compile_s:7.1f}s | "
                    f"{sps:8.1f} steps/s | {sps * n * 6.7 * K:.3e} edges/s | "
                    f"{dt / args.steps * 1e3:7.2f} ms/step | "
                    f"overflow={int(ovf)} nonfinite_eps={bad}",
                    flush=True,
                )
            except Exception as e:
                print(f"N={n:>7} {path:>8}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
