#!/usr/bin/env python3
"""Multi-chip scaling measurement for the large-N graph paths.

Only one real TPU chip is available in this environment, so scaling is
measured two ways and labeled accordingly:

1. **Per-device-band timing on the real chip** (``--mode band``): for each
   simulated mesh size D, run the rollout with ``force_n_dev=D`` on a
   1-device mesh — every step then executes exactly device 0's program of
   a D-chip mesh (its 1/D band of the grid-row sweep, the band unpack,
   and the collective as an identity). The measured step time is a
   device's compute time in the D-chip setup; what it excludes is the
   real interconnect cost of the psum, which is reported analytically
   (bytes/step at the printed volume; ~11 MB/step at N=100k rides a
   single ICI hop in well under a millisecond at 45+ GB/s).
   Parallel efficiency proxy: eff(D) = t(1) / (D * t(D)).

2. **Virtual CPU-mesh execution** (``--mode mesh``, run under
   JAX_PLATFORMS=cpu + xla_force_host_platform_device_count): the REAL
   sharded program over 1/2/4/8 devices — collectives included — proving
   the multi-chip path compiles and is numerically exact (parity tests in
   tests/test_cells.py / test_pallas_cells.py). Wall-clock on the CPU
   host is NOT a scaling signal (this box has 2 cores for 8 virtual
   devices) and is printed only for completeness.

    python scripts/bench_scaling.py --n 100000 --path pcells
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --mode mesh --n 4096 --path cells
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 3
HIDDEN = (32, 32)


def _time_rollout(fn, episodes):
    fn()                                   # compile + warm
    t0 = time.perf_counter()
    for _ in range(episodes):
        fn()
    return (time.perf_counter() - t0) / episodes


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--path", default="pcells",
                    choices=["pcells", "cells", "blocked"])
    ap.add_argument("--devs", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--chain", type=int, default=1,
                    help="episodes rolled inside ONE jitted dispatch "
                         "(rollout_large n_episodes) — amortizes the "
                         "~25 ms tunnel RTT that dominates sub-ms "
                         "per-device step times")
    ap.add_argument("--mode", default="band", choices=["band", "mesh"])
    ap.add_argument("--edge-mult", type=float, default=1.0,
                    help="pcells cell-edge multiple (occupancy/padding "
                         "trade; make_pcell_spec edge_mult)")
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
    from jax.sharding import Mesh

    from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
    from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
    from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

    acfg = ActorConfig(n_s=6, n_a=2, hidden=HIDDEN, k=K, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    p = FlockingParams(n_agents=args.n, episode_steps=args.steps)
    devs = jax.devices()
    print(f"backend={jax.default_backend()} devices={len(devs)} "
          f"mode={args.mode} path={args.path} N={args.n}", flush=True)

    # psum volume per step: frame (N,10) + ystack adjT columns
    # sum_{s=1..K-1} (K-s)*F  -> K=3, F=6: 12+6 = 18  => (N, 28) float32
    psum_mb = args.n * (10 + sum((K - s) * 6 for s in range(1, K))) * 4 / 1e6

    rows = []
    t1 = None
    for d in args.devs:
        if args.mode == "band":
            mesh = Mesh(np.asarray(devs[:1]), axis_names=("agents",))
            kw = dict(mesh=mesh, force_n_dev=d) if d > 1 else dict(mesh=mesh)
        else:
            if len(devs) < d:
                print(f"skip D={d}: only {len(devs)} devices")
                continue
            mesh = Mesh(np.asarray(devs[:d]), axis_names=("agents",))
            kw = dict(mesh=mesh)

        def run():
            r, _, ovf = rollout_large(
                params, acfg, jax.random.key(1), p, path=args.path,
                return_overflow=True, cell_edge_mult=args.edge_mult,
                cap=args.cap, n_episodes=args.chain, **kw,
            )
            # host sync via np.asarray — block_until_ready is a no-op on
            # the axon TPU tunnel (same workaround as bench.py)
            float(np.asarray(r).sum())
            return ovf

        ep_s = _time_rollout(run, args.episodes)
        ms = ep_s / (args.steps * args.chain) * 1e3
        if d == args.devs[0]:
            t1 = ms * d          # normalize in case devs[0] != 1
        eff = t1 / (d * ms)
        rows.append({"D": d, "ms_per_step": round(ms, 2),
                     "efficiency": round(eff, 3)})
        print(f"D={d}: {ms:.2f} ms/step   eff={eff:.1%}", flush=True)

    print(json.dumps({
        "mode": args.mode, "path": args.path, "n": args.n,
        "psum_mb_per_step": round(psum_mb, 2), "rows": rows,
    }))


if __name__ == "__main__":
    main()
