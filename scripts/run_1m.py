#!/usr/bin/env python3
"""The 1,000,000-agent full-horizon policy rollout on one chip.

Round 3 established the N=1M single-chip envelope at T=50: the single-scan
T=200 episode crashed the TPU worker on peak-HBM pressure (r3 VERDICT weak
#5). This runs the FULL reference horizon (T=200, cfg/dagger.cfg) as
``scan_chunks`` jitted scans with the episode state crossing the host
boundary between them — bitwise-identical stepping (parity test:
tests/test_large_n_lattice.py::test_chunked_episode_bitwise_parity), with
per-chunk peak memory bounded by a known-good T=50 program shape.

    python -u scripts/run_1m.py [--n 1000000] [--steps 200] [--chunks 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from multiagent_gnn_policies_tpu.utils.jax_setup import (  # noqa: E402
    enable_persistent_cache,
    respect_platform_env,
)

respect_platform_env()
enable_persistent_cache()

import jax  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--edge-mult", type=float, default=2.0,
                    help="pcells cell-edge multiple (make_pcell_spec "
                         "edge_mult). Default 2.0 with --cap 32: at N=1M "
                         "the pack's slot-row gather is the step's "
                         "dominant cost (~7 ns/row), so halving slot "
                         "count vs edge1/cap16 took the full horizon "
                         "460 -> 322 ms/step, overflow=0 certified "
                         "(results/run_1m_e2c32_head.log)")
    ap.add_argument("--cap", type=int, default=32,
                    help="cell slot capacity (the occupancy-adaptive "
                         "kernels price rows by occupancy, so a generous "
                         "cap costs slots, not compute)")
    ap.add_argument("--traj", default=None,
                    help="dump a 2000-agent subset trajectory npz here")
    args = ap.parse_args()

    from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
    from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
    from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

    acfg = ActorConfig(n_s=6, n_a=2, hidden=(32, 32), k=3, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    p = FlockingParams(n_agents=args.n, episode_steps=args.steps)
    traj_agents = min(2000, args.n) if args.traj else 0

    t0 = time.perf_counter()
    out = rollout_large(params, acfg, jax.random.key(11), p, path="pcells",
                        return_overflow=True, scan_chunks=args.chunks,
                        cell_edge_mult=args.edge_mult, cap=args.cap,
                        traj_agents=traj_agents)
    r, final_x, ovf = out[:3]
    tot = float(np.asarray(r).sum())
    dt = time.perf_counter() - t0
    print(f"N={args.n} pcells POLICY k=3 T={args.steps} "
          f"(chunks={args.chunks}): reward_sum={tot:.1f} "
          f"overflow={int(ovf)} ({dt:.1f}s compile+episode)", flush=True)

    t0 = time.perf_counter()
    out = rollout_large(params, acfg, jax.random.key(12), p, path="pcells",
                        return_overflow=True, scan_chunks=args.chunks,
                        cell_edge_mult=args.edge_mult, cap=args.cap,
                        traj_agents=traj_agents)
    r2, final_x, ovf2 = out[:3]    # final frame of THIS episode (the one
                                   # whose trajectory is saved below)
    tot2 = float(np.asarray(r2).sum())
    dt = time.perf_counter() - t0
    print(f"steady: {dt / args.steps * 1e3:.1f} ms/step "
          f"reward={tot2:.1f} overflow={int(ovf2)}", flush=True)

    if args.traj:
        from multiagent_gnn_policies_tpu.parallel.large_n import (
            traj_subset_indices,
        )

        np.savez(args.traj, x=np.asarray(out[3]), reward=np.asarray(r2),
                 final_x=np.asarray(final_x),
                 subset_indices=np.asarray(
                     traj_subset_indices(args.n, traj_agents)))
        print(f"trajectory -> {args.traj}", flush=True)

    ok = (int(ovf) == 0 and int(ovf2) == 0
          and np.isfinite(tot) and np.isfinite(tot2))
    print(f"rc={0 if ok else 1}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
