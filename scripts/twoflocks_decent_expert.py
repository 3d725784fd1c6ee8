#!/usr/bin/env python3
"""Decentralized-expert baseline on FlockingTwoFlocks-v0 at large N with
the SAME per-episode seed stream evaluate.py uses (fold_in(key(seed), ep))
— the paired lower anchor for the RESULTS §8 TwoFlocks gap analysis.

    python -u scripts/twoflocks_decent_expert.py --n 32768 --episodes 24
"""

from __future__ import annotations

import argparse
import os
import sys

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
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--episodes", type=int, default=24)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    from multiagent_gnn_policies_tpu.envs.flocking import ENV_REGISTRY, FlockingParams
    from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

    p = ENV_REGISTRY["FlockingTwoFlocks-v0"](
        FlockingParams(n_agents=args.n)
    )
    rewards = []
    for ep in range(args.episodes):
        key = jax.random.fold_in(jax.random.key(args.seed), ep)
        r, _, ovf = rollout_large(
            None, None, key, p, expert_mode=True, centralized_expert=False,
            return_overflow=True, cell_margin=1.6, cap=32,
        )
        tot = float(np.asarray(r).sum())
        assert int(ovf) == 0 and np.isfinite(tot), (int(ovf), tot)
        print(tot, flush=True)
        rewards.append(tot)
    print(f"decentralized, {np.mean(rewards)}, {np.std(rewards)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
