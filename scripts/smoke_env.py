#!/usr/bin/env python3
"""Expert-rollout smoke test for every environment — the TPU-side equivalent
of the reference's interactive smoke scripts ``flocking_gym_test.py``
(infinite expert rollout + render, reference flocking_gym_test.py:23-34) and
``airsim_test.py`` (same for the AirSim env, reference airsim_test.py:13-24).

Instead of a live ``env.render()`` window (headless TPU host), each episode
runs as ONE jitted ``lax.scan`` and prints reward / velocity-disagreement
stats; ``--save out.npz`` dumps the trajectory in the same format as
``evaluate.py --save-trajectory`` so ``scripts/render_trajectory.py`` can
plot or animate it.

    python scripts/smoke_env.py                         # all envs, 2 eps each
    python scripts/smoke_env.py --env FlockingLeader-v0 --episodes 5
    python scripts/smoke_env.py --env FlockingAirsimAccel-v0 --decentralized \
        --save /tmp/airsim.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rollout_expert(env, key, centralized: bool):
    """One expert episode as a single compiled program: (x_traj, rewards)."""
    import jax
    import jax.numpy as jnp

    def ep(key):
        state, _ = env.reset(key)

        def body(state, _):
            a = env.controller(state, centralized=centralized)
            state, _, r, _ = env.step(state, a)
            return state, (state.x, r)

        _, (xs, rs) = jax.lax.scan(
            body, state, None, length=env.params.episode_steps
        )
        return xs, rs

    return jax.jit(ep)(key)


def velocity_disagreement(x: np.ndarray) -> float:
    """Mean squared deviation of each agent's velocity from the swarm mean —
    the flocking cost whose negative is the reward (reference README.md:22-28
    paper metric)."""
    v = x[:, 2:4]
    return float(np.mean(np.sum((v - v.mean(axis=0)) ** 2, axis=-1)))


def main(argv=None):
    from multiagent_gnn_policies_tpu.utils.jax_setup import respect_platform_env

    respect_platform_env()
    from multiagent_gnn_policies_tpu.envs.flocking import (
        ENV_REGISTRY,
        FlockingParams,
        make_env,
    )
    import jax

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env", default=None, choices=sorted(ENV_REGISTRY),
                    help="single env id (default: smoke ALL registered envs)")
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--n-agents", type=int, default=100)
    ap.add_argument("--comm-radius", type=float, default=1.0)
    ap.add_argument("--v-max", type=float, default=3.0)
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decentralized", action="store_true",
                    help="use the local-information expert "
                         "(reference controller(centralized=False))")
    ap.add_argument("--save", default=None,
                    help="dump the last episode's trajectory to this .npz "
                         "(keys: x (T,N,4), reward (T,))")
    args = ap.parse_args(argv)

    params = FlockingParams(
        n_agents=args.n_agents, comm_radius=args.comm_radius,
        v_max=args.v_max, dt=args.dt,
    )
    names = [args.env] if args.env else sorted(ENV_REGISTRY)
    centralized = not args.decentralized
    key = jax.random.key(args.seed)
    failures = 0

    for name in names:
        env = make_env(name, params)
        for ep in range(args.episodes):
            key, sub = jax.random.split(key)
            t0 = time.time()
            xs, rs = rollout_expert(env, sub, centralized)
            xs, rs = np.asarray(xs), np.asarray(rs)
            elapsed = time.time() - t0
            total = float(rs.sum())
            vd0 = velocity_disagreement(xs[0])
            vd1 = velocity_disagreement(xs[-1])
            ok = np.isfinite(xs).all() and np.isfinite(rs).all()
            # a sane expert should reduce velocity disagreement over the
            # episode (the stochastic env may keep a small noise floor)
            improved = vd1 < vd0 or vd1 < 0.1
            status = "ok" if (ok and improved) else "SUSPECT"
            failures += status != "ok"
            print(
                f"{name} ep{ep}: reward={total:9.2f}  "
                f"vel-disagreement {vd0:7.3f} -> {vd1:7.3f}  "
                f"[{len(rs)} steps, {elapsed:.2f}s]  {status}"
            )
        if args.save and name == names[-1]:
            np.savez(args.save, x=xs, reward=rs)
            print(f"# trajectory ({xs.shape[0]} steps, N={xs.shape[1]}) "
                  f"-> {args.save}")

    if failures:
        print(f"{failures} suspect episode(s)", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
