"""Expert-controller baseline (reference learner/gnn_baseline.py).

No learning: roll the analytic expert (centralized or decentralized per the
``centralized`` cfg key) for ``n_test_episodes`` and report mean/std episode
reward. All episodes run in parallel on device (vmap over episodes, scan over
steps) — one compiled call instead of the reference's Python loops.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams, make_env
from multiagent_gnn_policies_tpu.utils.config import ExperimentConfig


def train_baseline(cfg: ExperimentConfig, logger=None, save_path=None) -> dict:
    env = make_env(
        cfg.env,
        FlockingParams(
            n_agents=cfg.n_agents, comm_radius=cfg.comm_radius, dt=cfg.dt,
            v_max=cfg.v_max, episode_steps=cfg.episode_steps,
        ),
    )
    T = cfg.episode_steps
    centralized = cfg.centralized

    def episode(key):
        state, _ = env.reset(key)

        def body(s, _):
            u = env.controller(s, centralized=centralized)
            s, _, r, _ = env.step(s, u)
            return s, r

        _, rewards = jax.lax.scan(body, state, None, length=T)
        return jnp.sum(rewards)

    @jax.jit
    def run(key):
        keys = jax.random.split(key, cfg.n_test_episodes)
        return jax.vmap(episode)(keys)

    rewards = np.asarray(run(jax.random.key(cfg.seed)))
    stats = {"mean": float(rewards.mean()), "std": float(rewards.std())}
    if logger is not None:
        logger.log("baseline_eval", centralized=centralized, **stats)
    return stats
