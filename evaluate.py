#!/usr/bin/env python3
"""Checkpoint evaluation CLI — the reference's ``test_model.py`` and
``test_model_transfer.py`` in one tool.

Plain evaluation (reference test_model.py:50-65 — greedy rollouts of a saved
actor under a cfg section's env):

    python evaluate.py cfg/dagger.cfg --actor-path models/actor_FlockingRelative-v0_dagger_k3

Transfer evaluation (reference test_model_transfer.py:75-95 — a per-section
``k`` picks checkpoint ``<base><k>`` and builds the learner *and* the delayed
state with that ``k``, decoupling filter length from the training cfg):

    python evaluate.py cfg/transfer.cfg --actor-base models/actor_transfer

Checkpoints may be either this framework's ``.npz`` pytrees or reference
torch ``state_dict`` files (auto-detected), so the shipped
``/root/reference/models/actor_FlockingRelative-v0_dagger_k3`` evaluates
directly. Output: the same CSV rows as training (``section, mean, std``),
per-episode rewards with ``--per-episode`` (reference debug print,
test_model_transfer.py:53), and ``--save-trajectory out.npz`` dumps one
greedy episode's positions/velocities for visualization (the TPU-side
replacement for ``env.render()``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_actor_params(path: str):
    """Load actor params from .npz (ours) or a torch state_dict (reference)."""
    from multiagent_gnn_policies_tpu.models.torch_import import (
        actor_params_from_state_dict,
    )

    if path.endswith(".npz"):
        import jax.numpy as jnp

        with np.load(path, allow_pickle=False) as z:
            n_layers = sum(1 for k in z.files if k.startswith("leaf_")) // 2
            leaves = [z[f"leaf_{i}"] for i in range(2 * n_layers)]
        # checkpoint.save flattens [{'b','w'}...] in sorted-key order
        return [
            {"b": jnp.asarray(leaves[2 * i]), "w": jnp.asarray(leaves[2 * i + 1])}
            for i in range(n_layers)
        ]
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return actor_params_from_state_dict(sd)


def evaluate_section(section, actor_path: str, k=None, per_episode=False,
                     traj_path=None):
    import jax
    import jax.numpy as jnp
    from multiagent_gnn_policies_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    from multiagent_gnn_policies_tpu.algos.imitation import (
        ImitationConfig,
        ImitationLearner,
    )
    from multiagent_gnn_policies_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig.from_section(section)
    icfg = ImitationConfig.from_experiment(cfg, mode="dagger", k=k)
    learner = ImitationLearner(icfg)
    params = load_actor_params(actor_path)
    # shape-check against the freshly initialized params
    for got, want in zip(params, learner.params):
        if got["w"].shape != want["w"].shape:
            raise SystemExit(
                f"checkpoint layer shape {got['w'].shape} != cfg-implied "
                f"{want['w'].shape} (actor {icfg.actor}) for {actor_path}"
            )
    learner.params = params

    rewards = np.asarray(learner._eval(params, jax.random.key(cfg.seed)))
    if per_episode:
        for r in rewards:
            print(float(r))
    if traj_path:
        from multiagent_gnn_policies_tpu.algos.imitation import rollout_trajectory

        xs, rs = rollout_trajectory(
            params, jax.random.key(cfg.seed), learner.env, icfg.actor
        )
        np.savez(traj_path, x=np.asarray(xs), reward=np.asarray(rs))
        print(f"# trajectory ({xs.shape[0]} steps, N={xs.shape[1]}) -> {traj_path}")
    return {"mean": float(rewards.mean()), "std": float(rewards.std())}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="INI experiment file")
    ap.add_argument("--actor-path", help="checkpoint evaluated for every section")
    ap.add_argument("--actor-base",
                    help="transfer mode: per-section k selects <base><k>")
    ap.add_argument("--k", type=int, default=None,
                    help="filter-length override (transfer across K)")
    ap.add_argument("--per-episode", action="store_true",
                    help="print every episode reward")
    ap.add_argument("--save-trajectory", default=None,
                    help="dump one greedy episode's agent states to this .npz")
    args = ap.parse_args(argv)
    if bool(args.actor_path) == bool(args.actor_base):
        ap.error("exactly one of --actor-path / --actor-base is required")

    from multiagent_gnn_policies_tpu.utils.config import load_ini

    config = load_ini(args.config)
    sections = config.sections() or [config.default_section]
    printed_header = False
    for name in sections:
        section = config[name]
        if not printed_header:
            print(section.get("header"))
            printed_header = True
        if args.actor_base:
            k = section.getint("k")
            path = f"{args.actor_base}{k}"
            if not os.path.exists(path) and os.path.exists(path + ".npz"):
                path += ".npz"
        else:
            k, path = args.k, args.actor_path
        stats = evaluate_section(section, path, k=k,
                                 per_episode=args.per_episode,
                                 traj_path=args.save_trajectory)
        print(f"{name}, {stats['mean']}, {stats['std']}")


if __name__ == "__main__":
    main()
