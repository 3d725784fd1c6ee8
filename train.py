#!/usr/bin/env python3
"""Experiment driver CLI — same interface as the reference's train.py.

    python3 train.py cfg/dagger.cfg

Reads an INI experiment file (one section = one experiment; [DEFAULT]
inherited — reference train.py:46-63, and the reference's own cfg files work
unchanged), runs each section's algorithm, and prints the same CSV rows:

    <header>
    <section>, <mean>, <std>

Algorithms: dagger | cloning | baseline | ddpg (the reference reaches ddpg
only via the standalone learner/gnn_ddpg.py; here it is a first-class alg).

Extra (all optional): ``--metrics PATH`` for a JSONL metric stream, and the
TPU-framework cfg keys documented in utils/config.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def run_experiment(section, metrics_path=None, state_dir=None,
                   checkpoint_every=0):
    # Import late so `train.py --help` stays instant.
    import jax
    from multiagent_gnn_policies_tpu.utils.jax_setup import (
        enable_persistent_cache,
        respect_platform_env,
    )

    from multiagent_gnn_policies_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    respect_platform_env()
    maybe_initialize_distributed()  # env-driven multi-host bootstrap
    enable_persistent_cache()
    from multiagent_gnn_policies_tpu.utils.config import ExperimentConfig
    from multiagent_gnn_policies_tpu.utils.metrics import MetricsLogger
    from multiagent_gnn_policies_tpu.algos.imitation import train_cloning, train_dagger
    from multiagent_gnn_policies_tpu.algos.baseline import train_baseline

    cfg = ExperimentConfig.from_section(section)
    np.random.seed(cfg.seed)  # host-side seeding; device PRNG is keyed per-run

    trainers = {
        "dagger": train_dagger,
        "cloning": train_cloning,
        "baseline": train_baseline,
    }
    use_large = cfg.trainer == "large" or (
        cfg.trainer == "auto" and cfg.n_agents > 1024
    )
    if use_large and cfg.alg in ("dagger", "cloning"):
        # large-N trainer: O(N) cell-path collection + subsampled replay
        # (the dense (K,N,N) representation is unusable at these N)
        from multiagent_gnn_policies_tpu.algos.imitation_large import (
            train_cloning_large,
            train_dagger_large,
        )
        trainers["dagger"] = train_dagger_large
        trainers["cloning"] = train_cloning_large
    if cfg.alg == "ddpg":
        if use_large:
            # positions-record replay + graph-from-positions updates: the
            # dense (K,N,N) record is unusable at these N (algos/ddpg_large)
            from multiagent_gnn_policies_tpu.algos.ddpg_large import (
                train_ddpg_large,
            )
            trainers["ddpg"] = train_ddpg_large
        else:
            from multiagent_gnn_policies_tpu.algos.ddpg import train_ddpg
            trainers["ddpg"] = train_ddpg
    if cfg.alg not in trainers:
        raise SystemExit(f"Invalid algorithm/mode name: {cfg.alg!r}")

    save_path = None
    if cfg.fname:
        save_path = os.path.join("models", f"actor_{cfg.env}_{cfg.fname}")

    import contextlib

    precision_ctx = (
        jax.default_matmul_precision("highest")
        if cfg.matmul_precision == "highest"
        else contextlib.nullcontext()   # no-op; keeps the compile-cache key
    )
    extra = {}
    if state_dir and cfg.alg in ("dagger", "cloning", "ddpg"):
        # full-training-state checkpointing: crash-safe restart per section
        os.makedirs(state_dir, exist_ok=True)
        extra = {
            "state_path": os.path.join(
                state_dir, f"{section.name or 'DEFAULT'}_state.npz"
            ),
            "checkpoint_every": checkpoint_every,
        }
    with MetricsLogger(metrics_path, echo=cfg.debug) as logger:
        with precision_ctx:
            stats = trainers[cfg.alg](
                cfg, logger=logger, save_path=save_path, **extra
            )
    return cfg, stats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="INI experiment file (reference-compatible)")
    ap.add_argument("--metrics", default=None, help="JSONL metrics output path")
    ap.add_argument("--sections", default=None,
                    help="comma-separated subset of sections to run")
    ap.add_argument("--state-dir", default=None,
                    help="directory for full-training-state checkpoints; "
                         "an existing state file there resumes the section")
    ap.add_argument("--checkpoint-every", type=int, default=10,
                    help="rounds between state checkpoints (with --state-dir)")
    ap.add_argument("--profile", default=None,
                    help="emit a TensorBoard/XProf trace of the whole run "
                         "into this directory")
    args = ap.parse_args(argv)

    from multiagent_gnn_policies_tpu.utils.config import load_ini

    config = load_ini(args.config)
    only = set(args.sections.split(",")) if args.sections else None

    from multiagent_gnn_policies_tpu.utils.profiling import trace

    sections = [s for s in config.sections() if only is None or s in only]
    with trace(args.profile):
        run_all(sections, config, args)


def run_all(sections, config, args):
    printed_header = False
    if sections:
        for name in sections:
            section = config[name]
            if not printed_header:
                print(section.get("header"))
                printed_header = True
            _, stats = run_experiment(
                section, args.metrics, args.state_dir, args.checkpoint_every
            )
            print(f"{name}, {stats['mean']}, {stats['std']}")
    else:
        _, stats = run_experiment(
            config[config.default_section], args.metrics,
            args.state_dir, args.checkpoint_every,
        )
        print(stats)


if __name__ == "__main__":
    main()
