"""Experiment configuration: ingests the reference's INI files unchanged.

One INI section = one experiment (reference train.py:46-63). The
``[DEFAULT]`` section supplies shared keys. All key names and types follow
the reference's ``configparser`` typed getters (SURVEY §2.10):

  alg, env, seed, debug, header, fname;
  batch_size, buffer_size, updates_per_step, actor_lr, n_train_episodes,
  beta_coeff, test_interval, n_test_episodes;
  k, hidden_size, n_layers, gamma, tau;
  v_max, comm_radius, n_agents, n_actions, n_states, dt; centralized.

Extra keys understood only by this framework (optional, defaulted):
  n_rollout_envs   parallel envs per training round (default 1 — reference
                   semantics; raise for throughput),
  episode_steps    fixed episode horizon (default 200, the gym TimeLimit
                   the reference relies on),
  matmul_precision jax matmul precision for train/eval ('default'|'highest').
"""

from __future__ import annotations

import configparser
import dataclasses
from typing import Optional, Tuple


def load_ini(path: str) -> configparser.ConfigParser:
    # strict=False: some of the reference's generated cfg files contain
    # duplicate keys (e.g. cfg/default_baseline.cfg repeats `dt`); accept
    # them with last-value-wins instead of crashing.
    cp = configparser.ConfigParser(strict=False)
    with open(path) as f:
        cp.read_file(f)
    return cp


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Typed view of one INI section."""

    # experiment
    alg: str = "dagger"
    env: str = "FlockingRelative-v0"
    seed: int = 11
    debug: bool = False
    header: Optional[str] = None
    fname: Optional[str] = None
    # learning
    batch_size: int = 20
    buffer_size: int = 10000
    updates_per_step: int = 200
    actor_lr: float = 5e-5
    # DDPG-only lrs; None = the reference's hardcoded 1e-5 / 1e-4
    # (gnn_ddpg.py:135-136). Imitation reads actor_lr instead.
    ddpg_actor_lr: Optional[float] = None
    ddpg_critic_lr: Optional[float] = None
    n_train_episodes: int = 400
    beta_coeff: float = 0.993
    test_interval: int = 40
    n_test_episodes: int = 20
    # architecture
    k: int = 3
    hidden_size: int = 32
    n_layers: int = 2            # `or 2` default, reference gnn_dagger.py:31
    gamma: float = 0.99
    tau: float = 0.5
    # env
    v_max: float = 3.0
    comm_radius: float = 1.0
    n_agents: int = 100
    n_actions: int = 2
    n_states: int = 6
    dt: float = 0.01
    centralized: bool = True
    # TPU-framework extensions
    reward_scale: float = 1.0    # DDPG TD-target reward scaling
    critic_gn: bool = True       # DDPG critic GroupNorm (models/critic.py)
    critic_input: str = "identity"  # DDPG critic input transform
    # DDPG policy class: "tanh" (bounded — the documented default, see
    # algos/ddpg.py conditioning rationale) or "none" (reference semantics:
    # raw actor output in the -Q loss, clip only at action selection,
    # gnn_ddpg.py:164-167,205-216)
    policy_bound: str = "tanh"
    n_rollout_envs: int = 1
    episode_steps: int = 200
    matmul_precision: str = "default"
    # large-N trainer (algos/imitation_large.py): agents per stored replay
    # record (0 = auto: min(n_agents, 4096)) and graph backend
    # ("auto" | "blocked" | "cells" | "pcells")
    store_agents: int = 0
    graph_path: str = "auto"
    # per-cell slot capacity for the cell-path grids (0 = path default:
    # 16 pcells / 12 cells) and grid-extent margin (multiple of the
    # single-disc initial extent; TwoFlocks' two offset discs need ~1.5+
    # — the exactness gate rejects an undersized grid).
    cell_cap: int = 0
    cell_margin: float = 1.3
    # pcells cell edge as a multiple of the minimum legal edge (the r5
    # occupancy/padding lever — ops/pallas_cells.py:make_pcell_spec;
    # the sweep stays exact for any value >= 1, and the per-step
    # overflow certificate still gates capacity)
    cell_edge_mult: float = 1.0
    # include the replay buffer in --state-dir checkpoints (True =
    # bit-exact resume; False = cheap checkpoints, resume refills the
    # buffer — algos/imitation.py:ImitationConfig.checkpoint_buffer)
    checkpoint_buffer: bool = True
    # trainer dispatch: "auto" routes dagger/cloning sections with
    # n_agents > 1024 through the large-N trainer (the dense (K,N,N)
    # path is the reference's representation, unusable at those N)
    trainer: str = "auto"

    @classmethod
    def from_section(cls, sec) -> "ExperimentConfig":
        """Build from a configparser section proxy (reference-compatible)."""

        def geti(key, default):
            v = sec.getint(key, fallback=None)
            return default if v is None else v

        def getf(key, default):
            v = sec.getfloat(key, fallback=None)
            return default if v is None else v

        def getb(key, default):
            v = sec.getboolean(key, fallback=None)
            return default if v is None else v

        def gets(key, default):
            v = sec.get(key, fallback=None)
            return default if v is None else v

        d = cls()
        return cls(
            alg=gets("alg", d.alg).lower(),
            env=gets("env", d.env),
            seed=geti("seed", d.seed),
            debug=getb("debug", d.debug),
            header=gets("header", d.header),
            fname=gets("fname", d.fname),
            batch_size=geti("batch_size", d.batch_size),
            buffer_size=geti("buffer_size", d.buffer_size),
            updates_per_step=geti("updates_per_step", d.updates_per_step),
            actor_lr=getf("actor_lr", d.actor_lr),
            ddpg_actor_lr=getf("ddpg_actor_lr", d.ddpg_actor_lr),
            ddpg_critic_lr=getf("ddpg_critic_lr", d.ddpg_critic_lr),
            n_train_episodes=geti("n_train_episodes", d.n_train_episodes),
            beta_coeff=getf("beta_coeff", d.beta_coeff),
            test_interval=geti("test_interval", d.test_interval),
            n_test_episodes=geti("n_test_episodes", d.n_test_episodes),
            k=geti("k", d.k),
            hidden_size=geti("hidden_size", d.hidden_size),
            n_layers=geti("n_layers", 0) or d.n_layers,
            gamma=getf("gamma", d.gamma),
            tau=getf("tau", d.tau),
            v_max=getf("v_max", d.v_max),
            comm_radius=getf("comm_radius", d.comm_radius),
            n_agents=geti("n_agents", d.n_agents),
            n_actions=geti("n_actions", d.n_actions),
            n_states=geti("n_states", d.n_states),
            dt=getf("dt", d.dt),
            centralized=getb("centralized", d.centralized),
            reward_scale=getf("reward_scale", d.reward_scale),
            critic_gn=getb("critic_gn", d.critic_gn),
            critic_input=gets("critic_input", d.critic_input),
            policy_bound=gets("policy_bound", d.policy_bound).lower(),
            n_rollout_envs=geti("n_rollout_envs", d.n_rollout_envs),
            episode_steps=geti("episode_steps", d.episode_steps),
            matmul_precision=gets("matmul_precision", d.matmul_precision),
            store_agents=geti("store_agents", d.store_agents),
            graph_path=gets("graph_path", d.graph_path).lower(),
            cell_cap=geti("cell_cap", d.cell_cap),
            cell_margin=getf("cell_margin", d.cell_margin),
            cell_edge_mult=getf("cell_edge_mult", d.cell_edge_mult),
            checkpoint_buffer=getb("checkpoint_buffer", d.checkpoint_buffer),
            trainer=gets("trainer", d.trainer).lower(),
        )

    @property
    def hidden(self) -> Tuple[int, ...]:
        return tuple([self.hidden_size] * self.n_layers)
