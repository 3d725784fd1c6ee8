"""Imitation training (cloning / DAGGER) at large N — the O(N) cell paths
as a TRAINING capability, not just an eval one.

The reference trains at N = 100 (cfg/dagger.cfg) and its dense (K, N, N)
state representation caps it near N ≈ 250 (SURVEY §5); its transfer story
is therefore train-small / evaluate-big (test_model_transfer.py). This
module removes the training ceiling: the DAGGER/cloning round runs
end-to-end on one chip (or a mesh) at N = 32,768+ using the same O(N)
fused Pallas cell sweeps the large-N *evaluation* path uses
(parallel/large_n.py), so a policy can be trained IN the regime it will
be deployed in — something no reference-shaped program can represent.

Design (TPU-first):

* **Collection** is one ``lax.scan`` episode over the cell-path frame +
  delayed y-stack (ops/pallas_cells.py): per step the (K, N, F)
  pre-aggregated features, the expert labels, and the DAGGER beta coin —
  semantics identical to algos/imitation.py:rollout_episode (per-step
  expert coin with prob beta, expert labels always, reference
  gnn_dagger.py:156-178), verified by tests/test_imitation_large.py
  against the dense path at small N.

* **Agent-subsampled replay**: a stored record is ``store_agents`` agents'
  pre-aggregated rows ``(K, S, F)`` + labels ``(S, 2)``, drawn uniformly
  WITH replacement per step. Because ``ind_agg == 0`` the policy output
  for agent i depends only on its own pre-aggregated rows, so the MSE over
  a uniform agent subsample is an unbiased estimator of the full-swarm MSE
  — the gradient signal is exact in expectation while buffer memory drops
  N/S-fold (10k records at N=32k would be 24 GB un-subsampled; 3.3 GB at
  S=4096). Uniform-with-replacement costs O(S) per step (no second
  full-swarm sort); collision rate at S=4096 of 32k is ~6% and only
  reweights a few rows within one record.

* **Updates** are the parent class's scan of Adam steps on replay batches
  (``_loss_fn`` is shape-polymorphic over the agent axis).

* **Exactness gate**: the per-episode max neighbor-structure overflow is
  returned to the host and a nonzero value raises — a training run that
  silently dropped neighbors is not a result (repo contract, SURVEY §7).

* **Mesh mode**: collection runs under ``shard_map`` with the grid-row
  band partition of the cell sweeps (parallel/large_n.py semantics); the
  update scan stays in the outer jit on replicated params. A 2D
  ``('env', 'agents')`` mesh additionally shards the round's
  ``n_rollout_envs`` episodes over the env axis — data parallelism over
  episodes composed with agent-axis graph parallelism, the combination
  the r4 trainer refused (single-env restriction lifted in r5). Parity
  with the single-device round is asserted on the virtual CPU mesh in CI.

Checkpoint/resume, beta schedule, best-eval tracking, and the train() loop
are inherited unchanged from :class:`ImitationLearner`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multiagent_gnn_policies_tpu.algos.imitation import (
    ImitationConfig,
    ImitationLearner,
    _loss_fn,
)
from multiagent_gnn_policies_tpu.algos.replay import (
    replay_insert_batch,
    replay_sample,
)
from multiagent_gnn_policies_tpu.envs.flocking import ENV_REGISTRY, FlockingParams
from multiagent_gnn_policies_tpu.models.actor import ActorConfig, actor_forward
from multiagent_gnn_policies_tpu.ops.blocked import (
    delay_carry_init,
    delay_carry_update,
)
from multiagent_gnn_policies_tpu.parallel.large_n import (
    LargeNConfig,
    _cell_row_range,
    _dynamics,
    _frame,
    _reset,
    _reward,
    _s0_cols,
    _use_fused,
    _ystack,
    pick_block,
    rollout_large,
)
from multiagent_gnn_policies_tpu.utils.config import ExperimentConfig
import optax


@dataclasses.dataclass(frozen=True)
class LargeNImitationConfig(ImitationConfig):
    """ImitationConfig + the large-N collection knobs.

    Attributes:
      store_agents: agents per stored replay record (uniform subsample;
        0 = all agents — only sensible at small N).
      graph_path: graph backend for collection/eval — "auto" picks
        parallel/large_n.py's size-based default ("pcells" at N >= 32768).
      cell_margin: cell-grid extent margin (see rollout_large).
    """

    store_agents: int = 4096
    graph_path: str = "auto"
    cell_margin: float = 1.3
    cell_cap: int = 0          # 0 = path default (cfg key cell_cap)
    cell_edge_mult: float = 1.0  # pcells edge multiple (cfg cell_edge_mult)

    @classmethod
    def from_experiment(cls, x: ExperimentConfig, mode: Optional[str] = None,
                        k: Optional[int] = None) -> "LargeNImitationConfig":
        base = ImitationConfig.from_experiment(x, mode=mode, k=k)
        s = x.store_agents or min(x.n_agents, 4096)
        return cls(
            **dataclasses.asdict(base) | {
                "actor": base.actor, "env": base.env,
            },
            store_agents=min(s, x.n_agents),
            graph_path=x.graph_path,
            cell_cap=x.cell_cap,
            cell_margin=x.cell_margin,
            cell_edge_mult=x.cell_edge_mult,
        )


def _collect_episode(
    cfg: LargeNConfig,
    acfg: ActorConfig,
    mode: str,
    s_store: int,
    T: int,
    params,
    key: jax.Array,
    beta: jax.Array,
):
    """One fused collecting episode at scale.

    Returns ``(samples {agg (T,K,S,F), act (T,S,2)}, ep_reward, overflow)``
    — the same quantities algos/imitation.py:rollout_episode produces,
    computed through the O(N) cell paths and agent-subsampled. Runs
    identically single-device or inside shard_map (collectives gated on
    ``cfg.axis``, exactly like parallel/large_n.py:_rollout_body).
    """
    p = cfg.params
    reset_key, scan_key = jax.random.split(key)
    x, fq, nl = _reset(cfg, reset_key, centralized=True)
    k = acfg.k
    carry = delay_carry_init(fq.values, p.n_agents, k)
    sparse = cfg.path in ("binned", "cells", "pcells")
    ovf = nl.overflow if sparse else jnp.zeros((), jnp.int32)
    n_gh = k - 2 if cfg.path == "pcells" else 0
    gh = tuple(nl for _ in range(n_gh))
    fused = _use_fused(cfg, acfg, expert_mode=False)
    if fused:
        s0 = jnp.zeros((p.n_agents, (k - 1) * carry.history.shape[-1]))
    else:
        s0 = jnp.zeros(())

    def body(state, keys):
        step_key, coin_key, idx_key = keys
        x, carry, fq, nl, gh, s0, ovf = state
        if fused:
            from multiagent_gnn_policies_tpu.ops.pallas_cells import (
                ystack_pre,
            )

            crr, ax = _cell_row_range(cfg)
            y = ystack_pre(carry, s0, cfg.cell_spec, p,
                           grid_hist=gh or None, row_range=crr,
                           axis_name=ax)
        else:
            y = _ystack(cfg, carry, x, fq.degree, nl, grid_hist=gh or None)
        expert = fq.expert
        if mode == "cloning":
            act = expert                       # expert-only rollout
        else:                                  # dagger beta mixing
            learner_act = actor_forward(params, acfg, y, None)
            coin = jax.random.bernoulli(coin_key, beta)
            act = jnp.where(coin, expert, learner_act)
        # uniform WITH replacement: unbiased MSE subsample, O(S) per step
        idx = jax.random.randint(idx_key, (s_store,), 0, p.n_agents)
        sample = {"agg": y[:, idx, :], "act": expert[idx]}
        pos_prev = x[:, :2]
        x2 = _dynamics(x, act, p, step_key)
        if fused:
            fq2, nl2, s02 = _frame(cfg, x2, True,
                                   apply_cols=_s0_cols(carry))
        else:
            fq2, nl2 = _frame(cfg, x2, True)
            s02 = s0
        if sparse:
            ovf = jnp.maximum(ovf, nl2.overflow)
        carry2 = delay_carry_update(
            carry, fq2.values, pos_prev,
            deg_prev=fq.degree if carry.deg_hist.shape[0] else None,
        )
        gh2 = (nl,) + gh[:-1] if n_gh else gh
        return (x2, carry2, fq2, nl2, gh2, s02, ovf), (sample, _reward(x2))

    keys = tuple(jax.random.split(k_, T)
                 for k_ in jax.random.split(scan_key, 3))
    (*_, ovf), (samples, rewards) = jax.lax.scan(
        body, (x, carry, fq, nl, gh, s0, ovf), keys
    )
    return samples, jnp.sum(rewards), ovf


class LargeNImitationLearner(ImitationLearner):
    """Cloning/DAGGER driver at large N (cell-path collection, subsampled
    replay). ``mesh``: optional device mesh — 1D ``('agents',)`` bands the
    cell sweeps per episode (grid-row partition), 2D ``('env', 'agents')``
    additionally data-parallels the round's ``n_rollout_envs`` episodes
    over the env axis (each env group collects its own episodes at
    1/D_agents sweep work; replay insert and the update scan run on
    replicated params — XLA dedupes them across the mesh)."""

    def __init__(self, cfg: LargeNImitationConfig, logger=None,
                 mesh: Optional[Mesh] = None, axis: str = "agents"):
        self.mesh, self.axis = mesh, axis
        # mesh may be 1D ('agents',) — banded sweeps — or 2D
        # ('env', 'agents') — data-parallel episodes x banded sweeps
        # (r4 VERDICT weak #4: the env-axis parallelism that existed at
        # small N now composes with agent sharding at scale)
        ax_sizes = (dict(zip(mesh.axis_names, mesh.devices.shape))
                    if mesh is not None else {})
        self._env_axis = "env" if "env" in ax_sizes else None
        n_env_shards = ax_sizes.get("env", 1)
        if cfg.n_rollout_envs % max(n_env_shards, 1):
            raise ValueError(
                f"n_rollout_envs={cfg.n_rollout_envs} must divide evenly "
                f"over the mesh env axis ({n_env_shards})"
            )
        p = ENV_REGISTRY[cfg.env_name](cfg.env)
        # resolve the graph backend exactly as rollout_large does
        n_dev = ax_sizes.get(axis, 1)
        path = cfg.graph_path
        if path == "auto":
            path = "pcells" if p.n_agents >= 32768 else "blocked"
        cell_spec = None
        if path == "cells":
            from multiagent_gnn_policies_tpu.ops.cells import make_cell_spec
            cell_spec = make_cell_spec(p, cap=cfg.cell_cap or 12,
                                       margin=cfg.cell_margin, n_dev=n_dev)
        elif path == "pcells":
            from multiagent_gnn_policies_tpu.ops.pallas_cells import (
                make_pcell_spec,
            )
            cell_spec = make_pcell_spec(p, cap=cfg.cell_cap or 16,
                                        margin=cfg.cell_margin, n_dev=n_dev,
                                        edge_mult=cfg.cell_edge_mult)
        rows = p.n_agents // n_dev
        self._lcfg = LargeNConfig(
            params=p, block=pick_block(rows), rows=rows,
            axis=axis if (mesh is not None and axis in ax_sizes) else None,
            path=path, cap=32, cell_spec=cell_spec, n_dev=n_dev,
        )
        super().__init__(cfg, logger)
        self._round_jit = self._round          # 6-output jitted round
        self._round = self._round_host         # host wrapper: overflow gate

    def _example_record(self) -> dict:
        cfg = self.cfg
        s = cfg.store_agents or cfg.env.n_agents
        return {
            "agg": jnp.zeros((cfg.actor.k, s, cfg.actor.n_s)),
            "act": jnp.zeros((s, cfg.actor.n_a)),
        }

    def _collect_fn(self):
        """Collection callable ``(params, key, beta) -> (samples,
        mean_ep_reward, max_overflow)`` with ``samples`` flattened to
        ``n_rollout_envs * T`` leading records.

        Parallel structure by setup:
          * no mesh — ``vmap`` over the round's episodes (E = 1 stays the
            single lane);
          * 1D ('agents',) mesh — every device runs all E episodes with
            the cell sweeps grid-row-banded (collectives over 'agents');
          * 2D ('env', 'agents') mesh — episodes are data-parallel over
            the env axis AND each episode's sweeps are banded over the
            agents axis: the per-device program is its env slice's
            episodes at 1/D_agents of the sweep work.
        """
        cfg = self.cfg
        E = cfg.n_rollout_envs
        collect = partial(
            _collect_episode, self._lcfg, cfg.actor, cfg.mode,
            cfg.store_agents or cfg.env.n_agents, cfg.env.episode_steps,
        )

        def flatten(samples):
            return jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), samples
            )

        if self.mesh is None:
            def multi(params, key, beta):
                samples, rews, ovfs = jax.vmap(
                    lambda k: collect(params, k, beta)
                )(jax.random.split(key, E))
                return flatten(samples), jnp.mean(rews), jnp.max(ovfs)
            return multi

        env_ax = self._env_axis

        def local_collect(params, keys, beta):
            samples, rews, ovfs = jax.vmap(
                lambda k: collect(params, k, beta)
            )(keys)
            ovf = jnp.max(ovfs)
            if env_ax is not None:
                ovf = jax.lax.pmax(ovf, env_ax)   # gate sees every shard
            return samples, rews, ovf

        pe = P(env_ax) if env_ax is not None else P()
        sm = jax.shard_map(
            local_collect, mesh=self.mesh,
            in_specs=(P(), pe, P()), out_specs=(pe, pe, P()),
            check_vma=False,
        )

        def run(params, key, beta):
            samples, rews, ovf = sm(params, jax.random.split(key, E), beta)
            return flatten(samples), jnp.mean(rews), ovf
        return run

    # --- jitted round: collect -> insert -> update scan (one program) ---

    @staticmethod
    def _round_impl(self, params, opt_state, buffer, key, beta):
        cfg = self.cfg
        ro_key, up_key = jax.random.split(key)
        samples, ep_reward, ovf = self._collect_fn()(params, ro_key, beta)
        buffer = replay_insert_batch(buffer, samples)

        def one_update(carry, k):
            params, opt_state = carry
            batch = replay_sample(buffer, k, cfg.batch_size)
            loss, grads = jax.value_and_grad(_loss_fn)(params, cfg.actor, batch)
            updates, opt_state = self.tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        def run_updates(args):
            params, opt_state = args
            # updates_per_step x episodes collected this round (parent
            # semantics: the reference schedule is per EPISODE)
            n_up = cfg.updates_per_episode * cfg.n_rollout_envs
            keys = jax.random.split(up_key, n_up)
            (params, opt_state), losses = jax.lax.scan(
                one_update, (params, opt_state), keys
            )
            return params, opt_state, jnp.sum(losses)

        params, opt_state, loss_sum = jax.lax.cond(
            buffer.size > cfg.batch_size,
            run_updates,
            lambda args: (args[0], args[1], jnp.zeros(())),
            (params, opt_state),
        )
        return params, opt_state, buffer, ep_reward, loss_sum, ovf

    def _round_host(self, params, opt_state, buffer, key, beta):
        params, opt_state, buffer, ep_reward, loss_sum, ovf = self._round_jit(
            params, opt_state, buffer, key, beta
        )
        ovf = int(ovf)                        # host sync: exactness gate
        if ovf:
            raise RuntimeError(
                f"neighbor-structure overflow={ovf} during collection — "
                f"the episode dropped radius neighbors (cell over capacity "
                f"or agent outside the static grid extent); raise "
                f"cell_margin. Training on a truncated graph is invalid."
            )
        return params, opt_state, buffer, ep_reward, loss_sum

    # --- eval: greedy rollout_large episodes (host loop — each episode is
    #     seconds long at these N; vmapping them would multiply peak HBM) ---

    def evaluate(self):
        cfg = self.cfg
        rewards = []
        for _ in range(cfg.n_test_episodes):
            r, _x, ovf = rollout_large(
                self.params, cfg.actor, self._next_key(), self._lcfg.params,
                mesh=self.mesh, path=self._lcfg.path,
                cell_margin=cfg.cell_margin, return_overflow=True,
                cap=cfg.cell_cap or None,
                cell_edge_mult=cfg.cell_edge_mult,
            )
            tot = float(np.asarray(r).sum())
            if int(ovf) or not np.isfinite(tot):
                raise RuntimeError(
                    f"eval episode overflow={int(ovf)} reward={tot} — "
                    f"invalid rollout, refusing to score it"
                )
            rewards.append(tot)
        return float(np.mean(rewards)), float(np.std(rewards))


def train_dagger_large(cfg: ExperimentConfig, logger=None, save_path=None,
                       state_path=None, checkpoint_every=0) -> dict:
    learner = LargeNImitationLearner(
        LargeNImitationConfig.from_experiment(cfg, mode="dagger"), logger
    )
    return learner.train(save_path, state_path, checkpoint_every)


def train_cloning_large(cfg: ExperimentConfig, logger=None, save_path=None,
                        state_path=None, checkpoint_every=0) -> dict:
    learner = LargeNImitationLearner(
        LargeNImitationConfig.from_experiment(cfg, mode="cloning"), logger
    )
    return learner.train(save_path, state_path, checkpoint_every)
