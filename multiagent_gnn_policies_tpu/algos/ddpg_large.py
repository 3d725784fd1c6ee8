"""DDPG past the reference's dense-record ceiling (r4 VERDICT weak #7).

The reference's replay stores, per transition, dense ``(K, N, N)`` GSO
tensors (its ``MultiAgentStateWithDelay`` objects — gnn_ddpg.py:258-304,
replay_buffer.py), capping RL training near N ~ 250 exactly like its
imitation path. The r4 port kept that representation (algos/ddpg.py
stores ``(N, N)`` networks). This module removes the STORAGE wall the
TPU way:

* **Replay stores positions, not matrices.** A radius graph is a pure
  function of agent positions, so a record keeps the raw feature history
  ``(K, N, S)``, the ``(K-1, N, 2)`` positions that source the delayed
  graphs, and the next step's ``(N, S)``/``(N, 2)`` — O(K·N) floats
  instead of O(K·N^2). At N=4,096 / K=2 a record is ~0.3 MB (the
  reference's would be ~260 MB).

* **Adjacency is rebuilt on the MXU at update time.** The gradient step
  reconstructs each sampled record's normalized adjacencies from
  positions (one fused pairwise map per graph — exact, no neighbor
  capacity, nothing to overflow) and the GNN applies become chains of
  ``A^T @ h`` dense matmuls — the shape the MXU is built for. The
  ``(K, N, N)`` GSO POWERS are never materialized either: the critic's
  per-layer ``[I, A, A^2, ...]`` application and the actor's delayed
  ``G_k = A_t ... A_{t-k+1}`` aggregation both run as chained
  transpose-applies (:func:`critic_forward_adj`,
  :func:`actor_forward_adj`), turning the O(K·N^2) memory term into
  O(N^2) transient compute tiles.

The ceiling that remains is the centralized critic's inherent
O(N^2)-per-update compute — a property of the reference's architecture
(per-layer whole-swarm GSO application, learner/critic.py:73-84), not of
the storage design; RESULTS §6b quantifies it.

Semantics match algos/ddpg.py exactly (same OU process, same target
structure, same loss order) — tests/test_ddpg_large.py asserts the
chained-apply forward passes equal the dense-GSO ones to float tolerance.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multiagent_gnn_policies_tpu.algos.ddpg import (
    DDPG,
    DDPGConfig,
    OUState,
    ou_reset,
    ou_step,
    TrainState,
    _soft_update,
)
from multiagent_gnn_policies_tpu.algos.replay import (
    replay_init,
    replay_insert_batch,
    replay_sample,
)
from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
from multiagent_gnn_policies_tpu.models.actor import ActorConfig
from multiagent_gnn_policies_tpu.models.critic import (
    CriticConfig,
    _GROUPNORM_EPS,
)
from multiagent_gnn_policies_tpu.ops.blocked import blocked_frame
from multiagent_gnn_policies_tpu.ops.graph import normalized_adjacency
from multiagent_gnn_policies_tpu.parallel.large_n import _dynamics, _reward
from multiagent_gnn_policies_tpu.utils.config import ExperimentConfig


def dense_adj_from_pos(pos: jax.Array, comm_radius: float) -> jax.Array:
    """Row-normalized radius-graph adjacency from positions — the exact
    quantity ``envs/flocking.py:observe`` returns as ``network``, rebuilt
    from an O(N) record (zero diagonal, degree-clamped mean pooling)."""
    d = pos[..., :, None, :] - pos[..., None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    n = pos.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    adj = jnp.where(eye, 0.0, (r2 < comm_radius**2).astype(pos.dtype))
    return normalized_adjacency(adj)


def actor_forward_adj(
    params, cfg: ActorConfig, hist: jax.Array, adjs: jax.Array
) -> jax.Array:
    """:func:`models.actor.actor_forward` with the delayed aggregation as
    chained transpose-applies over per-step adjacencies.

    Args:
      hist: ``(..., K, N, S)`` raw feature history ``[x_t .. x_{t-K+1}]``.
      adjs: ``(..., K-1, N, N)`` normalized adjacencies newest first
        (``adjs[0] = A_t``). The delayed operator ``G_k = A_t...A_{t-k+1}``
        is never built: ``G_k^T h = A_{t-k+1}^T(...(A_t^T h))``.
    """
    x = hist
    for i, layer in enumerate(params):
        w, b = layer["w"], layer["b"]
        if i == cfg.ind_agg:
            k = cfg.k
            outs = [x[..., 0, :, :]]
            v = x[..., 1:, :, :]                        # slots 1..K-1
            for s in range(k - 1):
                # apply A_{t-s}^T to every not-yet-finished slot
                v = jnp.einsum(
                    "...ij,...kif->...kjf", adjs[..., s, :, :], v,
                    preferred_element_type=v.dtype,
                )
                outs.append(v[..., 0, :, :])
                v = v[..., 1:, :, :]
            agg = jnp.stack(outs, axis=-3)              # (..., K, N, F)
            x = jnp.einsum(
                "gfk,...knf->...ng", w, agg, preferred_element_type=x.dtype
            ) + b
        else:
            x = jnp.einsum(
                "gf,...nf->...ng", w[:, :, 0], x, preferred_element_type=x.dtype
            ) + b
        if i < cfg.n_layers - 1:
            x = jnp.tanh(x)
        elif cfg.bound == "tanh":
            x = jnp.tanh(x)
    return x


def critic_forward_adj(
    params, cfg: CriticConfig, states: jax.Array, actions: jax.Array,
    adj: jax.Array,
) -> jax.Array:
    """:func:`models.critic.critic_forward` with the per-layer GSO-power
    application ``[I, A, .., A^{K-1}]`` as a chain of ``A^T`` applies —
    the ``(K, N, N)`` powers tensor is never materialized.

    Args:
      adj: ``(..., N, N)`` the CURRENT normalized adjacency (the critic is
        centralized and uses current-graph powers, gnn_ddpg.py:182,203).
    """
    if cfg.input_transform == "asinh":
        states = jnp.arcsinh(states)
    elif cfg.input_transform != "identity":
        raise ValueError(f"unknown critic input_transform {cfg.input_transform!r}")
    x = jnp.concatenate([states, actions], axis=-1)     # (..., N, W0)
    for i, layer in enumerate(params):
        if i > 0 or cfg.gso_first:
            zs = [x]
            for _ in range(cfg.k - 1):
                zs.append(jnp.einsum(
                    "...ij,...if->...jf", adj, zs[-1],
                    preferred_element_type=x.dtype,
                ))
            x = jnp.stack(zs, axis=-3)                  # (..., K, N, W)
        else:
            x = x[..., None, :, :]
        x = jnp.einsum(
            "gcf,...cnf->...ng", layer["w"], x, preferred_element_type=x.dtype
        ) + layer["b"]
        if i < cfg.n_layers - 1:
            if cfg.use_groupnorm:
                mean = jnp.mean(x, axis=-2, keepdims=True)
                var = jnp.var(x, axis=-2, keepdims=True)
                x = (x - mean) * jax.lax.rsqrt(var + _GROUPNORM_EPS)
                x = x * layer["gn_scale"] + layer["gn_bias"]
            x = jax.nn.relu(x)
    return x[..., 0]


class DDPGLarge(DDPG):
    """DDPG with the positions-record replay (O(K·N) per transition) and
    graph-from-positions gradient steps. Inherits the training loop,
    checkpoint/resume, and eval cadence from :class:`DDPG`."""

    def __init__(self, cfg: DDPGConfig, logger=None):
        # NOT super().__init__: the parent allocates a DENSE-record replay
        # ((K, N, N) leaves x buffer_size) which is exactly the wall this
        # class removes — rebuild its wiring around the positions record.
        import optax
        from multiagent_gnn_policies_tpu.models.actor import init_actor
        from multiagent_gnn_policies_tpu.models.critic import init_critic
        from multiagent_gnn_policies_tpu.utils.metrics import MetricsLogger

        self.cfg = cfg
        self.env = None          # the O(N^2)-free episode never builds it
        self.logger = logger or MetricsLogger()

        root = jax.random.key(cfg.seed)
        self._key, a_key, c_key = jax.random.split(root, 3)
        actor = init_actor(a_key, cfg.actor)
        critic = init_critic(c_key, cfg.critic)
        self.actor_tx = optax.adam(cfg.actor_lr)
        self.critic_tx = optax.adam(cfg.critic_lr)
        self.state = TrainState(
            actor=actor,
            actor_target=jax.tree.map(jnp.copy, actor),
            critic=critic,
            critic_target=jax.tree.map(jnp.copy, critic),
            actor_opt=self.actor_tx.init(actor),
            critic_opt=self.critic_tx.init(critic),
        )

        p, k, ns, na = cfg.env, cfg.actor.k, cfg.actor.n_s, cfg.actor.n_a
        n = p.n_agents
        example = {
            "hist": jnp.zeros((k, n, ns)),        # [x_t .. x_{t-K+1}]
            "pos": jnp.zeros((max(k - 1, 1), n, 2)),  # graph sources,
                                                  # newest first (pos_t ..)
            "next_values": jnp.zeros((n, ns)),
            "next_pos": jnp.zeros((n, 2)),
            "action": jnp.zeros((n, na)),
            "reward": jnp.zeros(()),
            "notdone": jnp.zeros(()),
        }
        self.buffer = replay_init(cfg.buffer_size, example)
        from multiagent_gnn_policies_tpu.parallel.large_n import pick_block

        self._ep = 0
        self._block = pick_block(n)

        self._episode = jax.jit(partial(self._episode_impl, self))
        self._eval = jax.jit(partial(self._eval_impl, self))

    # --- losses on the positions record ---

    @staticmethod
    def _losses(self, ts: TrainState, batch):
        cfg = self.cfg
        k = cfg.actor.k
        r = float(cfg.env.comm_radius)

        adjs = jax.vmap(lambda ph: dense_adj_from_pos(ph, r))(
            batch["pos"][:, : max(k - 1, 1)]
        )                                         # (B, K-1|1, N, N)
        a_next = jax.vmap(lambda q: dense_adj_from_pos(q, r))(
            batch["next_pos"]
        )                                         # (B, N, N)
        a_t = adjs[:, 0]
        # next delayed stack: shift in next_values; next graph list is
        # [A_{t+1}, A_t, ..] (ops/graph.py:delayed_gso_update semantics)
        next_hist = jnp.concatenate(
            [batch["next_values"][:, None], batch["hist"][:, : k - 1]], axis=1
        )
        next_adjs = jnp.concatenate(
            [a_next[:, None], adjs[:, : k - 2]], axis=1
        ) if k > 1 else adjs
        values = batch["hist"][:, 0]

        next_action = actor_forward_adj(
            ts.actor_target, cfg.actor, next_hist, next_adjs
        )
        q_next = critic_forward_adj(
            ts.critic_target, cfg.critic,
            batch["next_values"], next_action, a_next,
        )
        y = (cfg.reward_scale * batch["reward"][:, None]
             + cfg.gamma * batch["notdone"][:, None] * q_next)
        y = jax.lax.stop_gradient(y)

        def critic_loss_fn(critic):
            q = critic_forward_adj(
                critic, cfg.critic, values, batch["action"], a_t
            )
            return jnp.mean((q - y) ** 2)

        def actor_loss_fn(actor):
            pi = actor_forward_adj(actor, cfg.actor, batch["hist"], adjs)
            q = critic_forward_adj(ts.critic, cfg.critic, values, pi, a_t)
            return -jnp.mean(q)

        return critic_loss_fn, actor_loss_fn

    # --- fused episode on the O(N)-state carry ---

    @staticmethod
    def _episode_impl(self, ts: TrainState, buffer, key):
        cfg = self.cfg
        p = cfg.env
        k = cfg.actor.k
        n = p.n_agents
        T = p.episode_steps
        r = float(p.comm_radius)
        reset_key, scan_key = jax.random.split(key)
        x0 = _ddpg_reset(self, reset_key)
        fq0 = blocked_frame(x0, p, True, self._block)
        hist0 = jnp.concatenate(
            [fq0.values[None], jnp.zeros((k - 1, n, cfg.actor.n_s))], axis=0
        ) if k > 1 else fq0.values[None]
        pos0 = jnp.broadcast_to(x0[None, :, :2], (max(k - 1, 1), n, 2))
        # pre-episode history slots are zeros (episode-boundary semantics,
        # ops/graph.py): seeding their graph sources with pos_t is exact
        # because those slots contribute zero until step >= k
        ou = ou_reset(n, cfg.actor.n_a)

        def body(carry, step_key):
            ts, buffer, x, hist, pos_hist, ou = carry
            noise_key, dyn_key, up_key = jax.random.split(step_key, 3)

            adjs = dense_adj_from_pos(pos_hist, r)     # (K-1|1, N, N)
            ou = ou_step(ou, noise_key, cfg.ou_theta, cfg.ou_sigma)
            mu = actor_forward_adj(ts.actor, cfg.actor, hist, adjs)
            action = jnp.clip(mu + cfg.ou_scale * ou.x, -1.0, 1.0)

            x2 = _dynamics(x, action, p, dyn_key)
            fq2 = blocked_frame(x2, p, True, self._block)
            rew = _reward(x2)
            sample = {
                "hist": hist,
                "pos": pos_hist,
                "next_values": fq2.values,
                "next_pos": x2[:, :2],
                "action": action,
                "reward": rew,
                "notdone": jnp.ones(()),
            }
            buffer = replay_insert_batch(
                buffer, jax.tree.map(lambda v: v[None], sample)
            )
            hist2 = jnp.concatenate(
                [fq2.values[None], hist[: k - 1]], axis=0
            ) if k > 1 else fq2.values[None]
            pos2 = (jnp.concatenate(
                [x2[None, :, :2], pos_hist[: k - 2]], axis=0
            ) if k > 2 else x2[None, :, :2]) if k > 1 else pos_hist

            def do_updates(ts):
                def one(ts, kk):
                    b = replay_sample(buffer, kk, cfg.batch_size)
                    ts, c_loss, a_loss = DDPG._gradient_step(self, ts, b)
                    return ts, (c_loss, a_loss)
                keys = jax.random.split(up_key, cfg.updates_per_step)
                ts, (c_losses, a_losses) = jax.lax.scan(one, ts, keys)
                return ts, jnp.sum(c_losses), jnp.sum(a_losses)

            ts, c_loss, a_loss = jax.lax.cond(
                buffer.size > cfg.batch_size,
                do_updates,
                lambda ts: (ts, jnp.zeros(()), jnp.zeros(())),
                ts,
            )
            return (ts, buffer, x2, hist2, pos2, ou), (rew, c_loss, a_loss)

        step_keys = jax.random.split(scan_key, T)
        (ts, buffer, *_), (rewards, c_losses, a_losses) = jax.lax.scan(
            body, (ts, buffer, x0, hist0, pos0, ou), step_keys
        )
        return ts, buffer, jnp.sum(rewards), jnp.sum(c_losses), jnp.sum(a_losses)

    @staticmethod
    def _eval_impl(self, ts: TrainState, key):
        cfg = self.cfg
        p = cfg.env
        k = cfg.actor.k
        n = p.n_agents
        r = float(p.comm_radius)

        def episode(key):
            reset_key, dyn_key = jax.random.split(key)
            x = _ddpg_reset(self, reset_key)
            fq = blocked_frame(x, p, True, self._block)
            hist = jnp.concatenate(
                [fq.values[None], jnp.zeros((k - 1, n, cfg.actor.n_s))],
                axis=0,
            ) if k > 1 else fq.values[None]
            pos_hist = jnp.broadcast_to(x[None, :, :2], (max(k - 1, 1), n, 2))

            def body(carry, step_key):
                x, hist, pos_hist = carry
                adjs = dense_adj_from_pos(pos_hist, r)
                act = actor_forward_adj(ts.actor, cfg.actor, hist, adjs)
                act = jnp.clip(act, -1.0, 1.0)
                x2 = _dynamics(x, act, p, step_key)
                fq2 = blocked_frame(x2, p, True, self._block)
                hist2 = jnp.concatenate(
                    [fq2.values[None], hist[: k - 1]], axis=0
                ) if k > 1 else fq2.values[None]
                pos2 = (jnp.concatenate(
                    [x2[None, :, :2], pos_hist[: k - 2]], axis=0
                ) if k > 2 else x2[None, :, :2]) if k > 1 else pos_hist
                return (x2, hist2, pos2), _reward(x2)

            _, rewards = jax.lax.scan(
                body, (x, hist, pos_hist),
                jax.random.split(dyn_key, p.episode_steps),
            )
            return jnp.sum(rewards)

        keys = jax.random.split(key, cfg.n_test_episodes)
        # sequential episodes (vmap would multiply the O(N^2) env peak)
        return jax.lax.map(episode, keys)


def _ddpg_reset(self, key: jax.Array) -> jax.Array:
    """Initial swarm state via the large-N reset (lattice-regime fast path;
    parallel/large_n.py:_reset on the blocked path)."""
    from multiagent_gnn_policies_tpu.parallel.large_n import (
        LargeNConfig,
        _reset,
        pick_block,
    )

    p = self.cfg.env
    lcfg = LargeNConfig(params=p, block=pick_block(p.n_agents),
                        rows=p.n_agents, axis=None, path="blocked")
    x, _fq, _nl = _reset(lcfg, key)
    return x


def train_ddpg_large(cfg: ExperimentConfig, logger=None, save_path=None,
                     state_path=None, checkpoint_every=0) -> dict:
    learner = DDPGLarge(DDPGConfig.from_experiment(cfg), logger)
    return learner.train(save_path, state_path, checkpoint_every)
