"""Behavior cloning and DAGGER, fused on device.

TPU-first redesign of the reference's imitation learners
(learner/gnn_cloning.py, learner/gnn_dagger.py). The reference interleaves
host-side env stepping, per-step device copies, and 200 per-episode optimizer
steps of Python — its rollout is host-bound (SURVEY §3.1). Here one training
round is ONE compiled program:

  round(params, opt, buffer, key, beta):
      lax.scan over T env steps            # dynamics + radius graph +
                                           # features + expert + delayed-GSO
                                           # update + policy fwd + beta coin
    → scatter the episode chunk into the on-device replay buffer
    → lax.scan over `updates_per_step` Adam steps (sample → fwd/bwd → update)

``vmap`` over ``n_rollout_envs`` parallel environments multiplies rollout
throughput; the default of 1 keeps the reference's training semantics
(400 sequential episodes, cfg/dagger.cfg).

Semantics replicated exactly:
  * DAGGER beta mixing: per-step expert coin with prob ``beta``, expert
    labels always, ``beta <- max(beta * beta_coeff, 0.5)`` per episode — the
    non-standard 0.5 floor included (gnn_dagger.py:148-178);
  * cloning = expert-only rollouts; evals every ``test_interval`` episodes
    with best-eval tracking, returning the BEST eval stats
    (gnn_cloning.py:180-201); DAGGER returns the FINAL eval stats
    (gnn_dagger.py:221-240);
  * updates start once the buffer holds more than one batch
    (gnn_dagger.py:182); MSE loss against expert actions over all elements
    (gnn_dagger.py:91); Adam with ``actor_lr``;
  * replay stores the delayed features pre-aggregated (ind_agg == 0,
    gnn_dagger.py:43) — see algos/replay.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from multiagent_gnn_policies_tpu.algos.replay import (
    ReplayBuffer,
    replay_init,
    replay_insert_batch,
    replay_sample,
)
from multiagent_gnn_policies_tpu.envs.flocking import FlockingEnv, FlockingParams, make_env
from multiagent_gnn_policies_tpu.models.actor import (
    ActorConfig,
    actor_forward,
    init_actor,
)
from multiagent_gnn_policies_tpu.ops.graph import (
    aggregate,
    initial_graph_state,
    update_graph_state,
)
from multiagent_gnn_policies_tpu.utils.config import ExperimentConfig
from multiagent_gnn_policies_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass(frozen=True)
class ImitationConfig:
    """Static configuration for an imitation run (hashable, jit-friendly)."""

    mode: str                    # 'dagger' | 'cloning'
    actor: ActorConfig
    env_name: str
    env: FlockingParams
    batch_size: int = 20
    buffer_size: int = 10000
    updates_per_episode: int = 200
    actor_lr: float = 5e-5
    n_train_episodes: int = 400
    beta_coeff: float = 0.993
    beta_floor: float = 0.5      # gnn_dagger.py:148
    test_interval: int = 40
    n_test_episodes: int = 20
    n_rollout_envs: int = 1
    seed: int = 11
    # Include the replay buffer in training-state checkpoints. True =
    # bit-exact resume (the default; tests/test_resume.py contract).
    # False trades exactness for checkpoint cost: at large N the buffer
    # is multi-GB and a periodic save fetches it all to the host (~2 min
    # per save at N=32k over the remote-TPU tunnel — ~25% of training
    # wall); without it a resume restarts with an EMPTY buffer, which
    # refills within one episode chunk (collection outpaces sampling) —
    # the resumed run is statistically equivalent, not bit-equal.
    checkpoint_buffer: bool = True

    @classmethod
    def from_experiment(cls, x: ExperimentConfig, mode: Optional[str] = None,
                        k: Optional[int] = None) -> "ImitationConfig":
        """Build from an INI-backed :class:`ExperimentConfig`. ``k`` override
        supports transfer evaluation (reference gnn_dagger.py:20)."""
        actor = ActorConfig(
            n_s=x.n_states, n_a=x.n_actions, hidden=x.hidden,
            k=k or x.k, ind_agg=0,
        )
        env = FlockingParams(
            n_agents=x.n_agents, comm_radius=x.comm_radius, dt=x.dt,
            v_max=x.v_max, episode_steps=x.episode_steps,
        )
        return cls(
            mode=(mode or x.alg), actor=actor, env_name=x.env, env=env,
            batch_size=x.batch_size, buffer_size=x.buffer_size,
            updates_per_episode=x.updates_per_step, actor_lr=x.actor_lr,
            n_train_episodes=x.n_train_episodes, beta_coeff=x.beta_coeff,
            test_interval=x.test_interval, n_test_episodes=x.n_test_episodes,
            n_rollout_envs=x.n_rollout_envs, seed=x.seed,
            checkpoint_buffer=x.checkpoint_buffer,
        )


def _policy_action(params, acfg: ActorConfig, gs) -> jax.Array:
    """Greedy policy action from the current delayed graph state."""
    agg = aggregate(gs.delay_gso, gs.delay_state)
    return actor_forward(params, acfg, agg, None)


def rollout_episode(
    params,
    key: jax.Array,
    beta: jax.Array,
    env: FlockingEnv,
    acfg: ActorConfig,
    *,
    mode: str,
    collect: bool = True,
):
    """One fused on-device episode.

    Returns ``(samples, ep_reward)`` where ``samples`` stacks per step the
    pre-aggregated delayed features and the expert action ((T,K,N,F),
    (T,N,2)); with ``collect=False`` (greedy eval) returns only the reward.
    """
    T = env.params.episode_steps
    reset_key, scan_key = jax.random.split(key)
    env_state, obs = env.reset(reset_key)
    gs = initial_graph_state(obs.values, obs.network, acfg.k)

    def body(carry, step_key):
        env_state, gs = carry
        agg = aggregate(gs.delay_gso, gs.delay_state)       # (K, N, F)
        if mode == "eval":
            act = actor_forward(params, acfg, agg, None)
            expert = None
        else:
            expert = env.controller(env_state)
            if mode == "cloning":
                act = expert                                 # expert-only rollout
            else:  # dagger: per-step expert coin, expert label regardless
                learner_act = actor_forward(params, acfg, agg, None)
                coin = jax.random.bernoulli(step_key, beta)
                act = jnp.where(coin, expert, learner_act)
        env_state, obs, r, _ = env.step(env_state, act)
        gs = update_graph_state(gs, obs.values, obs.network)
        out = ({"agg": agg, "act": expert}, r) if collect else r
        return (env_state, gs), out

    step_keys = jax.random.split(scan_key, T)
    _, out = jax.lax.scan(body, (env_state, gs), step_keys)
    if collect:
        samples, rewards = out
        return samples, jnp.sum(rewards)
    return jnp.sum(out)


def rollout_batch1(fn, key: jax.Array):
    """Run single-env episode ``fn(key)`` vmapped over TWO copies of the
    same key, returning lane 0 — numerically the single-env episode.

    Why batch-of-TWO: the unbatched episode program hits a pathological
    XLA compile on this TPU stack, and a batch of ONE does not dodge it —
    XLA's degenerate-dimension folding strips the unit batch axis and
    recovers the same slow program. Measured (same program, cache-busted):
    B=1 compiles in 48-390 s across sessions, B=2/8/128 all in ~3.5 s.
    Duplicating the key costs one redundant episode of compute on the
    telemetry/bench-only single-env paths and keeps lane 0 bit-identical
    to the logical single-env rollout (same key, same per-lane program).
    Every single-episode call site (training round, bench, trajectory
    dump) routes through this helper so the workaround can't drift.
    """
    keys = jax.tree.map(lambda k: jnp.stack([k, k]), key)
    return jax.tree.map(lambda x: x[0], jax.vmap(fn)(keys))


def rollout_trajectory(params, key: jax.Array, env: FlockingEnv, acfg: ActorConfig):
    """Greedy episode that records raw agent states ``(T, N, 4)`` + rewards.

    The telemetry/visualization path — the on-device replacement for the
    reference's ``env.render()`` eval loop (reference test_model.py:34-46):
    dump the trajectory once instead of rendering every step.
    """
    reset_key, _ = jax.random.split(key)
    env_state, obs = env.reset(reset_key)
    gs = initial_graph_state(obs.values, obs.network, acfg.k)

    def body(carry, _):
        env_state, gs = carry
        act = actor_forward(params, acfg, aggregate(gs.delay_gso, gs.delay_state), None)
        env_state, obs, r, _done = env.step(env_state, act)
        gs = update_graph_state(gs, obs.values, obs.network)
        return (env_state, gs), (env_state.x, r)

    _, (xs, rs) = jax.lax.scan(
        body, (env_state, gs), None, length=env.params.episode_steps
    )
    return xs, rs


def _loss_fn(params, acfg: ActorConfig, batch):
    pred = actor_forward(params, acfg, batch["agg"], None)   # (B, N, n_a)
    return jnp.mean((pred - batch["act"]) ** 2)              # F.mse_loss parity


class ImitationLearner:
    """Driver for cloning/DAGGER: owns params, optimizer, buffer, jits."""

    def __init__(self, cfg: ImitationConfig, logger: Optional[MetricsLogger] = None):
        if cfg.mode not in ("dagger", "cloning"):
            raise ValueError(f"unknown imitation mode {cfg.mode!r}")
        self.cfg = cfg
        self.env = make_env(cfg.env_name, cfg.env)
        self.logger = logger or MetricsLogger()

        # Optional data-parallel sharding (set by ShardedImitationLearner):
        # NamedShardings for the env/episode axis and the batch axis.
        self.shard_episode = None
        self.shard_batch = None

        root = jax.random.key(cfg.seed)
        self._key, init_key = jax.random.split(root)
        self.params = init_actor(init_key, cfg.actor)
        self.tx = optax.adam(cfg.actor_lr)
        self.opt_state = self.tx.init(self.params)

        self.buffer = replay_init(cfg.buffer_size, self._example_record())

        # mutable training-loop state (checkpointable, see training_state())
        self._rnd = 0
        self._beta = 1.0
        self._best = {"mean": -np.inf, "std": 0.0, "params": None}

        self._round = jax.jit(partial(self._round_impl, self))
        self._eval = jax.jit(partial(self._eval_impl, self))

    def _example_record(self) -> dict:
        """Shape/dtype template of one replay record (a full step's
        pre-aggregated features + expert labels; the large-N learner
        overrides this with an agent-subsampled record)."""
        cfg = self.cfg
        return {
            "agg": jnp.zeros((cfg.actor.k, cfg.env.n_agents, cfg.actor.n_s)),
            "act": jnp.zeros((cfg.env.n_agents, cfg.actor.n_a)),
        }

    # --- jitted bodies (self is static via partial) ---

    @staticmethod
    def _round_impl(self, params, opt_state, buffer, key, beta):
        cfg = self.cfg
        ro_key, up_key = jax.random.split(key)

        rollout = partial(
            rollout_episode, env=self.env, acfg=cfg.actor, mode=cfg.mode
        )
        if cfg.n_rollout_envs == 1:
            samples, ep_reward = rollout_batch1(
                lambda k: rollout(params, k, beta), ro_key
            )
        else:
            keys = jax.random.split(ro_key, cfg.n_rollout_envs)
            if self.shard_episode is not None:
                # data-parallel rollout: one episode batch shard per device
                keys = jax.lax.with_sharding_constraint(keys, self.shard_episode)
            samples, ep_rewards = jax.vmap(
                lambda k: rollout(params, k, beta)
            )(keys)
            if self.shard_episode is not None:
                samples = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x, self.shard_episode
                    ),
                    samples,
                )
            samples = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), samples
            )
            ep_reward = jnp.mean(ep_rewards)
        buffer = replay_insert_batch(buffer, samples)

        def one_update(carry, k):
            params, opt_state = carry
            batch = replay_sample(buffer, k, cfg.batch_size)
            if self.shard_batch is not None:
                # shard the gradient batch across devices; XLA inserts the
                # grad psum when applying to replicated params
                batch = jax.lax.with_sharding_constraint(batch, self.shard_batch)
            loss, grads = jax.value_and_grad(_loss_fn)(params, cfg.actor, batch)
            updates, opt_state = self.tx.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        def run_updates(args):
            params, opt_state = args
            n_up = cfg.updates_per_episode * cfg.n_rollout_envs
            keys = jax.random.split(up_key, n_up)
            (params, opt_state), losses = jax.lax.scan(
                one_update, (params, opt_state), keys
            )
            return params, opt_state, jnp.sum(losses)

        # reference gates updates on curr_size > batch_size (gnn_dagger.py:182)
        params, opt_state, loss_sum = jax.lax.cond(
            buffer.size > cfg.batch_size,
            run_updates,
            lambda args: (args[0], args[1], jnp.zeros(())),
            (params, opt_state),
        )
        return params, opt_state, buffer, ep_reward, loss_sum

    @staticmethod
    def _eval_impl(self, params, key):
        cfg = self.cfg
        keys = jax.random.split(key, cfg.n_test_episodes)
        rewards = jax.vmap(
            lambda k: rollout_episode(
                params, k, jnp.zeros(()), self.env, cfg.actor,
                mode="eval", collect=False,
            )
        )(keys)
        return rewards

    # --- host API ---

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def select_action(self, gs):
        """Greedy action from a delayed graph state (reference
        DAGGER.select_action, gnn_dagger.py:55-72)."""
        return _policy_action(self.params, self.cfg.actor, gs)

    def evaluate(self) -> Tuple[float, float]:
        rewards = np.asarray(self._eval(self.params, self._next_key()))
        return float(rewards.mean()), float(rewards.std())

    # --- full-training-state checkpoint / resume (SURVEY §5: the reference
    #     loses a run on crash — gnn_dagger.py:239-240 saves only at the end) ---

    def training_state(self) -> dict:
        """Complete restart state as one pytree: params, optimizer, replay
        buffer (unless ``cfg.checkpoint_buffer`` is off), PRNG, loop
        counters, and the best-eval snapshot."""
        best_p = self._best["params"]
        buf = {"buffer": self.buffer} if self.cfg.checkpoint_buffer else {}
        return {
            **buf,
            "params": self.params,
            "opt_state": self.opt_state,
            "key": jax.random.key_data(self._key),
            "round": np.int64(self._rnd),
            "beta": np.float64(self._beta),
            "best_mean": np.float64(self._best["mean"]),
            "best_std": np.float64(self._best["std"]),
            "has_best": np.bool_(best_p is not None),
            "best_params": best_p if best_p is not None else self.params,
        }

    def save_training_state(self, path: str) -> None:
        from multiagent_gnn_policies_tpu.utils import checkpoint
        from multiagent_gnn_policies_tpu.utils.debug import check_finite

        # a checkpoint holding NaN params would resume into a poisoned run;
        # fail loudly at the save boundary instead (utils/debug.py)
        check_finite(self.params, "params")
        check_finite(self.opt_state, "opt_state")
        checkpoint.save(path, self.training_state())

    def load_training_state(self, path: str) -> None:
        from multiagent_gnn_policies_tpu.utils import checkpoint

        st = checkpoint.load(path, self.training_state())
        self.params = jax.tree.map(jnp.asarray, st["params"])
        self.opt_state = jax.tree.map(jnp.asarray, st["opt_state"])
        if self.cfg.checkpoint_buffer:
            self.buffer = jax.tree.map(jnp.asarray, st["buffer"])
        # else: resume with the freshly-initialized empty buffer — it
        # refills from the next collection chunk (see cfg field doc)
        self._key = jax.random.wrap_key_data(jnp.asarray(st["key"]))
        self._rnd = int(st["round"])
        self._beta = float(st["beta"])
        self._best = {
            "mean": float(st["best_mean"]),
            "std": float(st["best_std"]),
            "params": (
                jax.tree.map(np.asarray, st["best_params"])
                if bool(st["has_best"]) else None
            ),
        }

    def train(
        self,
        save_path: Optional[str] = None,
        state_path: Optional[str] = None,
        checkpoint_every: int = 0,
        stop_after: Optional[int] = None,
    ) -> dict:
        """Run (or resume) the training loop.

        Args:
          save_path: final/best actor export (npz + torch state_dict).
          state_path: full-training-state checkpoint file; loaded at entry
            when it exists (resume), written every ``checkpoint_every``
            rounds and at exit when set.
          checkpoint_every: periodic state-save interval in rounds
            (0 = only at exit).
          stop_after: preemption-safe exit after this many total rounds —
            saves state (when ``state_path``) and returns with
            ``interrupted=True``; a later call resumes bit-exact.
        """
        import os
        import time

        cfg = self.cfg
        if state_path and os.path.exists(state_path):
            self.load_training_state(state_path)
            self.logger.log("resume", round=self._rnd, beta=self._beta)
        episodes_per_round = cfg.n_rollout_envs
        n_rounds = max(1, cfg.n_train_episodes // episodes_per_round)
        steps_per_round = cfg.env.episode_steps * episodes_per_round

        while self._rnd < n_rounds:
            if stop_after is not None and self._rnd >= stop_after:
                if state_path:
                    self.save_training_state(state_path)
                return {"mean": self._best["mean"], "std": self._best["std"],
                        "interrupted": True}
            rnd = self._rnd
            episode = rnd * episodes_per_round
            if cfg.mode == "dagger":
                # anneal per *episode*, not per round: with n_rollout_envs
                # parallel episodes a round advances the reference's schedule
                # (gnn_dagger.py:154) by episodes_per_round steps, so the
                # expert-mixing curve is identical in episode terms for any
                # rollout-batch size (exactly beta_coeff**episode until the
                # 0.5 floor).
                self._beta = max(
                    self._beta * cfg.beta_coeff ** episodes_per_round,
                    cfg.beta_floor,
                )
            t0 = time.perf_counter()
            self.params, self.opt_state, self.buffer, ep_reward, loss_sum = (
                self._round(
                    self.params, self.opt_state, self.buffer,
                    self._next_key(), jnp.asarray(self._beta, jnp.float32),
                )
            )
            self._rnd = rnd + 1

            if episode % cfg.test_interval < episodes_per_round:
                jax.block_until_ready(self.params)
                dt_round = time.perf_counter() - t0
                mean, std = self.evaluate()
                self.logger.log(
                    "eval", episode=episode, steps=self._rnd * steps_per_round,
                    reward_mean=mean, reward_std=std, beta=self._beta,
                    policy_loss_sum=float(loss_sum),
                    rollout_reward=float(ep_reward),
                    round_s=dt_round,
                    env_steps_per_s=steps_per_round / dt_round,
                )
                if mean > self._best["mean"]:
                    self._best = {"mean": mean, "std": std,
                                  "params": jax.tree.map(np.asarray, self.params)}
            if (
                state_path and checkpoint_every
                and self._rnd % checkpoint_every == 0
            ):
                self.save_training_state(state_path)

        final_mean, final_std = self.evaluate()
        self.logger.log("final_eval", reward_mean=final_mean, reward_std=final_std)
        if state_path:
            self.save_training_state(state_path)

        if cfg.mode == "cloning" and self._best["params"] is not None:
            # cloning reports (and keeps) the best-seen eval (gnn_cloning.py:195-198)
            stats = {"mean": self._best["mean"], "std": self._best["std"]}
            save_params = self._best["params"]
        else:
            # dagger reports the final eval (gnn_dagger.py:235-237)
            stats = {"mean": final_mean, "std": final_std}
            save_params = self.params

        if save_path:
            from multiagent_gnn_policies_tpu.utils import checkpoint

            checkpoint.save(save_path + ".npz", save_params)
            checkpoint.save_actor_torch_format(save_path, save_params)
        return stats


def train_dagger(cfg: ExperimentConfig, logger=None, save_path=None,
                 state_path=None, checkpoint_every=0) -> dict:
    learner = ImitationLearner(
        ImitationConfig.from_experiment(cfg, mode="dagger"), logger
    )
    return learner.train(save_path, state_path, checkpoint_every)


def train_cloning(cfg: ExperimentConfig, logger=None, save_path=None,
                  state_path=None, checkpoint_every=0) -> dict:
    learner = ImitationLearner(
        ImitationConfig.from_experiment(cfg, mode="cloning"), logger
    )
    return learner.train(save_path, state_path, checkpoint_every)
