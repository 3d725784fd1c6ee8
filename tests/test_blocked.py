"""Equivalence of the blocked large-N path against the dense reference-parity
path: frame quantities, delayed y-stack, whole rollouts, and the
agent-sharded multi-device rollout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.envs.flocking import (
    FlockingParams,
    expert_action,
    make_env,
    observe,
)
from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
from multiagent_gnn_policies_tpu.ops.blocked import (
    blocked_apply_adjT,
    blocked_frame,
    delay_carry_init,
    delay_carry_update,
    delayed_ystack,
)
from multiagent_gnn_policies_tpu.ops.graph import (
    aggregate,
    initial_graph_state,
    normalized_adjacency,
    update_graph_state,
)
from multiagent_gnn_policies_tpu.parallel.large_n import pick_block, rollout_large

P = FlockingParams(n_agents=48, episode_steps=12)


def _state(key, n=48, spread=3.0):
    pos = jax.random.uniform(key, (n, 2), minval=-spread, maxval=spread)
    vel = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    return jnp.concatenate([pos, vel], axis=-1)


def test_frame_matches_dense_observe_and_expert():
    x = _state(jax.random.key(0))
    fq = blocked_frame(x, P, centralized=True, block=16)
    obs = observe(x, P)
    np.testing.assert_allclose(fq.values, obs.values, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        fq.expert, expert_action(x, P, centralized=True), rtol=1e-5, atol=1e-5
    )
    fq_d = blocked_frame(x, P, centralized=False, block=16)
    np.testing.assert_allclose(
        fq_d.expert, expert_action(x, P, centralized=False), rtol=1e-5, atol=1e-5
    )
    # degree equals row sums of the unnormalized adjacency
    adj = np.asarray(_adj(x))
    np.testing.assert_allclose(fq.degree, adj.sum(1))


def test_apply_adjT_matches_aggregate():
    x = _state(jax.random.key(1))
    cols = jax.random.normal(jax.random.key(2), (48, 5))
    out = blocked_apply_adjT(x[:, :2], cols, P, block=12)
    a = normalized_adjacency(_adj(x))
    np.testing.assert_allclose(out, a.T @ cols, rtol=1e-5, atol=1e-5)


def _adj(x):
    diff = x[:, None, :2] - x[None, :, :2]
    r2 = (diff**2).sum(-1)
    n = x.shape[0]
    r2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, r2)
    return (r2 < P.comm_radius**2).astype(x.dtype)


def test_delayed_ystack_matches_dense_over_trajectory():
    """Walk a random trajectory; at every step the feature-space stack must
    equal aggregate(delay_gso, delay_state) of the dense recursion,
    including the episode-boundary zeros."""
    k = 3
    key = jax.random.key(3)
    x = _state(key)
    obs = observe(x, P)
    gs = initial_graph_state(obs.values, obs.network, k)
    carry = delay_carry_init(obs.values, 48, k)

    for t in range(6):
        dense_y = aggregate(gs.delay_gso, gs.delay_state)
        blocked_y = delayed_ystack(carry, x[:, :2], P, block=16)
        np.testing.assert_allclose(blocked_y, dense_y, rtol=1e-4, atol=1e-5)

        # advance both paths with the same random walk
        key = jax.random.fold_in(key, t)
        pos_prev = x[:, :2]
        deg_prev = jnp.sum(_adj(x), axis=1)
        x = x + 0.1 * jax.random.normal(key, x.shape)
        obs = observe(x, P)
        gs = update_graph_state(gs, obs.values, obs.network)
        carry = delay_carry_update(carry, obs.values, pos_prev, deg_prev)


def test_delayed_ystack_k1():
    carry = delay_carry_init(jnp.ones((48, 6)), 48, 1)
    x = _state(jax.random.key(4))
    y = delayed_ystack(carry, x[:, :2], P, block=16)
    np.testing.assert_allclose(y, jnp.ones((1, 48, 6)))


@pytest.mark.parametrize("expert_mode", [False, True])
def test_rollout_large_matches_dense_rollout(expert_mode):
    """Whole-episode rewards identical to the dense fused rollout under the
    same PRNG key (FlockingRelative is deterministic given the reset)."""
    from multiagent_gnn_policies_tpu.algos.imitation import rollout_episode

    acfg = ActorConfig(n_s=6, n_a=2, hidden=(16,), k=2, ind_agg=0)
    params = init_actor(jax.random.key(5), acfg)
    env = make_env("FlockingRelative-v0", P)
    key = jax.random.key(6)

    rewards, x_final = rollout_large(
        params, acfg, key, P, expert_mode=expert_mode
    )
    assert rewards.shape == (P.episode_steps,)
    assert np.isfinite(np.asarray(rewards)).all()
    assert x_final.shape == (48, 4)

    if not expert_mode:
        dense = rollout_episode(
            params, key, jnp.zeros(()), env, acfg, mode="eval", collect=False
        )
        np.testing.assert_allclose(
            float(jnp.sum(rewards)), float(dense), rtol=1e-4
        )


def test_rollout_large_sharded_matches_single():
    """8-device agent-sharded rollout == single-device rollout, bitwise-ish."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), axis_names=("agents",))

    p = FlockingParams(n_agents=64, episode_steps=8)
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(16,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(7), acfg)
    key = jax.random.key(8)

    r_single, x_single = rollout_large(params, acfg, key, p)
    r_shard, x_shard = rollout_large(params, acfg, key, p, mesh=mesh)
    np.testing.assert_allclose(r_shard, r_single, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(x_shard, x_single, rtol=1e-4, atol=1e-4)


def test_rollout_large_expert_improves_alignment():
    """The expert controller must drive velocity disagreement down."""
    p = FlockingParams(n_agents=64, episode_steps=100)
    rewards, _ = rollout_large(None, None, jax.random.key(9), p,
                               expert_mode=True)
    r = np.asarray(rewards)
    assert r[-1] > r[0]          # reward = -velocity variance rises
    assert r[-10:].mean() > r[:10].mean()


def test_pick_block():
    assert pick_block(1250) == 125
    assert pick_block(1024) == 128
    assert pick_block(7) == 7
