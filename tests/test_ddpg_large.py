"""DDPG-at-scale (algos/ddpg_large.py): chained-apply forward parity vs
the dense-GSO forms, record reconstruction, and a toy training round."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.algos.ddpg import DDPGConfig
from multiagent_gnn_policies_tpu.algos.ddpg_large import (
    DDPGLarge,
    actor_forward_adj,
    critic_forward_adj,
    dense_adj_from_pos,
)
from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams, make_env
from multiagent_gnn_policies_tpu.models.actor import (
    ActorConfig,
    actor_forward,
    init_actor,
)
from multiagent_gnn_policies_tpu.models.critic import (
    CriticConfig,
    critic_forward,
    init_critic,
)
from multiagent_gnn_policies_tpu.ops.graph import gso_powers


def _rand_adjs(key, steps, n, r=1.0):
    """Normalized adjacencies of `steps` random position frames."""
    pos = jax.random.uniform(key, (steps, n, 2), minval=-2.0, maxval=2.0)
    return pos, jax.vmap(lambda p_: dense_adj_from_pos(p_, r))(pos)


def test_dense_adj_matches_env_network():
    """dense_adj_from_pos == the env observe's network on the same frame."""
    env = make_env("FlockingRelative-v0", FlockingParams(n_agents=24))
    state, obs = env.reset(jax.random.key(0))
    got = dense_adj_from_pos(state.x[:, :2], env.params.comm_radius)
    np.testing.assert_allclose(np.asarray(got), np.asarray(obs.network),
                               atol=1e-6)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_actor_forward_adj_parity(k):
    """Chained delayed aggregation == dense delay_gso aggregation, at the
    DDPG mid-network aggregation index."""
    n = 20
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(16, 16), k=k,
                       ind_agg=1, bound="tanh")
    params = init_actor(jax.random.key(0), acfg)
    hist = jax.random.normal(jax.random.key(1), (k, n, 6))
    pos, adjs_all = _rand_adjs(jax.random.key(2), max(k - 1, 1), n)
    # dense delayed GSO: G_0 = I, G_s = A_t ... A_{t-s+1}
    gs = [jnp.eye(n)]
    for s in range(k - 1):
        gs.append(gs[-1] @ adjs_all[s])
    delay_gso = jnp.stack(gs)
    want = actor_forward(params, acfg, hist, delay_gso)
    got = actor_forward_adj(params, acfg, hist, adjs_all)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("k", [1, 2, 3])
@pytest.mark.parametrize("gn", [True, False])
def test_critic_forward_adj_parity(k, gn):
    n = 20
    ccfg = CriticConfig(n_s=6, n_a=2, hidden=(16, 16), k=k,
                        use_groupnorm=gn, input_transform="asinh")
    params = init_critic(jax.random.key(0), ccfg)
    states = jax.random.normal(jax.random.key(1), (n, 6))
    actions = jax.random.normal(jax.random.key(2), (n, 2))
    pos, adjs = _rand_adjs(jax.random.key(3), 1, n)
    a = adjs[0]
    want = critic_forward(params, ccfg, states, actions, gso_powers(a, k))
    got = critic_forward_adj(params, ccfg, states, actions, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)
    # batched
    want_b = critic_forward(
        params, ccfg, states[None], actions[None], gso_powers(a, k)[None]
    )
    got_b = critic_forward_adj(params, ccfg, states[None], actions[None],
                               a[None])
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               atol=1e-5)


def _toy_cfg(n=48, k=2, episodes=2):
    hidden = (8, 8)
    return DDPGConfig(
        actor=ActorConfig(n_s=6, n_a=2, hidden=hidden, k=k,
                          ind_agg=len(hidden) // 2, bound="tanh"),
        critic=CriticConfig(n_s=6, n_a=2, hidden=hidden, k=k,
                            use_groupnorm=False, input_transform="asinh"),
        env_name="FlockingRelative-v0",
        env=FlockingParams(n_agents=n, episode_steps=8, max_resets=4),
        batch_size=4, buffer_size=64, updates_per_step=1,
        n_train_episodes=episodes, test_interval=1, n_test_episodes=2,
        seed=3,
    )


def test_ddpg_large_trains_toy():
    """A toy DDPGLarge run: episodes execute, replay holds the O(N)
    positions record, losses are finite, eval returns finite rewards."""
    lrn = DDPGLarge(_toy_cfg())
    stats = lrn.train()
    assert np.isfinite(stats["mean"]) and np.isfinite(stats["std"])
    assert int(lrn.buffer.size) == 2 * 8
    assert lrn.buffer.data["pos"].shape[1:] == (1, 48, 2)
    assert "network" not in lrn.buffer.data      # no (N, N) leaves stored
    for leaf in jax.tree_util.tree_leaves(lrn.buffer.data):
        assert leaf.ndim < 4 or leaf.shape[-1] != leaf.shape[-2]


def test_ddpg_large_resume(tmp_path):
    state = str(tmp_path / "s.npz")
    full = DDPGLarge(_toy_cfg(episodes=3))
    full.train()
    part = DDPGLarge(_toy_cfg(episodes=3))
    out = part.train(state_path=state, stop_after=1)
    assert out["interrupted"]
    rest = DDPGLarge(_toy_cfg(episodes=3))
    rest.train(state_path=state)
    for a, b in zip(
        jax.tree_util.tree_leaves(full.state.actor),
        jax.tree_util.tree_leaves(rest.state.actor),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
