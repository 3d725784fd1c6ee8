"""Multi-device tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.parallel.mesh import make_mesh
from multiagent_gnn_policies_tpu.parallel.sharded import (
    ShardedImitationLearner,
    sharded_policy_forward,
)
from multiagent_gnn_policies_tpu.algos.imitation import ImitationConfig, ImitationLearner
from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
from multiagent_gnn_policies_tpu.models.actor import ActorConfig, actor_forward, init_actor
from multiagent_gnn_policies_tpu.ops.graph import aggregate

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _cfg(n_rollout_envs=4, **kw):
    d = dict(
        mode="cloning",
        actor=ActorConfig(n_s=6, n_a=2, hidden=(8, 8), k=2, ind_agg=0),
        env_name="FlockingRelative-v0",
        env=FlockingParams(n_agents=10, episode_steps=16),
        batch_size=8,
        buffer_size=256,
        updates_per_episode=4,
        n_train_episodes=8,
        test_interval=4,
        n_test_episodes=2,
        n_rollout_envs=n_rollout_envs,
        seed=0,
    )
    d.update(kw)
    return ImitationConfig(**d)


def test_mesh_construction():
    mesh = make_mesh(n_agent_shards=2)
    assert mesh.shape == {"env": 4, "agents": 2}
    with pytest.raises(ValueError):
        make_mesh(n_env=16, n_agent_shards=1)


def test_sharded_training_round_runs_and_matches_semantics():
    mesh = make_mesh(n_env=4, n_agent_shards=2)
    learner = ShardedImitationLearner(_cfg(), mesh)
    stats = learner.train()
    assert np.isfinite(stats["mean"])


def test_sharded_matches_unsharded_numerics():
    """DP must not change the math: same seed => same trained params."""
    mesh = make_mesh(n_env=4, n_agent_shards=2)
    a = ShardedImitationLearner(_cfg(n_train_episodes=4), mesh)
    b = ImitationLearner(_cfg(n_train_episodes=4))
    a.train()
    b.train()
    for la, lb in zip(a.params, b.params):
        np.testing.assert_allclose(
            np.asarray(la["w"]), np.asarray(lb["w"]), rtol=1e-4, atol=1e-5
        )


def test_agent_axis_sharded_forward_matches_dense():
    mesh = make_mesh(n_env=1, n_agent_shards=8)
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(16,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    N = 64
    rng = np.random.default_rng(0)
    ds = jnp.asarray(rng.standard_normal((3, N, 6)).astype(np.float32))
    gso = jnp.asarray(rng.uniform(0, 0.3, (3, N, N)).astype(np.float32))
    got = sharded_policy_forward(params, acfg, ds, gso, mesh)
    want = actor_forward(params, acfg, aggregate(gso, ds), None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
    # really sharded over agents
    assert len(got.sharding.device_set) == 8


def test_rollout_envs_not_divisible_raises():
    mesh = make_mesh(n_env=4, n_agent_shards=2)
    with pytest.raises(ValueError):
        ShardedImitationLearner(_cfg(n_rollout_envs=3), mesh)
