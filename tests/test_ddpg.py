"""Smoke + semantics tests for the fused DDPG learner (tiny configs)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.algos.ddpg import (
    DDPG,
    DDPGConfig,
    OUState,
    _soft_update,
    ou_reset,
    ou_step,
)
from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
from multiagent_gnn_policies_tpu.models.actor import ActorConfig
from multiagent_gnn_policies_tpu.models.critic import CriticConfig


def tiny_cfg(**kw):
    d = dict(
        actor=ActorConfig(n_s=6, n_a=2, hidden=(8, 8), k=2, ind_agg=1),
        critic=CriticConfig(n_s=6, n_a=2, hidden=(8, 8), k=2),
        env_name="FlockingRelative-v0",
        env=FlockingParams(n_agents=8, episode_steps=15),
        batch_size=8,
        buffer_size=200,
        updates_per_step=1,
        n_train_episodes=3,
        test_interval=2,
        n_test_episodes=2,
        seed=0,
    )
    d.update(kw)
    return DDPGConfig(**d)


def test_ou_noise_statistics():
    ou = ou_reset(4, 2)
    xs = []
    key = jax.random.key(0)
    for i in range(500):
        key, sub = jax.random.split(key)
        ou = ou_step(ou, sub, theta=0.15, sigma=0.2)
        xs.append(np.asarray(ou.x))
    xs = np.stack(xs)
    # stationary std of OU: sigma / sqrt(2*theta) ≈ 0.365
    assert 0.25 < xs[200:].std() < 0.5
    assert abs(xs[200:].mean()) < 0.1
    # temporal correlation: successive steps nearly equal
    assert np.abs(xs[1:] - xs[:-1]).mean() < xs[200:].std()


def test_soft_update_polyak():
    t = [{"w": jnp.zeros((2, 2))}]
    s = [{"w": jnp.ones((2, 2))}]
    out = _soft_update(t, s, tau=0.25)
    np.testing.assert_allclose(np.asarray(out[0]["w"]), 0.25)


def test_ddpg_trains_and_evaluates():
    learner = DDPG(tiny_cfg())
    stats = learner.train()
    assert np.isfinite(stats["mean"]) and np.isfinite(stats["std"])
    assert int(learner.buffer.size) == 3 * 15  # every transition stored


def test_ddpg_actions_clipped():
    learner = DDPG(tiny_cfg())
    ts, buffer, *_ = (learner.state, learner.buffer)
    learner.state, learner.buffer, *_ = learner._episode(
        learner.state, learner.buffer, jax.random.key(1)
    )
    acts = np.asarray(learner.buffer.data["action"][: int(learner.buffer.size)])
    assert (acts >= -1.0 - 1e-6).all() and (acts <= 1.0 + 1e-6).all()


def test_ddpg_target_networks_track():
    learner = DDPG(tiny_cfg(n_train_episodes=2))
    before = np.asarray(learner.state.actor_target[0]["w"]).copy()
    learner.train()
    after = np.asarray(learner.state.actor_target[0]["w"])
    assert not np.allclose(before, after)  # soft updates happened
    # with tau=0.5 targets should be close to the online nets
    online = np.asarray(learner.state.actor[0]["w"])
    assert np.abs(after - online).max() < 1e-2


def test_ddpg_toy_config_learns():
    """Regression gate for DDPG capability (VERDICT r2 item 5): a
    shortened cfg/ddpg_toy.cfg run must improve over the untrained
    policy. Deterministic on CPU (fixed seeds), so the margin is a
    numerics-change tripwire, not a statistical bet. The full committed
    curve: results/ddpg_toy_metrics.jsonl (-30 untrained -> -17.6)."""
    from multiagent_gnn_policies_tpu.utils.config import (
        ExperimentConfig,
        load_ini,
    )

    cp = load_ini("cfg/ddpg_toy.cfg")
    x = ExperimentConfig.from_section(cp["test"])
    cfg = DDPGConfig.from_experiment(x)
    cfg = dataclasses.replace(cfg, n_train_episodes=150)
    learner = DDPG(cfg)
    untrained_mean, _ = learner.evaluate()
    stats = learner.train()
    assert stats["mean"] > untrained_mean + 4.0, (
        f"DDPG stopped learning: untrained {untrained_mean:.1f}, "
        f"trained {stats['mean']:.1f}"
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
