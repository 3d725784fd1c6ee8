"""Profiling utilities + determinism/NaN tripwires (SURVEY §5: the
framework's replacements for tracing and race detection)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams, make_env
from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
from multiagent_gnn_policies_tpu.algos.imitation import rollout_episode
from multiagent_gnn_policies_tpu.utils.profiling import (
    Throughput,
    assert_finite,
    trace,
)


def test_throughput_rates():
    tp = Throughput()
    tp.add(100, edges=5000.0)
    r = tp.rates()
    assert r["steps_per_s"] > 0
    assert r["edges_per_s"] == pytest.approx(r["steps_per_s"] * 50.0)


def test_trace_noop_and_dir(tmp_path):
    with trace(None):
        pass
    with trace(str(tmp_path / "prof")):
        jnp.sum(jnp.ones(8)).block_until_ready()
    assert any((tmp_path / "prof").rglob("*"))


def test_assert_finite():
    assert_finite({"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}})
    with pytest.raises(FloatingPointError, match="b.*c"):
        assert_finite({"a": jnp.ones(3), "b": {"c": jnp.array([jnp.nan])}})


def test_rollout_bitwise_deterministic():
    """Same seed => bitwise-equal rollouts (the reference cannot promise
    this across devices; one compiled program can)."""
    p = FlockingParams(n_agents=16, episode_steps=10)
    env = make_env("FlockingRelative-v0", p)
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(8,), k=2, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    f = jax.jit(
        lambda k: rollout_episode(
            params, k, jnp.zeros(()), env, acfg, mode="eval", collect=False
        )
    )
    a = np.asarray(f(jax.random.key(1)))
    b = np.asarray(f(jax.random.key(1)))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
