"""Parity of the Pallas VMEM kernels (ops/pallas_kernels.py, interpret mode
on CPU) against the XLA blocked path and the dense reference-parity math:
the adjacency-transpose matmul, the fused frame row-sums, and the whole
pallas-routed large-N rollout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.envs.flocking import (
    FlockingParams,
    expert_action,
    observe,
)
from multiagent_gnn_policies_tpu.models.actor import ActorConfig, init_actor
from multiagent_gnn_policies_tpu.ops.blocked import blocked_frame
from multiagent_gnn_policies_tpu.ops.pallas_kernels import (
    frame_rowsums,
    radius_adjT_matmul,
)
from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

P = FlockingParams(n_agents=48, episode_steps=10)


def _state(key, n, spread=3.0):
    pos = jax.random.uniform(key, (n, 2), minval=-spread, maxval=spread)
    vel = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    return jnp.concatenate([pos, vel], axis=-1)


def _adj(x, p=P):
    diff = x[:, None, :2] - x[None, :, :2]
    r2 = (diff**2).sum(-1)
    n = x.shape[0]
    r2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, r2)
    return (r2 < p.comm_radius**2).astype(x.dtype)


@pytest.mark.parametrize("n", [48, 70])  # 70 exercises padding (not /8)
def test_adjT_matmul_matches_dense(n):
    x = _state(jax.random.key(0), n)
    cols = jax.random.normal(jax.random.key(1), (n, 6))
    adj = _adj(x)
    deg = jnp.maximum(adj.sum(1), 1.0)
    want = adj.T @ (cols / deg[:, None])
    got = radius_adjT_matmul(
        x[:, :2], x[:, :2], cols / deg[:, None], P.comm_radius,
        jnp.zeros((), jnp.int32), block_i=16, block_j=16,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_adjT_matmul_row_sharded_partials_sum_to_full():
    """Two half-row sweeps with the correct global offsets must add up to
    the full aggregation (the psum contract of the sharded path)."""
    n = 64
    x = _state(jax.random.key(2), n)
    cols = jax.random.normal(jax.random.key(3), (n, 4))
    adj = _adj(x)
    deg = jnp.maximum(adj.sum(1), 1.0)
    scaled = cols / deg[:, None]
    want = adj.T @ scaled
    parts = [
        radius_adjT_matmul(
            x[s : s + 32, :2], x[:, :2], scaled[s : s + 32],
            P.comm_radius, jnp.asarray(s, jnp.int32),
            block_i=16, block_j=16,
        )
        for s in (0, 32)
    ]
    np.testing.assert_allclose(parts[0] + parts[1], want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("centralized", [True, False])
@pytest.mark.parametrize("n", [48, 70])
def test_frame_rowsums_matches_blocked_frame(centralized, n):
    p = FlockingParams(n_agents=n, episode_steps=10)
    x = _state(jax.random.key(4), n)
    out = frame_rowsums(
        x, x, p.comm_radius, jnp.zeros((), jnp.int32), centralized,
        block_i=16, block_j=16,
    )
    obs = observe(x, p)
    np.testing.assert_allclose(out[:, :6], obs.values, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        jnp.clip(out[:, 6:8], -10.0, 10.0),
        expert_action(x, p, centralized=centralized),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(out[:, 8], _adj(x, p).sum(1))
    # column 9 = row-min pairwise distance
    diff = x[:, None, :2] - x[None, :, :2]
    r2 = np.array((diff**2).sum(-1))
    np.fill_diagonal(r2, np.inf)
    np.testing.assert_allclose(out[:, 9], r2.min(1), rtol=1e-5)


def test_frame_rowsums_row_sharded():
    n = 64
    p = FlockingParams(n_agents=n, episode_steps=10)
    x = _state(jax.random.key(5), n)
    full = blocked_frame(x, p, centralized=True, block=16)
    out = frame_rowsums(
        x[32:], x, p.comm_radius, jnp.asarray(32, jnp.int32), True,
        block_i=16, block_j=16,
    )
    np.testing.assert_allclose(out[:, :6], full.values[32:], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        jnp.clip(out[:, 6:8], -10, 10), full.expert[32:], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(out[:, 8], full.degree[32:])


@pytest.mark.parametrize("expert_mode", [True, False])
def test_rollout_large_pallas_matches_xla_path(expert_mode):
    """The pallas-routed rollout (interpret mode on CPU) must reproduce the
    XLA blocked rollout reward-for-reward."""
    p = FlockingParams(n_agents=48, episode_steps=6)
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(16,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(6), acfg)
    key = jax.random.key(7)
    r_xla, x_xla = rollout_large(
        params, acfg, key, p, expert_mode=expert_mode, use_pallas=False
    )
    r_pl, x_pl = rollout_large(
        params, acfg, key, p, expert_mode=expert_mode, use_pallas=True
    )
    np.testing.assert_allclose(r_pl, r_xla, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(x_pl, x_xla, rtol=1e-4, atol=1e-4)
