"""Exactness of the O(N·cap) spatial-hash path (ops/binned.py) against the
dense adjacency and the blocked O(N^2) path: neighbor tables, frame
quantities, adjacency applies, delayed y-stacks, whole rollouts (single and
agent-sharded), and the overflow certificate."""

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
from multiagent_gnn_policies_tpu.ops.binned import (
    binned_apply_adjT,
    binned_frame,
    binned_ystack,
    build_neighbor_list,
)
from multiagent_gnn_policies_tpu.ops.blocked import (
    delay_carry_init,
    delay_carry_update,
)
from multiagent_gnn_policies_tpu.ops.graph import (
    aggregate,
    initial_graph_state,
    normalized_adjacency,
    update_graph_state,
)
from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

P = FlockingParams(n_agents=48, episode_steps=12)


def _state(key, n=48, spread=3.0):
    pos = jax.random.uniform(key, (n, 2), minval=-spread, maxval=spread)
    vel = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    return jnp.concatenate([pos, vel], axis=-1)


def _adj(x, r=P.comm_radius):
    diff = x[:, None, :2] - x[None, :, :2]
    r2 = (diff**2).sum(-1)
    n = x.shape[0]
    r2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, r2)
    return (r2 < r * r).astype(x.dtype)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("cap", [8, 32])
def test_neighbor_list_matches_dense_adjacency(seed, cap):
    """Every radius neighbor appears exactly once when overflow == 0."""
    x = _state(jax.random.key(seed))
    nl = build_neighbor_list(x[:, :2], P.comm_radius, cap=cap)
    assert int(nl.overflow) == 0
    n = x.shape[0]
    dense = np.zeros((n, n))
    idx = np.asarray(nl.idx)
    mask = np.asarray(nl.mask)
    for i in range(n):
        for e in range(idx.shape[1]):
            dense[i, idx[i, e]] += mask[i, e]  # += catches double counting
    np.testing.assert_array_equal(dense, np.asarray(_adj(x)))
    np.testing.assert_allclose(nl.deg, np.asarray(_adj(x)).sum(1))


def test_neighbor_list_overflow_detected():
    """Agents crammed into one cell beyond cap must be counted, not lost."""
    pos = jnp.zeros((20, 2)) + jnp.arange(20)[:, None] * 0.01  # one cell
    nl = build_neighbor_list(pos, 1.0, cap=4)
    assert int(nl.overflow) == 16  # 20 agents, cell run holds 4


@pytest.mark.parametrize("centralized", [True, False])
def test_binned_frame_matches_dense(centralized):
    x = _state(jax.random.key(3))
    nl = build_neighbor_list(x[:, :2], P.comm_radius)
    fq = binned_frame(x, nl, P, centralized=centralized)
    obs = observe(x, P)
    np.testing.assert_allclose(fq.values, obs.values, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        fq.expert, expert_action(x, P, centralized=centralized),
        rtol=1e-5, atol=1e-5,
    )
    adj = np.asarray(_adj(x))
    np.testing.assert_allclose(fq.degree, adj.sum(1))
    # true min pairwise r2 is below comm_radius here -> table min is exact
    diff = np.asarray(x[:, None, :2] - x[None, :, :2])
    r2 = (diff**2).sum(-1) + np.where(np.eye(48), np.inf, 0.0)
    np.testing.assert_allclose(float(fq.min_r2), r2.min(), rtol=1e-6)


def test_binned_frame_row_range_slices():
    x = _state(jax.random.key(4))
    nl = build_neighbor_list(x[:, :2], P.comm_radius)
    full = binned_frame(x, nl, P, centralized=True)
    part = binned_frame(x, nl, P, centralized=True,
                        row_range=(jnp.asarray(16, jnp.int32), 16))
    np.testing.assert_allclose(part.values, full.values[16:32], rtol=1e-6)
    np.testing.assert_allclose(part.expert, full.expert[16:32], rtol=1e-6)
    np.testing.assert_allclose(part.degree, full.degree[16:32])


def test_binned_apply_adjT_matches_aggregate():
    x = _state(jax.random.key(5))
    cols = jax.random.normal(jax.random.key(6), (48, 5))
    nl = build_neighbor_list(x[:, :2], P.comm_radius)
    out = binned_apply_adjT(nl, cols)
    a = normalized_adjacency(_adj(x))
    np.testing.assert_allclose(out, a.T @ cols, rtol=1e-5, atol=1e-5)
    # row-sliced destination rows
    part = binned_apply_adjT(nl, cols, row_range=(jnp.asarray(8), 24))
    np.testing.assert_allclose(part, (a.T @ cols)[8:32], rtol=1e-5, atol=1e-5)


def test_binned_ystack_matches_dense_over_trajectory():
    """Same walk as tests/test_blocked.py — the binned stack must equal
    aggregate(delay_gso, delay_state), episode-boundary zeros included."""
    k = 3
    key = jax.random.key(7)
    x = _state(key)
    obs = observe(x, P)
    gs = initial_graph_state(obs.values, obs.network, k)
    carry = delay_carry_init(obs.values, 48, k)

    for t in range(6):
        dense_y = aggregate(gs.delay_gso, gs.delay_state)
        nl = build_neighbor_list(x[:, :2], P.comm_radius)
        binned_y = binned_ystack(carry, nl, P)
        np.testing.assert_allclose(binned_y, dense_y, rtol=1e-4, atol=1e-5)

        key = jax.random.fold_in(key, t)
        pos_prev = x[:, :2]
        deg_prev = jnp.sum(_adj(x), axis=1)
        x = x + 0.1 * jax.random.normal(key, x.shape)
        obs = observe(x, P)
        gs = update_graph_state(gs, obs.values, obs.network)
        carry = delay_carry_update(carry, obs.values, pos_prev, deg_prev)


@pytest.mark.parametrize("expert_mode", [False, True])
def test_sparse_rollout_matches_blocked(expert_mode):
    """Whole-episode rewards of the sparse rollout == the blocked rollout
    under the same PRNG key (both are exact, so bitwise-close)."""
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(16,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(8), acfg)
    key = jax.random.key(9)
    p = FlockingParams(n_agents=64, episode_steps=10)

    r_blk, x_blk = rollout_large(params, acfg, key, p, sparse=False,
                                 expert_mode=expert_mode)
    r_sp, x_sp, ovf = rollout_large(params, acfg, key, p, sparse=True,
                                    expert_mode=expert_mode,
                                    return_overflow=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(r_sp, r_blk, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(x_sp, x_blk, rtol=1e-4, atol=1e-4)


def test_sparse_rollout_sharded_matches_single():
    """8-device agent-sharded sparse rollout == single-device sparse."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), axis_names=("agents",))

    p = FlockingParams(n_agents=64, episode_steps=8)
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(16,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(10), acfg)
    key = jax.random.key(11)

    r_single, x_single = rollout_large(params, acfg, key, p, sparse=True)
    r_shard, x_shard = rollout_large(params, acfg, key, p, sparse=True,
                                     mesh=mesh)
    np.testing.assert_allclose(r_shard, r_single, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(x_shard, x_single, rtol=1e-4, atol=1e-4)


def test_sparse_requires_unit_cell_for_centralized_expert():
    p = FlockingParams(n_agents=64, comm_radius=0.5)
    with pytest.raises(ValueError, match="comm_radius"):
        rollout_large(None, None, jax.random.key(0), p, sparse=True,
                      expert_mode=True, centralized_expert=True)
