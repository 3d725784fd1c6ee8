"""Exactness of the regular-layout cell-grid path (ops/cells.py) against
the dense adjacency and the blocked path: pack/unpack round trips, frame
quantities, adjacency applies, delayed y-stacks, whole rollouts, and the
overflow certificate."""

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
from multiagent_gnn_policies_tpu.ops.cells import (
    build_cell_grid,
    cell_pack,
    cell_unpack,
    cells_apply_adjT,
    cells_frame,
    cells_ystack,
    make_cell_spec,
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
SPEC = make_cell_spec(P, cap=16)


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
def test_pack_unpack_roundtrip(seed):
    x = _state(jax.random.key(seed))
    grid = build_cell_grid(x[:, :2], SPEC)
    assert int(grid.overflow) == 0
    packed = cell_pack(grid, x)
    np.testing.assert_array_equal(cell_unpack(grid, packed), x)
    # agent_of_slot is the inverse of slot_of_agent
    aos = np.asarray(grid.agent_of_slot)
    soa = np.asarray(grid.slot_of_agent)
    for a, s in enumerate(soa):
        assert aos[s] == a


def test_overflow_detected_cap():
    pos = jnp.zeros((20, 2)) + jnp.arange(20)[:, None] * 0.001  # one cell
    spec = make_cell_spec(FlockingParams(n_agents=20), cap=4)
    grid = build_cell_grid(pos, spec)
    assert int(grid.overflow) == 16
    # dropped agents unpack to the fill value
    out = cell_unpack(grid, cell_pack(grid, jnp.ones((20, 1))), fill=-7.0)
    assert int(jnp.sum(out == -7.0)) == 16


def test_overflow_detected_out_of_grid():
    spec = make_cell_spec(FlockingParams(n_agents=4), cap=8)
    pos = jnp.array([[0.0, 0.0], [1.0, 1.0],
                     [spec.cx * spec.cell + 5.0, 0.0], [2.0, 2.0]])
    grid = build_cell_grid(pos, spec)
    assert int(grid.overflow) == 1


@pytest.mark.parametrize("centralized", [True, False])
def test_cells_frame_matches_dense(centralized):
    x = _state(jax.random.key(3))
    grid = build_cell_grid(x[:, :2], SPEC)
    fq = cells_frame(x, grid, SPEC, P, centralized=centralized)
    obs = observe(x, P)
    np.testing.assert_allclose(fq.values, obs.values, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        fq.expert, expert_action(x, P, centralized=centralized),
        rtol=1e-5, atol=1e-5,
    )
    adj = np.asarray(_adj(x))
    np.testing.assert_allclose(fq.degree, adj.sum(1))
    diff = np.asarray(x[:, None, :2] - x[None, :, :2])
    r2 = (diff**2).sum(-1) + np.where(np.eye(48), np.inf, 0.0)
    np.testing.assert_allclose(float(fq.min_r2), r2.min(), rtol=1e-6)


def test_cells_frame_small_comm_radius_centralized():
    """cell = max(comm_radius, 1) keeps the centralized expert's unit-range
    potential covered even when the graph radius is < 1."""
    p = FlockingParams(n_agents=48, comm_radius=0.5)
    spec = make_cell_spec(p, cap=16)
    assert spec.cell == 1.0
    x = _state(jax.random.key(4), spread=2.0)
    grid = build_cell_grid(x[:, :2], spec)
    fq = cells_frame(x, grid, spec, p, centralized=True)
    np.testing.assert_allclose(
        fq.expert, expert_action(x, p, centralized=True), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(fq.values, observe(x, p).values,
                               rtol=1e-5, atol=1e-5)


def test_cells_apply_adjT_matches_aggregate():
    x = _state(jax.random.key(5))
    cols = jax.random.normal(jax.random.key(6), (48, 5))
    adj = _adj(x)
    deg = jnp.sum(adj, axis=1)
    out = cells_apply_adjT(x[:, :2], deg, cols, SPEC, P)
    a = normalized_adjacency(adj)
    np.testing.assert_allclose(out, a.T @ cols, rtol=1e-5, atol=1e-5)


def test_cells_ystack_matches_dense_over_trajectory():
    k = 3
    key = jax.random.key(7)
    x = _state(key)
    obs = observe(x, P)
    gs = initial_graph_state(obs.values, obs.network, k)
    carry = delay_carry_init(obs.values, 48, k)

    for t in range(6):
        dense_y = aggregate(gs.delay_gso, gs.delay_state)
        grid = build_cell_grid(x[:, :2], SPEC)
        deg = jnp.sum(_adj(x), axis=1)
        cells_y = cells_ystack(carry, grid, x, deg, SPEC, P)
        np.testing.assert_allclose(cells_y, dense_y, rtol=1e-4, atol=1e-5)

        key = jax.random.fold_in(key, t)
        pos_prev = x[:, :2]
        deg_prev = jnp.sum(_adj(x), axis=1)
        x = x + 0.1 * jax.random.normal(key, x.shape)
        obs = observe(x, P)
        gs = update_graph_state(gs, obs.values, obs.network)
        carry = delay_carry_update(carry, obs.values, pos_prev, deg_prev)


@pytest.mark.parametrize("expert_mode", [False, True])
def test_cells_rollout_matches_blocked(expert_mode):
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(16,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(8), acfg)
    key = jax.random.key(9)
    p = FlockingParams(n_agents=64, episode_steps=10)

    r_blk, x_blk = rollout_large(params, acfg, key, p, path="blocked",
                                 expert_mode=expert_mode)
    r_c, x_c, ovf = rollout_large(params, acfg, key, p, path="cells",
                                  expert_mode=expert_mode,
                                  return_overflow=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(r_c, r_blk, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(x_c, x_blk, rtol=1e-4, atol=1e-4)


def test_cells_rollout_k1_and_k2():
    """Degenerate filter lengths exercise the no-history / no-pos-hist
    carry shapes through the cells path."""
    key = jax.random.key(10)
    p = FlockingParams(n_agents=64, episode_steps=6)
    for k in (1, 2):
        acfg = ActorConfig(n_s=6, n_a=2, hidden=(16,), k=k, ind_agg=0)
        params = init_actor(jax.random.key(11 + k), acfg)
        r_blk, _ = rollout_large(params, acfg, key, p, path="blocked")
        r_c, _ = rollout_large(params, acfg, key, p, path="cells")
        np.testing.assert_allclose(r_c, r_blk, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_cells_rollout_sharded_matches_single(n_dev):
    """Grid-row-banded mesh sweep == single-device sweep, bit-for-bit up to
    summation order (the partition only reorders which device computes each
    slot's sums; every agent lives in exactly one band, so the psum of the
    band-unpacked per-agent values is exact)."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < n_dev:
        pytest.skip(f"needs {n_dev} devices")
    mesh = Mesh(np.array(devs[:n_dev]), axis_names=("agents",))
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(16,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(8), acfg)
    key = jax.random.key(9)
    # N deliberately NOT divisible by n_dev=4: the cell paths partition
    # grid rows, not agents, so any swarm size shards
    p = FlockingParams(n_agents=66, episode_steps=8)

    r1, x1 = rollout_large(params, acfg, key, p, path="cells")
    r2, x2, ovf = rollout_large(params, acfg, key, p, path="cells",
                                mesh=mesh, return_overflow=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(r2, r1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(x2, x1, rtol=1e-5, atol=1e-5)


def test_cells_rollout_sharded_expert_mode():
    """The rejection-sampled reset (while_loop over sharded frames) and the
    expert controller agree with the single-device path on a mesh."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(devs[:2]), axis_names=("agents",))
    key = jax.random.key(12)
    p = FlockingParams(n_agents=64, episode_steps=8)
    r1, _ = rollout_large(None, None, key, p, path="cells",
                          expert_mode=True)
    r2, _ = rollout_large(None, None, key, p, path="cells", mesh=mesh,
                          expert_mode=True)
    np.testing.assert_allclose(r2, r1, rtol=1e-5, atol=1e-6)
