"""Exactness of the fused Pallas cell sweep (ops/pallas_cells.py) against
the dense adjacency and the blocked path: pack/unpack round trips, frame
quantities, adjacency applies, delayed y-stacks, whole rollouts, and the
overflow certificate. Runs the kernels in interpret mode on the CPU mesh;
compiled-mode equivalence is exercised on real TPU by bench.py."""

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
from multiagent_gnn_policies_tpu.ops.pallas_cells import (
    PCellSpec,
    apply_adjT,
    build_pcell_grid,
    frame,
    make_pcell_spec,
    ystack,
    _pack,
    _unpack,
)
from multiagent_gnn_policies_tpu.ops.blocked import (
    blocked_frame,
    delay_carry_init,
    delay_carry_update,
    delayed_ystack,
)
from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

P = FlockingParams(n_agents=48, episode_steps=12)
SPEC = make_pcell_spec(P)


def _state(key, n=48, spread=3.0):
    pos = jax.random.uniform(key, (n, 2), minval=-spread, maxval=spread)
    vel = jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    return jnp.concatenate([pos, vel], axis=-1)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pack_unpack_roundtrip(seed):
    x = _state(jax.random.key(seed))
    grid = build_pcell_grid(x[:, :2], SPEC)
    assert int(grid.overflow) == 0
    packed = _pack(grid, SPEC, x)
    assert packed.shape == (SPEC.cx + 2, 4 * SPEC.cap, SPEC.cy_pad)
    back = _unpack(grid, SPEC, packed[1:-1])
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # every agent must hold a packed slot when overflow == 0
    assert int((grid.slot >= 0).sum()) == x.shape[0]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("centralized", [True, False])
def test_frame_matches_dense(seed, centralized):
    x = _state(jax.random.key(seed))
    grid = build_pcell_grid(x[:, :2], SPEC)
    assert int(grid.overflow) == 0
    fq = frame(x, grid, SPEC, P, centralized=centralized)
    obs = observe(x, P)
    np.testing.assert_allclose(
        np.asarray(fq.values), np.asarray(obs.values), atol=2e-3
    )
    want_expert = expert_action(x, P, centralized=centralized)
    np.testing.assert_allclose(
        np.asarray(fq.expert), np.asarray(want_expert), atol=2e-3
    )
    ref = blocked_frame(x, P, centralized=centralized, block=48)
    np.testing.assert_array_equal(
        np.asarray(fq.degree), np.asarray(ref.degree)
    )
    np.testing.assert_allclose(
        float(fq.min_r2), float(ref.min_r2), rtol=1e-6
    )


def test_overflow_counts_dropped_agents():
    # cap=8 with 20 coincident-cell agents must overflow by 12, never drop
    # silently
    pos = jnp.zeros((20, 2)) + jnp.arange(20)[:, None] * 1e-3
    spec = PCellSpec(cx=4, cy=4, cap=8, cell=1.0)
    grid = build_pcell_grid(pos, spec)
    assert int(grid.overflow) == 12
    assert int((grid.slot >= 0).sum()) == 8


def test_out_of_grid_agents_drop_and_count():
    pos = jnp.array([[0.0, 0.0], [0.5, 0.5], [100.0, 100.0]])
    spec = PCellSpec(cx=4, cy=4, cap=8, cell=1.0)
    grid = build_pcell_grid(pos, spec)
    assert int(grid.overflow) == 1
    assert int(grid.slot[2]) == -1


@pytest.mark.parametrize("c", [1, 6, 12])
def test_apply_adjT_matches_dense(c):
    x = _state(jax.random.key(3))
    n = x.shape[0]
    grid = build_pcell_grid(x[:, :2], SPEC)
    deg = blocked_frame(x, P, block=48).degree
    cols = jax.random.normal(jax.random.key(4), (n, c))
    out = apply_adjT(x[:, :2], deg, cols, SPEC, P, grid=grid)
    diff = x[:, None, :2] - x[None, :, :2]
    r2 = (diff**2).sum(-1)
    adj = jnp.where(jnp.eye(n, dtype=bool), 0.0,
                    (r2 < P.comm_radius**2).astype(x.dtype))
    want = (adj / jnp.maximum(deg, 1.0)[:, None]).T @ cols
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_ystack_matches_blocked(k):
    """Delayed y-stack over a short trajectory equals the blocked path's
    (and hence the dense GSO recursion's — test_blocked.py closes that
    loop)."""
    key = jax.random.key(5)
    x = _state(key)
    fq = blocked_frame(x, P, block=48)
    carry = delay_carry_init(fq.values, P.n_agents, k)
    prev_deg = fq.degree
    for t in range(k + 2):
        x2 = x + 0.05 * jax.random.normal(jax.random.fold_in(key, t), x.shape)
        fq2 = blocked_frame(x2, P, block=48)
        carry = delay_carry_update(
            carry, fq2.values, x[:, :2],
            deg_prev=prev_deg if carry.deg_hist.shape[0] else None,
        )
        x, prev_deg = x2, fq2.degree

    grid = build_pcell_grid(x[:, :2], SPEC)
    got = ystack(carry, grid, x, prev_deg, SPEC, P)
    want = delayed_ystack(carry, x[:, :2], P, block=48, deg_now=prev_deg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_rollout_large_pcells_matches_blocked():
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(8,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    p = FlockingParams(n_agents=64, episode_steps=6, max_resets=4)
    r1, x1, ovf = rollout_large(params, acfg, jax.random.key(3), p,
                                path="pcells", return_overflow=True)
    r2, x2 = rollout_large(params, acfg, jax.random.key(3), p,
                           path="blocked")
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-4)


def test_rollout_large_pcells_expert_mode():
    p = FlockingParams(n_agents=64, episode_steps=6, max_resets=4)
    r1, _ = rollout_large(None, None, jax.random.key(7), p, path="pcells",
                          expert_mode=True)
    r2, _ = rollout_large(None, None, jax.random.key(7), p, path="blocked",
                          expert_mode=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)


def test_rollout_large_pcells_sharded_matches_single():
    """Grid-row-banded mesh sweep (one kernel launch per device band,
    band-unpacked outputs psum'd) == single-device pcells rollout."""
    import pytest
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.asarray(devs[:2]), axis_names=("agents",))
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(8,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    p = FlockingParams(n_agents=63, episode_steps=6, max_resets=4)
    r1, x1 = rollout_large(params, acfg, jax.random.key(3), p,
                           path="pcells")
    r2, x2, ovf = rollout_large(params, acfg, jax.random.key(3), p,
                                path="pcells", mesh=mesh,
                                return_overflow=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=1e-5)


@pytest.mark.parametrize("variant", ["leader", "stoch"])
def test_rollout_large_sharded_variants_match_single(variant):
    """The index-sliced actor/dynamics mesh path now covers the
    leader/noise env variants (r4 VERDICT weak #4): the leader mask tests
    global indices and the noise stream is the full-swarm draw sliced per
    device, so the banded mesh rollout equals the single-device rollout
    exactly. N divisible by the mesh so _use_sharded_actor engages."""
    import dataclasses

    from jax.sharding import Mesh
    from multiagent_gnn_policies_tpu.parallel.large_n import (
        LargeNConfig,
        _use_sharded_actor,
    )

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.asarray(devs[:2]), axis_names=("agents",))
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(8,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    p = FlockingParams(n_agents=64, episode_steps=6, max_resets=4)
    if variant == "leader":
        p = dataclasses.replace(p, n_leaders=2)
    else:
        p = dataclasses.replace(p, dynamics_noise=0.05)
    assert _use_sharded_actor(LargeNConfig(
        params=p, block=1, rows=32, axis="agents", n_dev=2))
    r1, x1 = rollout_large(params, acfg, jax.random.key(3), p,
                           path="pcells")
    r2, x2, ovf = rollout_large(params, acfg, jax.random.key(3), p,
                                path="pcells", mesh=mesh,
                                return_overflow=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=1e-5)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_grid_build_bitwise(n_dev):
    """build_pcell_grid_sharded (per-device 1/D argsort + per-cell base
    offsets) must reproduce the replicated build's packing BITWISE —
    contiguous ascending index slices make local-rank + base identical to
    the global stable sort's rank."""
    from jax.sharding import Mesh, PartitionSpec as SP
    from multiagent_gnn_policies_tpu.ops.pallas_cells import (
        build_pcell_grid_sharded,
    )

    devs = jax.devices()
    if len(devs) < n_dev:
        pytest.skip(f"needs {n_dev} devices")
    mesh = Mesh(np.asarray(devs[:n_dev]), axis_names=("agents",))
    n = 128
    # heavy clustering so some cells overflow (rank >= cap drops exercised)
    x = _state(jax.random.key(5), n=n, spread=1.2)
    spec = make_pcell_spec(FlockingParams(n_agents=n), cap=8)
    want = build_pcell_grid(x[:, :2], spec)
    got = jax.jit(jax.shard_map(
        lambda pos: build_pcell_grid_sharded(pos, spec, "agents", n_dev),
        mesh=mesh, in_specs=SP(), out_specs=SP(), check_vma=False,
    ))(x[:, :2])
    for field in ("slot", "agent", "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)), np.asarray(getattr(want, field)),
            err_msg=field,
        )


def test_rollout_large_sharded_build_matches_single():
    """End-to-end mesh rollout with N divisible by the mesh (so the
    sharded grid build engages, not the fallback) == single device."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.asarray(devs[:2]), axis_names=("agents",))
    acfg = ActorConfig(n_s=6, n_a=2, hidden=(8,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    p = FlockingParams(n_agents=64, episode_steps=6, max_resets=4)
    r1, x1 = rollout_large(params, acfg, jax.random.key(3), p,
                           path="pcells")
    r2, x2, ovf = rollout_large(params, acfg, jax.random.key(3), p,
                                path="pcells", mesh=mesh,
                                return_overflow=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=1e-5)


@pytest.mark.parametrize("max_cols", [1, 2, 5])
def test_ystack_column_chunking_parity(max_cols):
    """The HBM-ceiling chunked apply (max_cols) is exact: splitting the
    transpose-apply into column chunks changes buffer sizes, never values
    (what lets the 1M-agent policy rollout fit one chip)."""
    k = 3
    key = jax.random.key(9)
    x = _state(key)
    fq = blocked_frame(x, P, block=48)
    carry = delay_carry_init(fq.values, P.n_agents, k)
    prev_deg = fq.degree
    for t in range(k + 1):
        x2 = x + 0.05 * jax.random.normal(jax.random.fold_in(key, t), x.shape)
        fq2 = blocked_frame(x2, P, block=48)
        carry = delay_carry_update(
            carry, fq2.values, x[:, :2],
            deg_prev=prev_deg if carry.deg_hist.shape[0] else None,
        )
        x, prev_deg = x2, fq2.degree
    grid = build_pcell_grid(x[:, :2], SPEC)
    want = ystack(carry, grid, x, prev_deg, SPEC, P)
    got = ystack(carry, grid, x, prev_deg, SPEC, P, max_cols=max_cols)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("c", [6, 12])
def test_frame_apply_fused_parity(c):
    """frame_apply (one shared pack, degrees read from the frame kernel's
    packed output) == frame + apply_adjT run separately."""
    from multiagent_gnn_policies_tpu.ops.pallas_cells import frame_apply

    key = jax.random.key(3)
    x = _state(key)
    cols = jax.random.normal(jax.random.fold_in(key, 2), (48, c))
    grid = build_pcell_grid(x[:, :2], SPEC)
    fq_want = frame(x, grid, SPEC, P, True)
    a_want = apply_adjT(x[:, :2], fq_want.degree, cols, SPEC, P, grid)
    fq_got, a_got = frame_apply(x, cols, grid, SPEC, P, True)
    for f in ("values", "degree", "expert", "min_r2"):
        np.testing.assert_allclose(
            np.asarray(getattr(fq_got, f)), np.asarray(getattr(fq_want, f)),
            atol=1e-6, err_msg=f,
        )
    np.testing.assert_allclose(np.asarray(a_got), np.asarray(a_want),
                               atol=1e-5)


@pytest.mark.parametrize("edge_mult", [1.5, 2.0])
def test_edge_mult_parity(edge_mult):
    """A larger-than-minimum cell edge (the r5 occupancy/padding lever)
    keeps the 3x3 sweep exact: frame quantities and the transpose-apply
    must match the default-edge grid on the same swarm."""
    from multiagent_gnn_policies_tpu.ops.pallas_cells import make_pcell_spec

    key = jax.random.key(3)
    x = _state(key)
    cols = jax.random.normal(jax.random.fold_in(key, 2), (48, 6))
    spec2 = make_pcell_spec(P, edge_mult=edge_mult)
    assert spec2.cell == pytest.approx(max(P.comm_radius, 1.0) * edge_mult)
    g1 = build_pcell_grid(x[:, :2], SPEC)
    g2 = build_pcell_grid(x[:, :2], spec2)
    assert int(g2.overflow) == 0
    fq1 = frame(x, g1, SPEC, P, True)
    fq2 = frame(x, g2, spec2, P, True)
    for f in ("values", "degree", "expert", "min_r2"):
        np.testing.assert_allclose(
            np.asarray(getattr(fq2, f)), np.asarray(getattr(fq1, f)),
            atol=1e-5, err_msg=f,
        )
    a1 = apply_adjT(x[:, :2], fq1.degree, cols, SPEC, P, g1)
    a2 = apply_adjT(x[:, :2], fq2.degree, cols, spec2, P, g2)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-5)


@pytest.mark.parametrize("max_cols", [5, 6])
def test_frame_apply_max_cols_parity(max_cols):
    """Column-chunked fused apply (the r5 HBM-ceiling knob that lets the
    fused path run at N=1M) == the single-sweep apply, including uneven
    chunk splits."""
    from multiagent_gnn_policies_tpu.ops.pallas_cells import frame_apply

    key = jax.random.key(3)
    x = _state(key)
    cols = jax.random.normal(jax.random.fold_in(key, 2), (48, 12))
    grid = build_pcell_grid(x[:, :2], SPEC)
    fq1, a1 = frame_apply(x, cols, grid, SPEC, P, True)
    fq2, a2 = frame_apply(x, cols, grid, SPEC, P, True, max_cols=max_cols)
    for f in ("values", "degree", "expert", "min_r2"):
        np.testing.assert_allclose(
            np.asarray(getattr(fq2, f)), np.asarray(getattr(fq1, f)),
            atol=1e-6, err_msg=f,
        )
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-6)


def test_frame_apply_fused_parity_banded():
    """Banded multi-chip frame_apply (grid-row bands + one psum) ==
    single-device frame_apply, on the virtual mesh."""
    from jax.sharding import Mesh, PartitionSpec as SP
    from multiagent_gnn_policies_tpu.ops.pallas_cells import frame_apply

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.asarray(devs[:2]), axis_names=("agents",))
    n = 64
    p = FlockingParams(n_agents=n)
    spec = make_pcell_spec(p, n_dev=2)
    key = jax.random.key(8)
    x = _state(key, n=n)
    cols = jax.random.normal(jax.random.fold_in(key, 1), (n, 6))
    grid = build_pcell_grid(x[:, :2], spec)
    fq1, a1 = frame_apply(x, cols, grid, spec, p, True)
    local = spec.cx // 2

    def run(x, cols):
        g = build_pcell_grid(x[:, :2], spec)
        d = jax.lax.axis_index("agents")
        return frame_apply(x, cols, g, spec, p, True,
                           row_range=(d * local, local),
                           axis_name="agents")

    fq2, a2 = jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=(SP(), SP()), out_specs=(SP(), SP()),
        check_vma=False,
    ))(x, cols)
    for f in ("values", "degree", "expert", "min_r2"):
        np.testing.assert_allclose(
            np.asarray(getattr(fq2, f)), np.asarray(getattr(fq1, f)),
            atol=1e-6, err_msg=f,
        )
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), atol=1e-6)
