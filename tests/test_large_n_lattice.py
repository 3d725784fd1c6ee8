"""Production-regime (lattice-init, N >= 2048) parity for the O(N) cell
paths, CPU interpret mode — the envelope round 2's CI missed entirely
(every cells/pcells test ran at N <= 64 while the N=100k path shipped
broken; VERDICT r2 item 2/weak 5).

The compiled-TPU half of this gate is scripts/verify_cells_tpu.py (run it
on the chip before committing any ops/ or envs/ change): the r2 regression
itself — the lattice-init rotation matmul quantizing positions to bf16 on
the MXU — was invisible to every CPU test by construction.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.envs.flocking import (
    FlockingParams,
    _lattice_positions,
    _lattice_regime,
    reset,
)
from multiagent_gnn_policies_tpu.ops import cells as cc
from multiagent_gnn_policies_tpu.ops import pallas_cells as pc
from multiagent_gnn_policies_tpu.ops.blocked import (
    blocked_apply_adjT,
    blocked_frame,
)

N = 2048
P = FlockingParams(n_agents=N)


@pytest.fixture(scope="module")
def lattice_state():
    assert _lattice_regime(P)
    state, _ = jax.jit(reset, static_argnums=1)(jax.random.PRNGKey(0), P)
    return state.x


@pytest.mark.parametrize("n", [512, 2048, 4096])
def test_lattice_min_separation(n):
    """The constructive init must guarantee min_separation at any N — the
    property the (skipped) rejection loop used to enforce."""
    p = FlockingParams(n_agents=n)
    pos = _lattice_positions(jax.random.key(7), p)
    # O(N log N) check via the cell grid: min_r2 over the 3x3 sweep
    spec = pc.make_pcell_spec(p)
    grid = pc.build_pcell_grid(pos, spec)
    assert int(grid.overflow) == 0
    x = jnp.concatenate([pos, jnp.zeros_like(pos)], -1)
    fq = pc.frame(x, grid, spec, p)
    assert float(fq.min_r2) >= p.min_separation**2


def test_pcells_frame_parity_lattice(lattice_state):
    x = lattice_state
    spec = pc.make_pcell_spec(P)
    grid = pc.build_pcell_grid(x[:, :2], spec)
    assert int(grid.overflow) == 0
    fq = pc.frame(x, grid, spec, P, centralized=False)
    ref = blocked_frame(x, P, centralized=False, block=128)
    np.testing.assert_array_equal(np.asarray(fq.degree), np.asarray(ref.degree))
    np.testing.assert_allclose(np.asarray(fq.values), np.asarray(ref.values),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fq.expert), np.asarray(ref.expert),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(float(fq.min_r2), float(ref.min_r2), rtol=1e-6)


def test_cells_frame_parity_lattice(lattice_state):
    x = lattice_state
    spec = cc.make_cell_spec(P)
    grid = cc.build_cell_grid(x[:, :2], spec)
    assert int(grid.overflow) == 0
    fq = cc.cells_frame(x, grid, spec, P, centralized=True)
    ref = blocked_frame(x, P, centralized=True, block=128)
    np.testing.assert_array_equal(np.asarray(fq.degree), np.asarray(ref.degree))
    np.testing.assert_allclose(np.asarray(fq.values), np.asarray(ref.values),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fq.expert), np.asarray(ref.expert),
                               rtol=2e-4, atol=2e-3)


def test_pcells_apply_adjT_parity_lattice(lattice_state):
    x = lattice_state
    spec = pc.make_pcell_spec(P)
    grid = pc.build_pcell_grid(x[:, :2], spec)
    deg = blocked_frame(x, P, block=128).degree
    cols = jax.random.normal(jax.random.key(1), (N, 6))
    got = pc.apply_adjT(x[:, :2], deg, cols, spec, P, grid=grid)
    want = blocked_apply_adjT(x[:, :2], cols, P, block=128, deg=deg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("scan_chunks,traj", [(3, 0), (4, 16)])
def test_chunked_episode_bitwise_parity(scan_chunks, traj):
    """scan_chunks splits the episode into several jitted scans with the
    state crossing the host boundary — same reset key, same per-step key
    stream, so rewards/final state/trajectory must match the single-scan
    episode exactly (what lets the N=1M T=200 episode fit the worker)."""
    from multiagent_gnn_policies_tpu.models.actor import (
        ActorConfig,
        init_actor,
    )
    from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

    acfg = ActorConfig(n_s=6, n_a=2, hidden=(8,), k=3, ind_agg=0)
    params = init_actor(jax.random.key(0), acfg)
    p = FlockingParams(n_agents=96, episode_steps=10, max_resets=4)
    kw = dict(path="blocked", return_overflow=True, traj_agents=traj)
    out1 = rollout_large(params, acfg, jax.random.key(7), p, **kw)
    out2 = rollout_large(params, acfg, jax.random.key(7), p,
                         scan_chunks=scan_chunks, **kw)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
