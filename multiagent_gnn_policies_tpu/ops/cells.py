"""Cell-list sparse path with REGULAR data movement — the TPU-fast O(N)
neighbor structure.

ops/binned.py already makes the radius graph O(N·cap) and exact, but its
per-candidate gathers ((N, 9·cap) irregular row gathers) run near-scalar
speed on TPU — measured 144 ms/step vs 14 ms for the blocked O(N^2) sweep
at N=10k on v5e. This module computes the same frame quantities and
adjacency applications with ZERO irregular per-candidate gathers:

1. **Pack** (:func:`build_cell_grid` + :func:`cell_pack`): agents are
   sorted by cell id (one O(N log N) sort) and scattered once into a dense
   ``(cx·cy, cap, F)`` slot table — N-row scatter, the only irregular op.
2. **Neighborhood by static slices**: the 3x3 cell neighborhood of every
   cell is materialized by 9 constant-offset slices of the padded grid —
   pure regular copies the TPU streams at HBM bandwidth.
3. **Dense pairwise sweep**: each cell's ``cap`` agents interact with the
   ``9·cap`` neighborhood candidates as a dense ``(cells, cap, 9·cap)``
   elementwise block (VPU) and the adjacency transpose-apply becomes a
   batched ``(cap, 9·cap) @ (9·cap, C)`` matmul (MXU) per cell.
4. **Unpack**: per-agent results come back with one N-row gather.

The sweep runs as a ``lax.scan`` over grid-row strips (like
ops/blocked.py), so peak memory is O(strip · cy · cap^2) regardless of N.

**Exactness contract** (tests/test_cells.py, vs the dense adjacency and
the blocked path): with ``overflow == 0`` — no cell exceeded ``cap`` and
no agent left the static grid extent — every radius neighbor is seen
exactly once, so values/degree/expert/adjacency-applies are exact.
``overflow`` counts dropped agents and is surfaced per rollout, never
silently (SURVEY §7 "no silent truncation").

The cell size is ``max(comm_radius, 1.0)`` so the 3x3 neighborhood covers
both the radius graph and the expert's unit-range potential for any cfg.
Grid extent is static (jit-friendly): the swarm's initial disc has radius
``sqrt(arena_r2_per_agent · N)`` (envs/flocking.py:_sample_positions) and
the per-step origin tracks the swarm's drift, so only the EXTENT needs
margin; flocking contracts the swarm, so ``margin`` times the initial
diameter holds with room (overflow certifies it every step).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

from multiagent_gnn_policies_tpu.envs.flocking import COLLISION_R2_EPS, FlockingParams
from multiagent_gnn_policies_tpu.ops.precision import centralized_consensus

# 3x3 neighborhood offsets into the padded grid (dx, dy in {0, 1, 2})
_OFFS = [(dx, dy) for dx in range(3) for dy in range(3)]


class CellSpec(NamedTuple):
    """Static cell-grid geometry (hashable — safe to close over in jit)."""

    cx: int        # grid cells along x
    cy: int        # grid cells along y
    cap: int       # agent slots per cell
    cell: float    # cell edge length (>= comm_radius and >= 1.0)
    strip: int     # grid rows swept per scan iteration


def make_cell_spec(
    p: FlockingParams,
    cap: int = 12,
    margin: float = 1.3,
    strip_rows: int = 8,
    n_dev: int = 1,
) -> CellSpec:
    """Grid sized for ``p``'s initial swarm extent times ``margin``.

    The sweep pays (cells · cap · 9cap) pair-ops whether slots are filled
    or not, so ``cap`` and ``margin`` are the padding-waste knobs: the
    defaults put the N=10k sweep at ~12M pair-ops vs the blocked path's
    100M. Occupancy is Poisson with mean ``cell² / arena_r2_per_agent / π``
    ≈ 2.1, so cap=12 overflows with negligible probability; the per-step
    ``overflow`` counter certifies it (and the origin tracks the swarm's
    drift each frame, so ``margin`` only covers shape change, which
    flocking contracts).

    ``n_dev > 1`` rounds the grid so each of ``n_dev`` devices sweeps an
    equal whole number of strips (the sharded sweep partitions GRID ROWS —
    see :func:`cells_frame` ``row_range``)."""
    cell = max(p.comm_radius, 1.0)
    extent = 2.0 * math.sqrt(p.arena_r2_per_agent * p.n_agents) * margin
    need = max(3, math.ceil(extent / cell) + 2)
    unit = strip_rows * max(1, n_dev)
    cx = ((need + unit - 1) // unit) * unit
    return CellSpec(cx=cx, cy=cx, cap=cap, cell=cell,
                    strip=min(strip_rows, cx))


class CellGrid(NamedTuple):
    """One frame's agent→slot assignment.

    Attributes:
      slot_of_agent: (N,) int32 packed slot per agent; dropped agents
        (cell over ``cap`` or outside the grid) point at the dump slot
        ``cx·cy·cap`` (unpack returns the fill value for them).
      agent_of_slot: (cx·cy·cap,) int32 agent index per slot, -1 empty.
      overflow: () int32 dropped-agent count; 0 ⇒ the grid is exact.
    """

    slot_of_agent: jax.Array
    agent_of_slot: jax.Array
    overflow: jax.Array


def build_cell_grid(pos: jax.Array, spec: CellSpec) -> CellGrid:
    """Sort agents by cell and assign packed slots (O(N log N), regular)."""
    n = pos.shape[0]
    nslots = spec.cx * spec.cy * spec.cap
    origin = jnp.min(pos, axis=0)
    ij = jnp.floor((pos - origin) / spec.cell).astype(jnp.int32)  # >= 0
    in_grid = (ij[:, 0] < spec.cx) & (ij[:, 1] < spec.cy)
    ijc = jnp.minimum(ij, jnp.asarray([spec.cx - 1, spec.cy - 1], jnp.int32))
    cid = ijc[:, 0] * spec.cy + ijc[:, 1]
    order = jnp.argsort(cid)                        # stable -> deterministic
    sc = cid[order]
    # rank in cell run = i - first index of the run (cummax over run
    # starts): equivalent to searchsorted(sc, sc) on the sorted array but
    # log-depth VPU work instead of a vmapped binary-search while_loop
    # (ops/pallas_cells.py:build_pcell_grid rationale)
    i = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sc[1:] != sc[:-1]])
    first = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, i, 0))
    rank = i - first
    ok = (rank < spec.cap) & in_grid[order]
    slot = jnp.where(ok, sc * spec.cap + rank, nslots)
    agent_of_slot = (
        jnp.full((nslots + 1,), -1, jnp.int32).at[slot].set(order)[:-1]
    )
    slot_of_agent = (
        jnp.full((n,), nslots, jnp.int32).at[order].set(slot)
    )
    return CellGrid(
        slot_of_agent=slot_of_agent,
        agent_of_slot=agent_of_slot,
        overflow=(n - jnp.sum(ok)).astype(jnp.int32),
    )


def cell_pack(grid: CellGrid, arr: jax.Array, fill: float = 0.0) -> jax.Array:
    """(N, F) agent-major -> (cx·cy·cap, F) slot-major.

    A slot-major gather of whole rows via ``agent_of_slot`` (empty slots
    read the fill row) — runs at HBM bandwidth, unlike the scatter form
    whose zero-init can't fuse (measured ~5 ms per pack at N=100k)."""
    n = arr.shape[0]
    pad = jnp.full((1,) + arr.shape[1:], fill, arr.dtype)
    arr1 = jnp.concatenate([arr, pad], axis=0)
    return arr1[jnp.where(grid.agent_of_slot >= 0, grid.agent_of_slot, n)]


def cell_unpack(grid: CellGrid, packed: jax.Array, fill: float = 0.0) -> jax.Array:
    """(cx·cy·cap, F) slot-major -> (N, F) agent-major (one N-row gather);
    dropped agents get ``fill``."""
    pad = jnp.full((1,) + packed.shape[1:], fill, packed.dtype)
    return jnp.concatenate([packed, pad], axis=0)[grid.slot_of_agent]


def cell_unpack_band(
    grid: CellGrid, packed: jax.Array, start_slot, fill: float = 0.0
) -> jax.Array:
    """Band unpack for the sharded sweep: ``packed`` holds only slots
    ``[start_slot, start_slot + len(packed))``; agents outside the band
    (and dropped agents — the dump slot is outside every band) get
    ``fill``. Summing the bands' results over the mesh (``psum``)
    reassembles the full per-agent table while moving only (N, F) bytes —
    the slot table itself (~cap/occupancy times larger) never crosses
    chips."""
    idx = grid.slot_of_agent - start_slot
    ok = (idx >= 0) & (idx < packed.shape[0])
    vals = packed[jnp.where(ok, idx, 0)]
    shape = (ok.shape[0],) + (1,) * (packed.ndim - 1)
    return jnp.where(ok.reshape(shape), vals, fill)


def _strip_views(spec: CellSpec, gx: jax.Array, gi: jax.Array, s0):
    """Slot data and 3x3-neighborhood data for grid rows [s0, s0+strip).

    Args:
      gx: (cx+2, cy+2, cap, F) zero-padded grid values.
      gi: (cx+2, cy+2, cap) padded agent ids (-1 empty).
      s0: first (unpadded) grid row of the strip.

    Returns:
      xi (S, cy, cap, F), ii (S, cy, cap),
      xj (S, cy, 9·cap, F), ij (S, cy, 9·cap).
    """
    S, cy, cap = spec.strip, spec.cy, spec.cap
    f = gx.shape[-1]
    rows = jax.lax.dynamic_slice(
        gx, (s0, 0, 0, 0), (S + 2, cy + 2, cap, f)
    )
    irows = jax.lax.dynamic_slice(gi, (s0, 0, 0), (S + 2, cy + 2, cap))
    xi = rows[1:1 + S, 1:1 + cy]
    ii = irows[1:1 + S, 1:1 + cy]
    xj = jnp.stack(
        [rows[dx:dx + S, dy:dy + cy] for dx, dy in _OFFS], axis=2
    ).reshape(S, cy, 9 * cap, f)
    ij = jnp.stack(
        [irows[dx:dx + S, dy:dy + cy] for dx, dy in _OFFS], axis=2
    ).reshape(S, cy, 9 * cap)
    return xi, ii, xj, ij


def _pad_grid(spec: CellSpec, packed: jax.Array, ids: jax.Array):
    f = packed.shape[-1]
    g = packed.reshape(spec.cx, spec.cy, spec.cap, f)
    gi = ids.reshape(spec.cx, spec.cy, spec.cap)
    gx = jnp.pad(g, ((1, 1), (1, 1), (0, 0), (0, 0)))
    gi = jnp.pad(gi, ((1, 1), (1, 1), (0, 0)), constant_values=-1)
    return gx, gi


def _pad_grid_band(
    spec: CellSpec, grid: CellGrid, vals: jax.Array, row_range=None
):
    """Banded grid build: gather + pad ONLY grid rows
    ``[start-1, start+local+1)`` of the slot table (the rows a device's
    strips read, halo included; rows outside the global grid come out
    empty). The full-grid pack was replicated per device and measured as
    the dominant share of the multi-chip step (ops/pallas_cells.py:_pack
    rationale); ``None`` = full grid, identical to _pad_grid's output.

    Returns ``(gx (local+2, cy+2, cap, F), gi (local+2, cy+2, cap))``;
    strip ``s`` of the band starts at padded-row ``s * spec.strip``."""
    n, f = vals.shape
    cx, cy, cap = spec.cx, spec.cy, spec.cap
    start, local = (0, cx) if row_range is None else row_range
    agent3 = grid.agent_of_slot.reshape(cx, cy, cap)
    rows = start - 1 + jnp.arange(local + 2)
    in_g = (rows >= 0) & (rows < cx)
    a = jnp.take(agent3, jnp.clip(rows, 0, cx - 1), axis=0)
    a = jnp.where(in_g[:, None, None], a, -1)          # (local+2, cy, cap)
    vals1 = jnp.concatenate([vals, jnp.zeros((1, f), vals.dtype)], axis=0)
    gx = jnp.where(
        (a >= 0)[..., None], vals1[jnp.where(a >= 0, a, n)], 0.0
    )
    gx = jnp.pad(gx, ((0, 0), (1, 1), (0, 0), (0, 0)))
    gi = jnp.pad(a, ((0, 0), (1, 1), (0, 0)), constant_values=-1)
    return gx, gi


def cells_frame(
    x: jax.Array,
    grid: CellGrid,
    spec: CellSpec,
    p: FlockingParams,
    centralized: bool = True,
    row_range=None,
    axis_name: Optional[str] = None,
):
    """Frame quantities (ops/blocked.py:blocked_frame semantics — the
    6-feature observation row-sums, radius degrees, expert controller,
    min pairwise r2) via the dense cell sweep; per-AGENT outputs.

    Args:
      row_range: ``(start_row, local_rows)`` — sweep only grid rows
        ``[start_row, start_row + local_rows)`` (the multi-chip partition:
        the O(N) pack is replicated, each device sweeps its own band of
        grid rows, band-unpacks to per-agent values, and a ``psum`` over
        the mesh completes the (N, ·) outputs — every agent lives in
        exactly one band, so the sum is exact and only O(N·F) bytes ride
        the interconnect, never the slot table).
      axis_name: mesh axis to psum over (with ``row_range``).
    """
    from multiagent_gnn_policies_tpu.ops.blocked import FrameQuantities

    n = x.shape[0]
    start, local_rows = (
        (jnp.zeros((), jnp.int32), spec.cx) if row_range is None else row_range
    )
    if centralized:
        # compensated O(N) consensus term (ops/precision.py — a plain f32
        # mean here amplifies its reduction error by N), packed alongside
        # the state so the strip sweep reads it per agent
        cons = centralized_consensus(x[:, 2:4])
        xin = jnp.concatenate([x, cons], axis=-1)          # (N, 6)
    else:
        xin = x
    gx, gi = _pad_grid_band(spec, grid, xin, row_range)
    r2cut = p.comm_radius * p.comm_radius
    nstrips = local_rows // spec.strip

    def body(min_r2, s):
        xi, ii, xj, ij = _strip_views(spec, gx, gi, s * spec.strip)
        pair_ok = (
            (ii[..., :, None] >= 0)
            & (ij[..., None, :] >= 0)
            & (ii[..., :, None] != ij[..., None, :])
        )                                            # (S, cy, cap, 9cap)
        dx = xi[..., :, None, 0] - xj[..., None, :, 0]
        dy = xi[..., :, None, 1] - xj[..., None, :, 1]
        dvx = xi[..., :, None, 2] - xj[..., None, :, 2]
        dvy = xi[..., :, None, 3] - xj[..., None, :, 3]
        r2 = dx * dx + dy * dy
        r2s = jnp.maximum(jnp.where(pair_ok, r2, 1.0), COLLISION_R2_EPS)
        inv_r2 = 1.0 / r2s
        inv_r4 = inv_r2 * inv_r2
        m = (pair_ok & (r2 < r2cut)).astype(x.dtype)
        values = jnp.stack(
            [
                jnp.sum(dvx * m, axis=-1),
                jnp.sum(dx * inv_r4 * m, axis=-1),
                jnp.sum(dx * inv_r2 * m, axis=-1),
                jnp.sum(dvy * m, axis=-1),
                jnp.sum(dy * inv_r4 * m, axis=-1),
                jnp.sum(dy * inv_r2 * m, axis=-1),
            ],
            axis=-1,
        )                                            # (S, cy, cap, 6)
        degree = jnp.sum(m, axis=-1)

        okf = pair_ok.astype(x.dtype)
        in_range = okf * (r2 <= 1.0).astype(x.dtype)
        gxp = (-2.0 * dx * inv_r4 + 2.0 * dx * inv_r2) * in_range
        gyp = (-2.0 * dy * inv_r4 + 2.0 * dy * inv_r2) * in_range
        if centralized:
            ux = -(xi[..., 4] + jnp.sum(gxp, axis=-1))
            uy = -(xi[..., 5] + jnp.sum(gyp, axis=-1))
        else:
            ux = -(jnp.sum(dvx * m, axis=-1) + jnp.sum(gxp * m, axis=-1))
            uy = -(jnp.sum(dvy * m, axis=-1) + jnp.sum(gyp * m, axis=-1))
        expert = jnp.clip(jnp.stack([ux, uy], -1), -10.0, 10.0)

        strip_min = jnp.min(jnp.where(pair_ok, r2, jnp.inf))
        flat = spec.strip * spec.cy * spec.cap
        return jnp.minimum(min_r2, strip_min), (
            values.reshape(flat, 6),
            degree.reshape(flat),
            expert.reshape(flat, 2),
        )

    min_r2, (values, degree, expert) = jax.lax.scan(
        body, jnp.asarray(jnp.inf, x.dtype), jnp.arange(nstrips)
    )
    nloc = local_rows * spec.cy * spec.cap
    values = values.reshape(nloc, 6)
    degree = degree.reshape(nloc)
    expert = expert.reshape(nloc, 2)
    if axis_name is not None:
        stacked = jnp.concatenate(
            [values, degree[:, None], expert], axis=-1
        )                                            # (nloc, 9)
        per = cell_unpack_band(grid, stacked, start * spec.cy * spec.cap)
        per = jax.lax.psum(per, axis_name)
        return FrameQuantities(
            values=per[:, :6], degree=per[:, 6], expert=per[:, 7:9],
            min_r2=jax.lax.pmin(min_r2, axis_name),
        )
    return FrameQuantities(
        values=cell_unpack(grid, values),
        degree=cell_unpack(grid, degree[:, None])[:, 0],
        expert=cell_unpack(grid, expert),
        min_r2=min_r2,
        # min over the 3x3 neighborhoods = global min pairwise r2 whenever
        # the true min is below the cell size (always holds for the reset
        # acceptance threshold min_separation < comm_radius <= cell)
    )


def cells_apply_adjT(
    pos_src: jax.Array,
    deg_src: jax.Array,
    cols: jax.Array,
    spec: CellSpec,
    p: FlockingParams,
    grid: Optional[CellGrid] = None,
    row_range=None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """``out[i] = sum_{j in nbr(i)} cols[j] / deg_j`` — the row-normalized
    adjacency transpose-apply (ops/graph.py:aggregate semantics; the radius
    graph is symmetric) as a batched (cap, 9·cap) @ (9·cap, C) MXU matmul
    per cell.

    Args:
      pos_src: (N, 2) positions defining the (historical) radius graph.
      deg_src: (N,) that graph's degrees (the rollout carries them —
        ops/blocked.py:DelayCarry.deg_hist); episode-start placeholder
        graphs have deg=1 and all-zero ``cols``, so they contribute 0
        exactly as the dense recursion's zero slots.
      cols: (N, C) feature columns of the matching time step.
      grid: the packing for ``pos_src`` if the caller already built it
        (the current frame's); rebuilt here otherwise.
      row_range / axis_name: grid-row partition + regather axis for the
        multi-chip sweep (:func:`cells_frame` semantics).
    """
    if grid is None:
        grid = build_cell_grid(pos_src, spec)
    c = cols.shape[-1]
    # weight channel: cols_j / max(deg_j, 1) packed alongside positions
    wcols = cols / jnp.maximum(deg_src, 1.0)[:, None]
    start, local_rows = (
        (jnp.zeros((), jnp.int32), spec.cx) if row_range is None else row_range
    )
    gx, gi = _pad_grid_band(
        spec, grid, jnp.concatenate([pos_src, wcols], axis=-1), row_range
    )
    r2cut = p.comm_radius * p.comm_radius
    nstrips = local_rows // spec.strip

    def body(_, s):
        xi, ii, xj, ij = _strip_views(spec, gx, gi, s * spec.strip)
        dx = xi[..., :, None, 0] - xj[..., None, :, 0]
        dy = xi[..., :, None, 1] - xj[..., None, :, 1]
        m = (
            (ii[..., :, None] >= 0)
            & (ij[..., None, :] >= 0)
            & (ii[..., :, None] != ij[..., None, :])
            & (dx * dx + dy * dy < r2cut)
        ).astype(xi.dtype)                            # (S, cy, cap, 9cap)
        out = jnp.einsum("sype,syec->sypc", m, xj[..., 2:])
        flat = spec.strip * spec.cy * spec.cap
        return None, out.reshape(flat, c)

    _, out = jax.lax.scan(body, None, jnp.arange(nstrips))
    out = out.reshape(local_rows * spec.cy * spec.cap, c)
    if axis_name is not None:
        per = cell_unpack_band(grid, out, start * spec.cy * spec.cap)
        return jax.lax.psum(per, axis_name)
    return cell_unpack(grid, out)


def cells_ystack(
    carry,
    grid_now: CellGrid,
    x_now: jax.Array,
    deg_now: jax.Array,
    spec: CellSpec,
    p: FlockingParams,
    row_range=None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """The aggregated delayed stack ``y_k = G_k(t)^T x_{t-k}`` (K, N, F) —
    ops/blocked.py:delayed_ystack with every adjacency transpose-apply on
    the cell grid. Newest graph applied first (the reference's
    left-multiplied GSO recursion, state_with_delay.py:44-47); historical
    grids are rebuilt from the carry's stored positions, their overflow
    was counted when those frames were current (see ops/binned.py
    :binned_ystack for the episode-boundary argument)."""
    k = carry.history.shape[0]
    n, f = carry.history.shape[1:]
    y = [carry.history[0]]
    if k == 1:
        return jnp.stack(y)
    v = carry.history[1:]                              # slots 1..K-1
    for s in range(k - 1):
        if s == 0:
            pos_s, deg_s, grid_s = x_now[:, :2], deg_now, grid_now
        else:
            pos_s, deg_s, grid_s = (
                carry.pos_hist[s - 1], carry.deg_hist[s - 1], None
            )
        cols = jnp.transpose(v[s:], (1, 0, 2)).reshape(n, (k - 1 - s) * f)
        out = cells_apply_adjT(pos_s, deg_s, cols, spec, p, grid=grid_s,
                               row_range=row_range, axis_name=axis_name)
        v = v.at[s:].set(jnp.transpose(out.reshape(n, k - 1 - s, f), (1, 0, 2)))
        y.append(v[s])
    return jnp.stack(y)
