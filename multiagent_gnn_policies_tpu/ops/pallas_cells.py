"""Fused Pallas cell-sweep kernels — the O(N) neighbor structure at MXU/VPU
tile shapes.

ops/cells.py already gives the O(N) cell-list algorithm with regular data
movement, but its XLA formulation is tile-hostile: the pair block
``(strip, cy, cap, 9·cap)`` puts ``9·cap = 108`` on the 128-lane axis (18%
pad), ``cap = 12`` on sublanes (33% pad per 8-tile), and materializes nine
stacked dynamic slices per strip — measured 394 ms/step at N=100k on v5e,
<1% of the chip. These kernels rebuild the same sweep at exact tile shapes:

* **Slot layout** ``(cx+2, C·cap, cy_pad)`` per frame: sub-slot ``b`` on
  sublanes (``cap = 16`` — one f32 tile pair), grid column ``j`` on lanes
  (``cy_pad`` a multiple of 128), grid row ``i`` on the grid axis. The 3x3
  cell neighborhood of every cell in a row is then THREE static row blocks
  x THREE static lane shifts — no gathers, no transposes, no stacking.
* **Pair block** ``(cap^2, cy_pad)``: pair ``(a, b)`` of source sub-slot
  ``a`` and candidate sub-slot ``b`` lives at sublane ``a·cap + b`` —
  256 sublanes = 32 exact f32 tiles. Built by sublane broadcasts only.
* Per offset the pair math runs on the VPU and reduces over ``b`` (a
  ``(cap, cap, L) -> (cap, L)`` sublane-group sum); nine offsets unroll
  statically. Empty grid rows (the margin the static extent reserves for
  swarm drift) are skipped via a scalar-prefetched occupancy flag.

Two kernels cover everything the cell sweep is used for:

* :func:`frame` — observation feature row-sums, radius degree, expert
  potential-gradient sums, row-min pairwise r^2 (envs/flocking.py:observe
  / expert_action semantics; the velocity-consensus term of the
  centralized expert is completed outside — it is O(N), not a sweep).
* :func:`apply_adjT` — ``out[i] = sum_{j in nbr(i)} cols[j] / deg_j``, the
  row-normalized adjacency transpose-apply of the delayed-aggregation
  stack (ops/graph.py:aggregate semantics over the radius graph built
  from (possibly historical) positions — reference
  state_with_delay.py:44-47 applied in feature space).

Exactness contract matches ops/cells.py: with per-step ``overflow == 0``
(no cell over ``cap``, no agent outside the static extent) every radius
neighbor is seen exactly once — tests/test_pallas_cells.py asserts
equality with the dense/blocked paths. Cell edge is
``max(comm_radius, 1.0)`` so the 3x3 neighborhood covers both the radius
graph and the expert's unit-range potential.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multiagent_gnn_policies_tpu.envs.flocking import COLLISION_R2_EPS, FlockingParams
from multiagent_gnn_policies_tpu.ops.precision import centralized_consensus


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=1)
def _vmem_limit_bytes() -> int:
    """Scoped-VMEM budget for the sweep kernels.

    The default 16 MB budget rejects lane widths past ~512 (the unrolled
    9-offset sweep holds a few (cap^2, cy_pad) pair blocks live; 23.7 MB
    at cy_pad=1024 == N=1M). We grant 3/4 of the device's physical VMEM —
    96 MB on the 128 MB v5e/v5p/v6e generations — leaving headroom for
    pipelining buffers. Derived per device (r3 ADVICE item 4: a hardcoded
    96 MB would fail at compile time on a smaller-VMEM generation):
    pre-v5 TPUs have 16-32 MB, so those fall back to the 16 MB default.
    Override with MAGNN_VMEM_LIMIT_MB for unrecognized generations.
    """
    import os

    env = os.environ.get("MAGNN_VMEM_LIMIT_MB")
    if env:
        return int(env) * 1024 * 1024
    kind = ""
    try:
        dev = jax.devices()[0]
        if dev.platform == "tpu":
            kind = dev.device_kind.lower()
    except Exception:
        pass
    if any(g in kind for g in ("v5", "v6", "v7")):
        return 96 * 1024 * 1024
    return 16 * 1024 * 1024   # conservative default (pre-v5 / unknown / CPU)


class PCellSpec(NamedTuple):
    """Static cell-grid geometry for the Pallas sweep (hashable)."""

    cx: int        # grid rows (cells along x)
    cy: int        # grid cols (cells along y)
    cap: int       # agent slots per cell (sublane tile: keep a multiple of 8)
    cell: float    # cell edge length (>= comm_radius and >= 1.0)

    @property
    def cy_pad(self) -> int:
        """Lane width: cy + 2 halo columns, padded to the 128-lane tile."""
        return _ceil_to(self.cy + 2, 128)


def make_pcell_spec(
    p: FlockingParams, cap: int = 16, margin: float = 1.3, n_dev: int = 1,
    edge_mult: float = 1.0,
) -> PCellSpec:
    """Grid sized for ``p``'s initial swarm extent times ``margin``
    (ops/cells.py:make_cell_spec sizing argument). ``n_dev > 1`` rounds
    ``cx`` so each device sweeps an equal band of grid rows (see
    :func:`frame` ``row_range``).

    ``edge_mult``: cell edge as a multiple of the minimum legal edge
    ``max(comm_radius, 1.0)`` (any edge >= that keeps the 3x3 neighbor
    sweep exact — it only admits more out-of-radius candidates, which the
    kernels' r^2 mask rejects). The knob trades per-cell occupancy
    against grid area: the sweep's cost is cx * cy_pad * 9 * cap^2
    REGARDLESS of occupancy, and at the canonical density the default
    edge gives ~1 agent/cell — 16x slot padding and ~250x pair-compute
    padding. ``edge_mult = 2`` quarters grid area (4x less kernel compute
    and slot-table traffic) while raising mean occupancy toward ~4 of the
    same ``cap`` — the r5 roofline's single biggest lever. Flocking
    compression raises local density over an episode; the per-step
    overflow certificate remains the exactness gate exactly as for
    ``margin``/``cap``."""
    cell = max(p.comm_radius, 1.0) * edge_mult
    extent = 2.0 * math.sqrt(p.arena_r2_per_agent * p.n_agents) * margin
    need = max(3, math.ceil(extent / cell) + 2)
    return PCellSpec(cx=_ceil_to(need, max(1, n_dev)), cy=need,
                     cap=cap, cell=cell)


class PCellGrid(NamedTuple):
    """One frame's agent -> (cell, sub-slot) assignment.

    Attributes:
      slot: (N,) int32 ``(i·cap + b)·cy + j`` (cell-row-major slot id);
        -1 = dropped (cell over ``cap`` or outside the static extent).
      agent: (cx·cap·cy,) int32 agent index per slot, N = empty — the
        inverse of ``slot``, kept so packing is a slot-major GATHER (the
        scatter form measured ~5 ms per pack at N=100k on v5e because the
        scatter can't fuse with its zero-init; the gather runs at HBM
        bandwidth).
      overflow: () int32 dropped-agent count; 0 => the sweep is exact.

    The per-row kernel skip flags and occupancy-branch bounds are NOT
    stored here: they are derived per sweep from the packed table's valid
    channel with dense reductions (:func:`_occ_prefetch`) — the former
    per-step ``row_count`` scatter-add (and a prototype per-row
    scatter-max) measured ~0.5 ms/step at N=32k, replicated on every
    device, the single largest term of the multi-chip fixed-cost floor.
    """

    slot: jax.Array
    agent: jax.Array
    overflow: jax.Array


def _cell_ids(pos: jax.Array, origin: jax.Array, spec: PCellSpec):
    """Clamped cell id + in-grid flag per agent (shared by both builds)."""
    ij = jnp.floor((pos - origin) / spec.cell).astype(jnp.int32)   # >= 0
    in_grid = (ij[:, 0] < spec.cx) & (ij[:, 1] < spec.cy)
    ijc = jnp.minimum(ij, jnp.asarray([spec.cx - 1, spec.cy - 1], jnp.int32))
    return ijc[:, 0] * spec.cy + ijc[:, 1], in_grid


def _rank_in_run(sc: jax.Array) -> jax.Array:
    """Rank of each element within its equal-value run of the SORTED cell
    ids ``sc`` — ``i - index of the run's first element``, via a cummax
    over run starts. Equivalent to searchsorted(sc, sc) on the sorted
    array but log-depth on the VPU instead of a vmapped binary-search
    while_loop (which measured ~11 ms/frame at N=100k — the single
    hottest op of the whole rollout)."""
    m = sc.shape[0]
    i = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sc[1:] != sc[:-1]])
    first = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, i, 0))
    return i - first


def _grid_tables(spec: PCellSpec, slot: jax.Array, n_ok: jax.Array):
    """Assemble the PCellGrid scatter tables from the (N,) slot array —
    O(N) int32 scatters (cheap; the expensive part is the SORT that
    produced ``slot``, which the sharded build partitions)."""
    n = slot.shape[0]
    nslot = spec.cx * spec.cap * spec.cy
    agent = jnp.full((nslot + 1,), n, jnp.int32).at[
        jnp.where(slot >= 0, slot, nslot)
    ].set(jnp.arange(n, dtype=jnp.int32))[:-1]
    return PCellGrid(
        slot=slot, agent=agent,
        overflow=(n - n_ok).astype(jnp.int32),
    )


def build_pcell_grid(pos: jax.Array, spec: PCellSpec) -> PCellGrid:
    """Sort agents by cell id and assign packed sub-slots (the one
    irregular op per frame — ops/cells.py:build_cell_grid semantics)."""
    n = pos.shape[0]
    origin = jnp.min(pos, axis=0)
    cid, in_grid = _cell_ids(pos, origin, spec)
    order = jnp.argsort(cid)                         # stable -> deterministic
    sc = cid[order]
    rank = _rank_in_run(sc)
    ok = (rank < spec.cap) & in_grid[order]
    slot_sorted = jnp.where(
        ok,
        (sc // spec.cy * spec.cap + rank) * spec.cy + sc % spec.cy,
        -1,
    )
    slot = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)
    return _grid_tables(spec, slot, jnp.sum(ok))


def build_pcell_grid_sharded(
    pos: jax.Array,
    spec: PCellSpec,
    axis_name: str,
    n_dev: int,
    emulated: bool = False,
) -> PCellGrid:
    """The grid build with the SORT partitioned over the mesh.

    The replicated :func:`build_pcell_grid` runs a full-swarm argsort on
    every device — the dominant term of the multi-device replicated-work
    floor (r3 VERDICT weak #2: band efficiency 72.6% at D=4 / 51.7% at
    D=8 for N=100k with the sweep banded but the build replicated). Here
    each device sorts only its own 1/D index slice and the global packing
    is reassembled exactly:

      1. per-device stable argsort of the local slice's cell ids, local
         within-run ranks (1/D of the replicated sort work);
      2. per-cell local counts -> ``all_gather`` -> exclusive prefix over
         the device axis = this device's base offset in every cell's run.
         Global rank = local rank + base — identical to the replicated
         stable sort's rank because index slices are contiguous and
         ascending (ties break by global index either way), so the
         packing is BITWISE identical (asserted in
         tests/test_pallas_cells.py);
      3. ``all_gather`` of the local slot assignments -> full (N,) slot
         array; the O(N) int32 scatter tables are built locally.

    Interconnect per build: D·cx·cy·4 B of counts + N·4 B of slots +
    cx·cap·cy·4 B for the agent-table pmin merge (~13 MB at N=100k, D=8 —
    well under a millisecond on ICI, against the ~milliseconds of argsort
    + the 0.15 ms/step serialized agent scatter it removes from every
    device).

    Args:
      emulated: single-device band-timing mode (rollout_large
        ``force_n_dev``): the collectives would change shape on a 1-device
        axis, so device 0's program is emulated with local tiles of the
        same shapes — compute cost matches a real D-device mesh, the
        (excluded) interconnect cost does not. Results are NOT valid.
    """
    n = pos.shape[0]
    if n % n_dev:
        raise ValueError(f"sharded build needs n_dev | n ({n} % {n_dev})")
    local = n // n_dev
    d = jax.lax.axis_index(axis_name)
    ps = jax.lax.dynamic_slice(pos, (d * local, 0), (local, 2))
    o_local = jnp.min(ps, axis=0)
    origin = o_local if emulated else jax.lax.pmin(o_local, axis_name)
    cid, in_grid = _cell_ids(ps, origin, spec)
    order = jnp.argsort(cid)                         # local stable sort
    sc = cid[order]
    rank_local = _rank_in_run(sc)
    ncell = spec.cx * spec.cy
    counts = jnp.zeros((ncell,), jnp.int32).at[sc].add(1)
    if emulated:
        counts_all = jnp.tile(counts[None], (n_dev, 1))
    else:
        counts_all = jax.lax.all_gather(counts, axis_name)   # (D, ncell)
    base = (jnp.cumsum(counts_all, axis=0) - counts_all)[d]
    rank = rank_local + base[sc]
    ok = (rank < spec.cap) & in_grid[order]
    slot_sorted = jnp.where(
        ok,
        (sc // spec.cy * spec.cap + rank) * spec.cy + sc % spec.cy,
        -1,
    )
    slot_local = jnp.zeros((local,), jnp.int32).at[order].set(slot_sorted)
    n_ok_local = jnp.sum(ok)
    # the agent table (the pack's gather index) is built DISTRIBUTED too:
    # each device scatters only its own index slice's agents (N/D updates
    # — the scatter serializes per update on TPU, so this is the term
    # that made the replicated _grid_tables the largest fixed cost of the
    # D=8 band at N=32k: 0.15 ms/step, XProf fusion.217) and a pmin over
    # the mesh merges the tables exactly (each slot is claimed by at most
    # one agent globally; unclaimed slots hold the init N > any id).
    nslot = spec.cx * spec.cap * spec.cy
    gids = d * local + jnp.arange(local, dtype=jnp.int32)
    agent_local = jnp.full((nslot + 1,), n, jnp.int32).at[
        jnp.where(slot_local >= 0, slot_local, nslot)
    ].set(gids)[:-1]
    if emulated:
        slot = jnp.tile(slot_local, n_dev)
        n_ok = n_ok_local * n_dev
        # density-faithful emulation: the real pmin-merged table holds all
        # N agents, the local one only this slice's N/D. Superpose n_dev
        # LANE-ROTATED copies of the local table, each in its own rank
        # block, so per-cell occupancy is a sum of n_dev independent-ish
        # thinned draws — statistically the real merged density (a plain
        # rank-block tile concentrates cells at 0-or-n_dev·blk occupancy,
        # which mispriced the occupancy branches: most rows hit the top
        # rung and the kernels timed 2.5x the real cost). Values are
        # garbage (as documented: band results are timings, not episodes);
        # the occupancy distribution that prices the adaptive kernels and
        # the pack/unpack traffic is right.
        a3 = agent_local.reshape(spec.cx, spec.cap, spec.cy)
        blk = max(1, spec.cap // n_dev)
        parts = [jnp.roll(a3[:, :blk, :], 17 * r + 1, axis=2)
                 for r in range(-(-spec.cap // blk))]
        agent = jnp.concatenate(parts, axis=1)[:, :spec.cap, :].reshape(nslot)
    else:
        slot = jax.lax.all_gather(slot_local, axis_name, tiled=True)  # (N,)
        n_ok = jax.lax.psum(n_ok_local, axis_name)
        agent = jax.lax.pmin(agent_local, axis_name)
    return PCellGrid(
        slot=slot, agent=agent, overflow=(n - n_ok).astype(jnp.int32),
    )


def _pack(
    grid: PCellGrid, spec: PCellSpec, vals: jax.Array, row_range=None
) -> jax.Array:
    """(N, C) agent values -> (local+2, C·cap, cy_pad) kernel layout.

    One slot-major GATHER of whole (C,) rows through ``grid.agent`` (empty
    slots read a zero pad row), then one dense reshape/transpose/pad —
    both run at HBM bandwidth. The earlier scatter form cost ~5 ms per
    pack at N=100k (the scatter can't fuse with its zero-table init).

    ``row_range = (start, local)`` gathers ONLY grid rows
    ``[start-1, start+local+1)`` (the band a device's sweep reads,
    including its halo rows; rows outside the global grid come out as
    the zero pad). This is what makes the multi-chip sweep's per-device
    work actually shrink with the mesh: the pack chain (gather + layout
    transpose) measured ~14 ms/step of the 39.7 ms N=100k step — fully
    replicated per device before this, flooring band-mode scaling at
    64% efficiency on 2 devices (results/scaling_band_n100k_r3.log).
    ``None`` = the full grid (identical to the banded form with
    ``start=0, local=cx``).

    Layout note (r5): the slot-row gather's cost is ~7 ns PER SLOT ROW
    at N=1M (236 ms/step across the two packs, XProf fusions 236/219,
    results/profile_n1m_r5.log) — per-row gather overhead, NOT source
    cache misses. Three alternatives were measured and rejected so they
    are not retried:

    * per-channel 1-D gathers ((N+1,) vectors): 80x WORSE at N=500k —
      TPU gathers want the 2-D row form;
    * channel-major 2-D gather + block transpose: 2.5x worse at 100k
      plus a downstream kernel relayout (results/roofline_n100k_v2.log);
    * sorted-locality chain (permute vals to build order, gather via a
      slot->sorted-position table so each grid row reads a contiguous
      ~70 KB block): 476 vs 460 ms/step at N=1M — locality does not
      help a per-row-overhead-bound gather.

    The lever that DOES move this cost is slot count (cell geometry —
    ``make_pcell_spec edge_mult``): the occupancy-adaptive kernels make
    a large ``cap`` cheap, so wider cells with generous caps cut gather
    rows without losing exactness headroom.
    """
    n, c = vals.shape
    cx, cy, cap, cyp = spec.cx, spec.cy, spec.cap, spec.cy_pad
    start, local = (0, cx) if row_range is None else row_range
    vals1 = jnp.concatenate(
        [vals, jnp.zeros((1, c), vals.dtype)], axis=0
    )
    agent3 = grid.agent.reshape(cx, cap, cy)
    rows = start - 1 + jnp.arange(local + 2)                   # incl. halo
    in_grid = (rows >= 0) & (rows < cx)
    a = jnp.take(agent3, jnp.clip(rows, 0, cx - 1), axis=0)
    a = jnp.where(in_grid[:, None, None], a, n)                # pad row
    table = vals1[a]                                           # (local+2,cap,cy,C)
    t = table.transpose(0, 3, 1, 2).reshape(local + 2, c * cap, cy)
    return jnp.pad(t, ((0, 0), (0, 0), (1, cyp - cy - 1)))


def _unpack(
    grid: PCellGrid, spec: PCellSpec, out: jax.Array, fill: float = 0.0
) -> jax.Array:
    """(cx, Q·cap, cy_pad) kernel output -> (N, Q) per-agent values;
    dropped agents get ``fill``.

    r5 layout: one LARGE-BLOCK transpose to channel-major ``(Q, cx·cap·
    cyp)`` (contiguous ``cap x cyp`` tiles) + one batched gather at the
    padded-lane flat index — the r4 form cropped the halo lanes and
    transposed ``(q, cap, cy) -> (cap, cy, q)`` per row, a small-element
    shuffle that measured 9.2 ms at N=100k (41x off HBM; RESULTS §9)."""
    cx, cy, cap, cyp = spec.cx, spec.cy, spec.cap, spec.cy_pad
    q = out.shape[1] // cap
    t = out.reshape(cx, q, cap, cyp).transpose(1, 0, 2, 3)
    t = t.reshape(q, cx * cap * cyp)
    slot = grid.slot
    ok = slot >= 0
    s = jnp.where(ok, slot, 0)
    idx = (s // cy) * cyp + 1 + s % cy      # padded-lane flat index
    vals = jnp.take(t, idx, axis=1).T       # (N, Q)
    return jnp.where(ok[:, None], vals, fill)


def _unpack_band(
    grid: PCellGrid, spec: PCellSpec, out: jax.Array, start,
    fill: float = 0.0,
) -> jax.Array:
    """Band unpack for the sharded sweep: ``out`` holds only grid rows
    ``[start, start + local)``; agents outside the band (and dropped
    agents) get ``fill``. A ``psum`` over the mesh then completes the
    (N, Q) table — only O(N·Q) bytes cross chips, never the (much larger)
    kernel-layout slot table. Same transpose-free layout as
    :func:`_unpack`."""
    local, cy, cap, cyp = out.shape[0], spec.cy, spec.cap, spec.cy_pad
    q = out.shape[1] // cap
    t = out.reshape(local, q, cap, cyp).transpose(1, 0, 2, 3)
    t = t.reshape(q, local * cap * cyp)
    rel = grid.slot - start * cap * cy
    ok = (grid.slot >= 0) & (rel >= 0) & (rel < local * cap * cy)
    s = jnp.where(ok, rel, 0)
    idx = (s // cy) * cyp + 1 + s % cy
    vals = jnp.take(t, idx, axis=1).T
    return jnp.where(ok[:, None], vals, fill)


def _lane_shift(x: jax.Array, dy: int) -> jax.Array:
    """``out[..., l] = x[..., l + dy]`` with zero fill (static shift; the
    halo lanes carry valid = 0 so zeros are exact)."""
    if dy == 0:
        return x
    z = jnp.zeros_like(x[..., :1])
    if dy > 0:
        return jnp.concatenate([x[..., 1:], z], axis=-1)
    return jnp.concatenate([z, x[..., :-1]], axis=-1)


def _expand_a(x: jax.Array, cap: int) -> jax.Array:
    """(cap, L) source block -> (cap^2, L) pair block, a-major
    (row ``a·cap + b`` carries source sub-slot ``a``)."""
    l = x.shape[-1]
    return jnp.broadcast_to(x[:, None, :], (cap, cap, l)).reshape(cap * cap, l)


def _expand_b(x: jax.Array, cap: int) -> jax.Array:
    """(cap, L) candidate block -> (cap^2, L) pair block, b-minor."""
    l = x.shape[-1]
    return jnp.broadcast_to(x[None, :, :], (cap, cap, l)).reshape(cap * cap, l)


def _group_sum(x: jax.Array, cap: int) -> jax.Array:
    """(cap^2, L) pair block -> (cap, L) per-source sums over ``b``."""
    l = x.shape[-1]
    return jnp.sum(x.reshape(cap, cap, l), axis=1)


_OFFS = [(dx, dy) for dx in range(3) for dy in (-1, 0, 1)]


def _cap_branches(cap: int):
    """Effective-cap ladder for the occupancy-adaptive pair sweep:
    multiples of the 8-sublane tile up to ``cap`` (always ending at
    ``cap``). Each grid row's kernel program picks the smallest rung
    covering the prefetched 3-row max cell occupancy — sub-slots past a
    cell's packed count carry ``valid = 0``, so truncating the pair block
    to the rung is EXACT (identical sums, same addend order) while
    skipping the quadratic padding compute: at the canonical density the
    mean occupancy is ~1-4 of cap = 16-24 sub-slots, so most rows run the
    8-rung at (8/cap)^2 of the full pair block (RESULTS §9: the cap^2
    padding is the kernels' dominant cost)."""
    bs, c = [], 8
    while c < cap:
        bs.append(c)
        c += 8
    bs.append(cap)
    return bs


def _row_branches(rowpf_ref, i, cap: int):
    """(condition, effective_cap) pairs for the occupancy branches of grid
    row ``i`` — mutually exclusive, exhaustive over ``rowcnt > 0``."""
    cnt, occ = rowpf_ref[i, 0], rowpf_ref[i, 1]
    out, lo = [], 0
    ladder = _cap_branches(cap)
    for ce in ladder:
        cond = (cnt > 0) & (occ > lo)
        if ce != ladder[-1]:
            cond &= occ <= ce
        out.append((cond, ce))
        lo = ce
    return out


def _frame_kernel(
    rowpf_ref,                  # (cx, 2) int32 scalar prefetch:
                                #   [:, 0] agents per row (skip flag)
                                #   [:, 1] 3-row max cell occupancy
    prev_ref, cur_ref, next_ref,  # (1, 5·cap, cy_pad): x|y|vx|vy|valid
    out_ref,                    # (1, 10·cap, cy_pad):
                                #   v0..v5 | degree | gx | gy | min_r2
    *, cap: int, r2cut: float, centralized: bool,
):
    i = pl.program_id(0)

    @pl.when(rowpf_ref[i, 0] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[0, 9 * cap:, :] = jnp.full_like(out_ref[0, 9 * cap:, :], 1e12)

    def body(ce: int):
        cur = cur_ref[0]
        ch = lambda blk, q: blk[q * cap:q * cap + ce]
        sx, sy = _expand_a(ch(cur, 0), ce), _expand_a(ch(cur, 1), ce)
        svx = _expand_a(ch(cur, 2), ce)
        svy = _expand_a(ch(cur, 3), ce)
        sval = _expand_a(ch(cur, 4), ce)

        # self-pair rows of the center offset: sublane a·ce + b with a == b
        lane = sx.shape[-1]
        r = jax.lax.broadcasted_iota(jnp.int32, (ce * ce, lane), 0)
        not_self = (r // ce != r % ce)

        accs = [jnp.zeros((ce, lane), cur.dtype) for _ in range(9)]
        min_r2 = jnp.full((ce, lane), 1e12, cur.dtype)
        rows = (prev_ref, cur_ref, next_ref)
        for dx, dy in _OFFS:
            nb = _lane_shift(rows[dx][0], dy)
            nx, ny = _expand_b(ch(nb, 0), ce), _expand_b(ch(nb, 1), ce)
            nvx = _expand_b(ch(nb, 2), ce)
            nvy = _expand_b(ch(nb, 3), ce)
            ok = sval * _expand_b(ch(nb, 4), ce)
            if dx == 1 and dy == 0:
                ok = jnp.where(not_self, ok, 0.0)
            dxp, dyp = sx - nx, sy - ny
            dvx, dvy = svx - nvx, svy - nvy
            r2 = dxp * dxp + dyp * dyp
            r2s = jnp.maximum(jnp.where(ok > 0, r2, 1.0),
                              COLLISION_R2_EPS)
            inv2 = 1.0 / r2s
            inv4 = inv2 * inv2
            m = jnp.where(r2 < r2cut, ok, 0.0)
            in_range = jnp.where(r2 <= 1.0, ok, 0.0)
            gx = (-2.0 * dxp * inv4 + 2.0 * dxp * inv2)
            gy = (-2.0 * dyp * inv4 + 2.0 * dyp * inv2)
            if not centralized:
                gx, gy = gx * m, gy * m
                # decentralized expert also restricts velocity consensus
                # to radius neighbors — that term is m-summed dvx (= v0/v3)
            else:
                gx, gy = gx * in_range, gy * in_range
            parts = (dvx * m, dxp * inv4 * m, dxp * inv2 * m,
                     dvy * m, dyp * inv4 * m, dyp * inv2 * m,
                     m, gx, gy)
            for q in range(9):
                accs[q] = accs[q] + _group_sum(parts[q], ce)
            min_r2 = jnp.minimum(
                min_r2,
                jnp.min(jnp.where(ok > 0, r2, 1e12).reshape(ce, ce, lane),
                        axis=1),
            )
        pad = ((0, cap - ce), (0, 0))
        out_ref[0] = jnp.concatenate(
            [jnp.pad(a, pad) for a in accs]
            + [jnp.pad(min_r2, pad, constant_values=1e12)], axis=0)

    for cond, ce in _row_branches(rowpf_ref, i, cap):
        pl.when(cond)(functools.partial(body, ce))


def _apply_kernel(
    rowpf_ref,                  # (cx, 2) int32 (see _frame_kernel)
    prev_ref, cur_ref, next_ref,  # (1, (3 + C)·cap, cy_pad): x|y|valid|cols
    out_ref,                    # (1, C·cap, cy_pad)
    *, cap: int, c: int, r2cut: float,
):
    i = pl.program_id(0)

    @pl.when(rowpf_ref[i, 0] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(ce: int):
        cur = cur_ref[0]
        ch = lambda blk, q: blk[q * cap:q * cap + ce]
        sx, sy = _expand_a(ch(cur, 0), ce), _expand_a(ch(cur, 1), ce)
        sval = _expand_a(ch(cur, 2), ce)
        lane = sx.shape[-1]
        r = jax.lax.broadcasted_iota(jnp.int32, (ce * ce, lane), 0)
        not_self = (r // ce != r % ce)

        accs = [jnp.zeros((ce, lane), cur.dtype) for _ in range(c)]
        rows = (prev_ref, cur_ref, next_ref)
        for dx, dy in _OFFS:
            nb = _lane_shift(rows[dx][0], dy)
            nx, ny = _expand_b(ch(nb, 0), ce), _expand_b(ch(nb, 1), ce)
            ok = sval * _expand_b(ch(nb, 2), ce)
            if dx == 1 and dy == 0:
                ok = jnp.where(not_self, ok, 0.0)
            dxp, dyp = sx - nx, sy - ny
            m = jnp.where(dxp * dxp + dyp * dyp < r2cut, ok, 0.0)
            for q in range(c):
                w = _expand_b(ch(nb, 3 + q), ce)
                accs[q] = accs[q] + _group_sum(m * w, ce)
        pad = ((0, cap - ce), (0, 0))
        out_ref[0] = jnp.concatenate([jnp.pad(a, pad) for a in accs], axis=0)

    for cond, ce in _row_branches(rowpf_ref, i, cap):
        pl.when(cond)(functools.partial(body, ce))


def _apply_deg_kernel(
    rowpf_ref,                  # (cx, 2) int32 (see _frame_kernel)
    gprev_ref, gcur_ref, gnext_ref,  # (1, 5·cap, cy_pad): x|y|vx|vy|valid
                                #   (the SAME geo table the frame kernel
                                #   consumed — packed once per step)
    cprev_ref, ccur_ref, cnext_ref,  # (1, C·cap, cy_pad): cols RAW
    dprev_ref, dcur_ref, dnext_ref,  # (1, 10·cap, cy_pad): frame outputs
                                #   (halo-padded); degree at [6·cap:7·cap]
    out_ref,                    # (1, C·cap, cy_pad)
    *, cap: int, c: int, r2cut: float,
):
    """The adjacency transpose-apply reading the candidate's degree from
    the frame kernel's OUTPUT in slot layout — the second pass of the
    fused frame+apply sweep (:func:`frame_apply`). Unlike
    :func:`_apply_kernel` the columns are packed RAW (the /deg_j
    normalization needs deg of the same new graph, which only exists
    after the frame pass) and divided here via the neighbor's slot.

    Geometry and columns are SEPARATE tables (r5): the r4 variant packed
    one (5+C)-channel table that the frame kernel also consumed, so the
    frame pass streamed the C unused column channels through VMEM
    (3x-refetched: ~400 MB/step of dead traffic at N=100k, and a single
    ~580 MB allocation at N=1M that forced the fused path off above
    300k agents). Split tables keep the frame sweep at 5 channels and
    let the apply pass chunk its columns (``frame_apply`` ``max_cols``)
    without repacking geometry."""
    i = pl.program_id(0)

    @pl.when(rowpf_ref[i, 0] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(ce: int):
        cur = gcur_ref[0]
        ch = lambda blk, q: blk[q * cap:q * cap + ce]
        sx, sy = _expand_a(ch(cur, 0), ce), _expand_a(ch(cur, 1), ce)
        sval = _expand_a(ch(cur, 4), ce)
        lane = sx.shape[-1]
        r = jax.lax.broadcasted_iota(jnp.int32, (ce * ce, lane), 0)
        not_self = (r // ce != r % ce)

        accs = [jnp.zeros((ce, lane), cur.dtype) for _ in range(c)]
        grows = (gprev_ref, gcur_ref, gnext_ref)
        crows = (cprev_ref, ccur_ref, cnext_ref)
        drows = (dprev_ref, dcur_ref, dnext_ref)
        for dx, dy in _OFFS:
            nb = _lane_shift(grows[dx][0], dy)
            cb = _lane_shift(crows[dx][0], dy)
            db = _lane_shift(drows[dx][0], dy)
            nx, ny = _expand_b(ch(nb, 0), ce), _expand_b(ch(nb, 1), ce)
            ok = sval * _expand_b(ch(nb, 4), ce)
            if dx == 1 and dy == 0:
                ok = jnp.where(not_self, ok, 0.0)
            dxp, dyp = sx - nx, sy - ny
            m = jnp.where(dxp * dxp + dyp * dyp < r2cut, ok, 0.0)
            inv_deg = 1.0 / jnp.maximum(_expand_b(ch(db, 6), ce), 1.0)
            mw = m * inv_deg
            for q in range(c):
                w = _expand_b(ch(cb, q), ce)
                accs[q] = accs[q] + _group_sum(mw * w, ce)
        pad = ((0, cap - ce), (0, 0))
        out_ref[0] = jnp.concatenate([jnp.pad(a, pad) for a in accs], axis=0)

    for cond, ce in _row_branches(rowpf_ref, i, cap):
        pl.when(cond)(functools.partial(body, ce))


def _occ_prefetch(packed: jax.Array, cap: int, valid_ch: int) -> jax.Array:
    """(rows+2, C·cap, cyp) packed table -> (rows, 2) int32 scalar
    prefetch for the sweeps, derived from the packed VALID channel with
    dense reductions only:

      * ``[:, 0]`` — max packed-cell occupancy of the program's center
        row (0 => the row holds no packed agents => skip);
      * ``[:, 1]`` — the max over its 3-row sweep window, the bound that
        picks the row's occupancy branch (:func:`_cap_branches`).

    A cell's occupancy is the sublane-sum of its valid flags (packed
    ranks are dense from 0), the row bound the lane-max — regular VPU
    reductions over a table already in flight to the kernel. The earlier
    design scattered per-row counts/maxima into grid tables at build
    time; those scatter-adds measured ~0.5 ms/step REPLICATED on every
    device at N=32k (XProf fusions 251/252, profile_band8_n32k_r5b) —
    the single largest term of the multi-chip fixed-cost floor. Derived
    from the banded pack, the prefetch is also per-band for free (halo
    rows included, so a band-edge row sees its neighbors' occupancy)."""
    v = packed[:, valid_ch * cap:(valid_ch + 1) * cap, :]
    occ = jnp.sum(v, axis=1)                             # (rows+2, cyp)
    rowm = jnp.max(occ, axis=1).astype(jnp.int32)        # (rows+2,)
    rm3 = jnp.maximum(jnp.maximum(rowm[:-2], rowm[1:-1]), rowm[2:])
    return jnp.stack([rowm[1:-1], rm3], axis=1)


def _sweep(kernel, packed, out_channels, interpret, valid_ch, cap):
    """Shared pallas_call plumbing: one program per grid row; each reads
    banded rows i-1 / i / i+1 as three overlapping (1, ·, ·) blocks.

    ``packed`` is already BANDED by :func:`_pack` (``local + 2`` rows,
    the device's sweep window including halo rows) — the grid size and
    the occupancy prefetch both derive from it, so the multi-chip
    partition's per-device work shrinks 1/D with the mesh with no
    full-grid bookkeeping."""
    rows2, ch_cap, cyp = packed.shape
    grid_rows = rows2 - 2
    rowpf = _occ_prefetch(packed, cap, valid_ch)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid_rows,),
            in_specs=[
                pl.BlockSpec((1, ch_cap, cyp), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((1, ch_cap, cyp), lambda i, s: (i + 1, 0, 0)),
                pl.BlockSpec((1, ch_cap, cyp), lambda i, s: (i + 2, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, out_channels, cyp), lambda i, s: (i, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid_rows, out_channels, cyp), packed.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()   # device-derived, see above
        ),
        interpret=interpret,
    )(rowpf, packed, packed, packed)
    return out


def _sweep_deg(kernel, geo, colt, frame_pad, out_channels, interpret,
               valid_ch, cap):
    """:func:`_sweep` plumbing for the fused apply pass: three banded
    inputs (the 5-channel geometry table, the C-channel raw-column table,
    and the halo-padded frame output); occupancy prefetch derived from
    the geometry table's valid channel."""
    rows2, gch, cyp = geo.shape
    _, cch, _ = colt.shape
    _, fch, _ = frame_pad.shape
    grid_rows = rows2 - 2
    rowpf = _occ_prefetch(geo, cap, valid_ch)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid_rows,),
            in_specs=[
                pl.BlockSpec((1, gch, cyp), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((1, gch, cyp), lambda i, s: (i + 1, 0, 0)),
                pl.BlockSpec((1, gch, cyp), lambda i, s: (i + 2, 0, 0)),
                pl.BlockSpec((1, cch, cyp), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((1, cch, cyp), lambda i, s: (i + 1, 0, 0)),
                pl.BlockSpec((1, cch, cyp), lambda i, s: (i + 2, 0, 0)),
                pl.BlockSpec((1, fch, cyp), lambda i, s: (i, 0, 0)),
                pl.BlockSpec((1, fch, cyp), lambda i, s: (i + 1, 0, 0)),
                pl.BlockSpec((1, fch, cyp), lambda i, s: (i + 2, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, out_channels, cyp), lambda i, s: (i, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid_rows, out_channels, cyp), geo.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()
        ),
        interpret=interpret,
    )(rowpf, geo, geo, geo, colt, colt, colt,
      frame_pad, frame_pad, frame_pad)
    return out


def _expert_from(per: jax.Array, x: jax.Array, centralized: bool,
                 need_expert: bool) -> jax.Array:
    """Expert controller from the unpacked frame table, or zeros when the
    caller never consumes it (``need_expert=False`` — pure policy
    rollouts; skips the O(N) compensated consensus chain)."""
    if not need_expert:
        return jnp.zeros((x.shape[0], 2), x.dtype)
    gxs, gys = per[:, 7], per[:, 8]
    if centralized:
        # O(N) closed form of sum_{j != i}(v_i - v_j), compensated — a plain
        # f32 mean/sum here amplifies its reduction error by N (measured
        # 3.5e-2 relative at N=1e5 as N·v_i - Σv, 2e-2 as N·(v_i - mean);
        # ops/precision.py rationale)
        cons = centralized_consensus(x[:, 2:4])
        ux = -(cons[:, 0] + gxs)
        uy = -(cons[:, 1] + gys)
    else:
        ux = -(per[:, 0] + gxs)
        uy = -(per[:, 3] + gys)
    return jnp.clip(jnp.stack([ux, uy], -1), -10.0, 10.0)


def frame(
    x: jax.Array,
    grid: PCellGrid,
    spec: PCellSpec,
    p: FlockingParams,
    centralized: bool = True,
    interpret: Optional[bool] = None,
    row_range=None,
    axis_name: Optional[str] = None,
    need_expert: bool = True,
):
    """Frame quantities (ops/blocked.py:blocked_frame semantics) via the
    fused Pallas cell sweep; per-agent outputs.

    ``need_expert = False`` (pure policy rollouts — nothing consumes
    ``fq.expert``): skips the O(N) compensated velocity-consensus chain
    (ops/precision.py — log2(N) two-float fold levels, replicated on
    every device of a mesh) and returns ``expert = 0``.

    The centralized expert's velocity-consensus term
    ``sum_{j != i}(v_i - v_j) = N·v_i - sum_j v_j`` is O(N) and computed
    here outside the kernel (exactly as ops/cells.py:cells_frame does).

    ``row_range = (start_row, local_rows)`` + ``axis_name``: multi-chip
    mode — each device's kernel sweeps its own band of grid rows,
    band-unpacks to per-agent values, and a ``psum`` over the mesh
    completes the (N, 10) table (each agent lives in exactly one band so
    the sum is exact; only O(N·10) bytes ride the interconnect, never the
    ~cap/occupancy-times-larger kernel-layout slot table)."""
    from multiagent_gnn_policies_tpu.ops.blocked import FrameQuantities

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = x.shape[0]
    valid = jnp.ones((n, 1), x.dtype)
    packed = _pack(grid, spec, jnp.concatenate([x, valid], axis=-1),
                   row_range=row_range)
    kernel = functools.partial(
        _frame_kernel, cap=spec.cap,
        r2cut=float(p.comm_radius) ** 2, centralized=centralized,
    )
    out = _sweep(kernel, packed, 10 * spec.cap, interpret,
                 valid_ch=4, cap=spec.cap)
    if axis_name is not None:
        per = jax.lax.psum(
            _unpack_band(grid, spec, out, row_range[0]), axis_name
        )                                             # (N, 10)
        min_r2 = jnp.min(jnp.where(grid.slot >= 0, per[:, 9], 1e12))
    else:
        per = _unpack(grid, spec, out)                # (N, 10)
        min_r2 = jnp.min(_unpack(grid, spec, out, fill=1e12)[:, 9])
    expert = _expert_from(per, x, centralized, need_expert)
    return FrameQuantities(
        values=per[:, :6], degree=per[:, 6], expert=expert, min_r2=min_r2,
    )


def frame_apply(
    x: jax.Array,
    cols: jax.Array,
    grid: PCellGrid,
    spec: PCellSpec,
    p: FlockingParams,
    centralized: bool = True,
    interpret: Optional[bool] = None,
    row_range=None,
    axis_name: Optional[str] = None,
    halo_devices: int = 0,
    max_cols: Optional[int] = None,
    need_expert: bool = True,
):
    """Fused frame + adjacency transpose-apply over one shared GEOMETRY
    table.

    Computes :func:`frame`'s quantities AND ``out[i] = sum_{j in nbr(i)}
    cols[j] / deg_j`` for the SAME new graph in one invocation: the
    5-channel geometry table ``[x | valid]`` is packed ONCE and consumed
    by both the frame kernel and the apply kernel(s); the columns are
    packed as their own table(s) so the frame sweep never streams them
    (the r4 single-table variant streamed the C column channels through
    the frame pass 3x-refetched — ~400 MB/step dead traffic at N=100k,
    roofline'd in RESULTS §9). :func:`_apply_deg_kernel` reads the
    candidate degrees straight from the frame's packed output (the
    /deg_j normalization is why the apply cannot precede the frame).
    Used by the rollout to pre-compute the NEXT step's s=0 delayed apply
    at frame time (parallel/large_n.py; the columns are the delayed
    feature slots, known before the step's carry update).

    Returns ``(FrameQuantities, (N, C) applied columns)``. Banded
    multi-chip mode (``row_range``/``axis_name``) completes both with a
    single psum; the apply pass additionally needs the FRAME output of
    the two halo grid rows (a candidate in the neighbor device's edge row
    contributes ``cols_j / deg_j`` with deg_j computed over there), which
    ``halo_devices = D`` fetches with a one-row ``ppermute`` each way
    (~the row's slot size on the interconnect; devices at the grid edge
    receive ppermute's zero fill, exactly right for the empty margin
    rows). ``halo_devices = 0`` skips the exchange (single-device, or the
    force_n_dev timing emulation where collectives are excluded).

    ``max_cols``: HBM-ceiling knob — the apply runs in column chunks of
    at most this many channels, each its own pack + sweep over the SAME
    geometry/frame tables. This is what lets the fused path run at
    N = 1M (the r4 single-table fusion needed one ~580 MB pack there and
    was disabled above 300k agents — parallel/large_n.py:_use_fused).
    """
    from multiagent_gnn_policies_tpu.ops.blocked import FrameQuantities

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = x.shape[0]
    c = cols.shape[-1]
    valid = jnp.ones((n, 1), x.dtype)
    # ONE pack for geometry + columns (the pack's gather/layout cost is
    # per-slot, nearly channel-count-independent — two separate packs
    # measured ~2x one combined pack); the kernels then consume sublane
    # WINDOWS of it: the frame sweep reads only the 5 geometry channels
    # (the r4 single-table fusion streamed all 5+C channels through the
    # frame kernel), the apply sweeps read geometry + their column chunk.
    cap = spec.cap
    packed = _pack(grid, spec, jnp.concatenate([x, valid, cols], axis=-1),
                   row_range=row_range)
    geo = packed[:, :5 * cap, :]
    fkernel = functools.partial(
        _frame_kernel, cap=cap,
        r2cut=float(p.comm_radius) ** 2, centralized=centralized,
    )
    fout = _sweep(fkernel, geo, 10 * spec.cap, interpret,
                  valid_ch=4, cap=spec.cap)
    if axis_name is not None and halo_devices > 1:
        # halo exchange: my top halo row is the lower neighbor's LAST
        # swept row, my bottom halo the upper neighbor's FIRST
        down = [(d, d + 1) for d in range(halo_devices - 1)]
        up = [(d + 1, d) for d in range(halo_devices - 1)]
        top = jax.lax.ppermute(fout[-1:], axis_name, down)
        bot = jax.lax.ppermute(fout[:1], axis_name, up)
        fpad = jnp.concatenate([top, fout, bot], axis=0)
    else:
        # zeros each side: the apply pass reads neighbor degrees at rows
        # i-1 / i+1 (zero deg -> max(deg,1) guard, m == 0 for pad rows)
        fpad = jnp.pad(fout, ((1, 1), (0, 0), (0, 0)))
    step_c = c if max_cols is None else min(max_cols, c)
    aouts = []
    for c0 in range(0, c, step_c):
        cc = min(step_c, c - c0)
        colt = packed[:, (5 + c0) * cap:(5 + c0 + cc) * cap, :]
        akernel = functools.partial(
            _apply_deg_kernel, cap=cap, c=cc,
            r2cut=float(p.comm_radius) ** 2,
        )
        aouts.append(_sweep_deg(
            akernel, geo, colt, fpad, cc * cap, interpret,
            valid_ch=4, cap=cap,
        ))
    both = jnp.concatenate([fout] + aouts, axis=1)  # (rows, (10+C)·cap, cyp)
    if axis_name is not None:
        per = jax.lax.psum(
            _unpack_band(grid, spec, both, row_range[0]), axis_name
        )                                          # (N, 10 + C)
        min_r2 = jnp.min(jnp.where(grid.slot >= 0, per[:, 9], 1e12))
    else:
        per = _unpack(grid, spec, both)
        min_r2 = jnp.min(_unpack(grid, spec, both, fill=1e12)[:, 9])
    expert = _expert_from(per, x, centralized, need_expert)
    fq = FrameQuantities(
        values=per[:, :6], degree=per[:, 6], expert=expert, min_r2=min_r2,
    )
    return fq, per[:, 10:]


def apply_adjT(
    pos_src: jax.Array,
    deg_src: jax.Array,
    cols: jax.Array,
    spec: PCellSpec,
    p: FlockingParams,
    grid: Optional[PCellGrid] = None,
    interpret: Optional[bool] = None,
    row_range=None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """``out[i] = sum_{j in nbr(i)} cols[j] / deg_j`` over the radius graph
    of ``pos_src`` (ops/cells.py:cells_apply_adjT semantics — the graph is
    symmetric so the transpose-apply is a neighbor sum of pre-scaled
    columns). ``row_range`` / ``axis_name``: multi-chip grid-row partition
    (:func:`frame` semantics)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if grid is None:
        grid = build_pcell_grid(pos_src, spec)
    c = cols.shape[-1]
    wcols = cols / jnp.maximum(deg_src, 1.0)[:, None]
    valid = jnp.ones((pos_src.shape[0], 1), pos_src.dtype)
    packed = _pack(
        grid, spec, jnp.concatenate([pos_src, valid, wcols], axis=-1),
        row_range=row_range,
    )
    kernel = functools.partial(
        _apply_kernel, cap=spec.cap, c=c, r2cut=float(p.comm_radius) ** 2
    )
    out = _sweep(kernel, packed, c * spec.cap, interpret,
                 valid_ch=2, cap=spec.cap)
    if axis_name is not None:
        return jax.lax.psum(
            _unpack_band(grid, spec, out, row_range[0]), axis_name
        )
    return _unpack(grid, spec, out)


def ystack(
    carry,
    grid_now: PCellGrid,
    x_now: jax.Array,
    deg_now: jax.Array,
    spec: PCellSpec,
    p: FlockingParams,
    grid_hist: Optional[tuple] = None,
    row_range=None,
    axis_name: Optional[str] = None,
    max_cols: Optional[int] = None,
) -> jax.Array:
    """The aggregated delayed stack ``y_k = G_k(t)^T x_{t-k}`` (K, N, F) —
    ops/blocked.py:delayed_ystack with every adjacency transpose-apply on
    the Pallas cell sweep. Newest graph applied first (the reference's
    left-multiplied GSO recursion, state_with_delay.py:44-47).

    Args:
      grid_hist: (k-2)-tuple of the historical graphs' ``PCellGrid``s,
        newest first (the rollout carries them — a packing is a pure
        function of positions, so carrying kills the per-step re-sort);
        rebuilt from ``carry.pos_hist`` when ``None``.
      max_cols: HBM ceiling knob — split each transpose-apply into column
        chunks of at most this many channels. The s=0 apply at K=3 packs
        (3 + (K-1)·F) = 15 channels, ~1 GB of slot table at N=1M; chunking
        trades one extra sweep of the same grid for halving the largest
        live buffer (what lets the 1M-agent policy rollout fit a single
        chip). ``None`` = one sweep per delay slot (fastest; default).
    """
    k = carry.history.shape[0]
    n, f = carry.history.shape[1:]
    y = [carry.history[0]]
    if k == 1:
        return jnp.stack(y)
    v = carry.history[1:]
    for s in range(k - 1):
        if s == 0:
            pos_s, deg_s, grid_s = x_now[:, :2], deg_now, grid_now
        else:
            pos_s, deg_s = carry.pos_hist[s - 1], carry.deg_hist[s - 1]
            grid_s = grid_hist[s - 1] if grid_hist is not None else None
        if grid_s is None:
            grid_s = build_pcell_grid(pos_s, spec)
        cols = jnp.transpose(v[s:], (1, 0, 2)).reshape(n, (k - 1 - s) * f)
        c_tot = cols.shape[-1]
        step_c = c_tot if max_cols is None else min(max_cols, c_tot)
        outs = []
        for c0 in range(0, c_tot, step_c):
            outs.append(apply_adjT(
                pos_s, deg_s, cols[:, c0:c0 + step_c], spec, p, grid=grid_s,
                row_range=row_range, axis_name=axis_name,
            ))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        v = v.at[s:].set(
            jnp.transpose(out.reshape(n, k - 1 - s, f), (1, 0, 2))
        )
        y.append(v[s])
    return jnp.stack(y)


def ystack_pre(
    carry,
    s0_out: jax.Array,
    spec: PCellSpec,
    p: FlockingParams,
    grid_hist: Optional[tuple] = None,
    row_range=None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """:func:`ystack` with the s=0 (current-graph) transpose-apply already
    done — ``s0_out`` is :func:`frame_apply`'s applied columns from the
    previous step's fused frame pass (same column layout ystack's s=0
    produces: ``transpose(v).reshape(n, (k-1)·F)``). Only the historical
    graphs' applies (s >= 1) remain."""
    k = carry.history.shape[0]
    n, f = carry.history.shape[1:]
    y = [carry.history[0]]
    if k == 1:
        return jnp.stack(y)
    v = jnp.transpose(s0_out.reshape(n, k - 1, f), (1, 0, 2))
    y.append(v[0])
    for s in range(1, k - 1):
        pos_s, deg_s = carry.pos_hist[s - 1], carry.deg_hist[s - 1]
        grid_s = grid_hist[s - 1] if grid_hist is not None else None
        if grid_s is None:
            grid_s = build_pcell_grid(pos_s, spec)
        cols = jnp.transpose(v[s:], (1, 0, 2)).reshape(n, (k - 1 - s) * f)
        out = apply_adjT(
            pos_s, deg_s, cols, spec, p, grid=grid_s,
            row_range=row_range, axis_name=axis_name,
        )
        v = v.at[s:].set(
            jnp.transpose(out.reshape(n, k - 1 - s, f), (1, 0, 2))
        )
        y.append(v[s])
    return jnp.stack(y)
