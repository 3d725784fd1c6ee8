"""Large-N rollouts: single chip or agent-sharded over a device mesh.

The reference's transfer experiments (test_model_transfer.py) evaluate a
policy trained at small N on bigger swarms, but its dense (K, N, N) state
caps N at a few hundred. Here the blocked pass (ops/blocked.py) plus an
``agents``-axis mesh take the same evaluation to N = 10,000+:

* every O(N^2) sweep (observation features, expert controller, adjacency
  transpose-applies) is row-partitioned: each device sweeps only its own
  agent slice;
* the O(N) state (positions/velocities (N, 4), feature history (K, N, F))
  is replicated — at N=10k that is < 1 MB, so completing the partial
  column sums with a ``psum`` and regathering per-row results with an
  ``all_gather`` costs ~1 MB/step over ICI, negligible against the O(N^2)
  compute each device saves;
* cheap O(N) math (dynamics integration, reward, actor MLP) is computed
  redundantly on every device instead of paying a collective to shard it.

This is the SURVEY §5 "CP/ring analogue" design point resolved for this
model family: features are tiny (F=6), so full-gather beats halo-exchange
bookkeeping; the communication-avoiding structure lives in the row
partitioning of the N^2 sweeps.

The rollout semantics (delayed stack, expert, reward, episode boundary)
match the dense path exactly — tests/test_blocked.py asserts equality —
so a checkpoint trained with the dense N=100 pipeline evaluates unchanged
at N=10k (zero-shot transfer, CoRL 2020 §results / reference README.md:22-28).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
from multiagent_gnn_policies_tpu.models.actor import ActorConfig, actor_forward
from multiagent_gnn_policies_tpu.ops.blocked import (
    DelayCarry,
    blocked_frame,
    delay_carry_init,
    delay_carry_update,
    delayed_ystack,
)


def traj_subset_indices(n_agents: int, traj_agents: int) -> jax.Array:
    """Evenly spaced agent indices spanning [0, n_agents) for trajectory
    dumps. Rounded linspace rather than an integer-division stride: at
    e.g. N=3000 with 2000 recorded agents a floor stride of 1 would record
    only the innermost 2000 agents of the radially-ordered lattice init —
    this always covers the whole disc (r4 ADVICE item 2)."""
    return jnp.linspace(0, n_agents - 1, traj_agents).round().astype(jnp.int32)


def pick_block(rows: int, preferred: int = 128) -> int:
    """Largest divisor of ``rows`` that is <= ``preferred``."""
    for b in range(min(preferred, rows), 0, -1):
        if rows % b == 0:
            return b
    return 1


def _dynamics(x: jax.Array, action: jax.Array, p: FlockingParams,
              key: jax.Array, global_start=0) -> jax.Array:
    """Double-integrator step (envs/flocking.py:step semantics, without the
    dense observe) on the full state OR an agent slice of it.

    ``global_start``: global index of ``x``'s first agent (traced OK) —
    the index-sliced mesh path (:func:`_shard_actor_dynamics`) passes its
    slice offset so the leader mask and the noise stream stay EXACT: the
    leader mask tests global indices, and the noise is always drawn for
    the full (n_agents, 2) swarm from ``key`` and then sliced, so every
    device consumes the same stream the single-device program does (the
    O(N) replicated RNG is microseconds; r4 VERDICT weak #4 — the
    leader/noise variants previously fell back to fully replicated
    actor/dynamics on meshes)."""
    u = jnp.clip(action, -p.max_accel, p.max_accel) * p.gain
    local = x.shape[0]
    if p.n_leaders > 0:
        gidx = global_start + jnp.arange(local)
        is_leader = (gidx < p.n_leaders)[:, None]
        u = jnp.where(is_leader, 0.0, u)
    pos = x[:, 0:2] + x[:, 2:4] * p.dt + 0.5 * u * p.dt * p.dt
    vel = x[:, 2:4] + u * p.dt
    if p.drag > 0.0:
        vel = vel * (1.0 - p.drag * p.dt)
    if p.dynamics_noise > 0.0:
        noise = jax.random.normal(key, (p.n_agents, 2), vel.dtype)
        noise = jax.lax.dynamic_slice(noise, (global_start, 0), (local, 2))
        vel = vel + p.dynamics_noise * noise
    return jnp.concatenate([pos, vel], axis=-1)


def _reward(x: jax.Array) -> jax.Array:
    v = x[:, 2:4]
    return -jnp.sum(jnp.var(v, axis=0))


class LargeNConfig(NamedTuple):
    """Static setup for a large-N rollout.

    ``path`` selects the graph-pass implementation:
      * ``"blocked"`` — O(N^2) row-blocked XLA sweeps (ops/blocked.py);
      * ``"binned"``  — O(N·cap) spatial-hash gathers (ops/binned.py;
        exact oracle, slow on TPU);
      * ``"cells"``   — O(N) regular-layout cell grid (ops/cells.py);
      * ``"pcells"``  — O(N) fused Pallas cell sweep at exact tile shapes
        (ops/pallas_cells.py; the fastest large-N path on TPU).
    """

    params: FlockingParams
    block: int
    rows: int            # rows swept per device
    axis: Optional[str]  # mesh axis name, None = single device
    path: str = "blocked"
    cap: int = 32        # per-cell capacity (binned path)
    cell_spec: Optional[tuple] = None  # ops/cells.py:CellSpec (cells path)
    n_dev: int = 1       # mesh axis size (grid-row partition, cell paths)
    emulated: bool = False  # force_n_dev band-timing mode (collectives are
                            # shape-emulated locally; results NOT valid)
    need_expert: bool = True  # False = pure policy rollout: skip the O(N)
                              # expert/consensus tail (nothing consumes it)


def _use_fused(cfg: LargeNConfig, acfg, expert_mode: bool) -> bool:
    """Fused frame+s0-apply applies on the pcells policy path with
    K >= 2 at EVERY N since r5: the split-table frame_apply packs
    geometry and columns separately and chunks the apply columns
    (``_fused_max_cols``), so the HBM ceiling that disabled fusion above
    300k agents in r4 (one ~580 MB combined pack at N=1M) is gone."""
    return (cfg.path == "pcells" and not expert_mode
            and acfg is not None and acfg.k >= 2)


def _fused_max_cols(cfg: LargeNConfig) -> Optional[int]:
    """Apply-pass column chunking for the fused sweep. With the r5 shared
    pack the apply chunks are sublane WINDOWS of one packed table, so
    chunking no longer bounds the step's peak buffer (the full
    (5+C)-channel pack exists either way — ~580 MB at N=1M, which fits
    the 16 GB HBM comfortably now that it is the only large live buffer);
    a single apply pass avoids re-streaming the geometry window per
    chunk. The unfused y-stack path keeps its own ``max_cols`` for the
    expert-mode/large-K shapes (ops/pallas_cells.py:ystack)."""
    return None


def _s0_cols(carry) -> jax.Array:
    """The next step's s=0 apply columns: delayed feature slots
    [x_t, ..., x_{t-K+2}] flattened in ystack's column layout."""
    k_1, n, f = carry.history.shape[0] - 1, *carry.history.shape[1:]
    return jnp.transpose(carry.history[:k_1], (1, 0, 2)).reshape(n, k_1 * f)


def _shard_actor_dynamics(cfg: LargeNConfig, acfg, params, y, x,
                          step_key):
    """Policy forward + double-integrator step with the AGENT axis
    index-sliced across the mesh: each device computes only its 1/D slice
    and an ``all_gather`` reassembles the (N, 4) state (1.6 MB at N=100k —
    nothing on ICI, against the O(N) per-device elementwise work it
    removes; part of the replicated-work floor after the sweeps and the
    grid build are banded). The leader/noise env variants are exact here
    too: ``_dynamics`` takes the slice's global offset, so the leader
    mask tests global indices and the noise stream is the full-swarm
    draw sliced per device (identical to the single-device stream). In
    the force_n_dev timing emulation the gather is a local tile
    (collectives excluded, as documented)."""
    p = cfg.params
    n = p.n_agents
    local = n // cfg.n_dev
    d = jax.lax.axis_index(cfg.axis)
    y_d = jax.lax.dynamic_slice(
        y, (0, d * local, 0), (y.shape[0], local, y.shape[2])
    )
    act_d = actor_forward(params, acfg, y_d, None)
    x_d = jax.lax.dynamic_slice(x, (d * local, 0), (local, 4))
    x2_d = _dynamics(x_d, act_d, p, step_key, global_start=d * local)
    if cfg.emulated:
        return jnp.tile(x2_d, (cfg.n_dev, 1))
    return jax.lax.all_gather(x2_d, cfg.axis, tiled=True)


def _use_sharded_actor(cfg: LargeNConfig) -> bool:
    # leader/noise variants included since r5: _dynamics slices the
    # full-swarm noise stream and masks by global index, so the sharded
    # step is bitwise the single-device step for every env variant
    return (cfg.axis is not None and cfg.n_dev > 1
            and cfg.params.n_agents % cfg.n_dev == 0)


def _row_range(cfg: LargeNConfig):
    if cfg.axis is None:
        return None
    d = jax.lax.axis_index(cfg.axis)
    return (d * cfg.rows, cfg.rows)


def _cell_row_range(cfg: LargeNConfig):
    """Grid-row band of this device for the cell paths: the N^2 agent-row
    partition does not apply — the sweep is per grid row, so the mesh
    partitions GRID rows (ops/cells.py:cells_frame ``row_range``)."""
    if cfg.axis is None:
        return None, None
    local = cfg.cell_spec.cx // cfg.n_dev
    d = jax.lax.axis_index(cfg.axis)
    return (d * local, local), cfg.axis


def _frame(cfg: LargeNConfig, x, centralized, apply_cols=None):
    """Frame quantities for the full swarm (regathered if sharded).

    Returns ``(fq, aux)`` — ``aux`` is the sparse path's neighbor
    structure (NeighborList or CellGrid; consumed by the y-stack and the
    overflow accounting), or a dummy scalar on the dense paths (so the
    scan carry keeps a fixed pytree).

    ``apply_cols`` (pcells only): also run the fused adjacency
    transpose-apply of these (N, C) columns over the SAME new graph in
    the same sweep invocation (ops/pallas_cells.py:frame_apply — one
    shared pack instead of two), returning ``(fq, aux, applied)``. The
    rollout uses it to pre-compute the next step's s=0 delayed apply at
    frame time.
    """
    from multiagent_gnn_policies_tpu.ops.blocked import FrameQuantities

    rr = _row_range(cfg)
    if cfg.path == "pcells":
        from multiagent_gnn_policies_tpu.ops.pallas_cells import (
            build_pcell_grid,
            build_pcell_grid_sharded,
            frame as pcells_frame,
        )

        crr, ax = _cell_row_range(cfg)
        if ax is not None and x.shape[0] % cfg.n_dev == 0:
            # shard the build's argsort over the mesh (the dominant term
            # of the replicated-work floor — build_pcell_grid_sharded)
            nl = build_pcell_grid_sharded(
                x[:, :2], cfg.cell_spec, ax, cfg.n_dev,
                emulated=cfg.emulated,
            )
        else:
            nl = build_pcell_grid(x[:, :2], cfg.cell_spec)
        if apply_cols is not None:
            from multiagent_gnn_policies_tpu.ops.pallas_cells import (
                frame_apply,
            )

            fq, s0 = frame_apply(x, apply_cols, nl, cfg.cell_spec,
                                 cfg.params, centralized,
                                 row_range=crr, axis_name=ax,
                                 halo_devices=0 if cfg.emulated
                                 else cfg.n_dev,
                                 max_cols=_fused_max_cols(cfg),
                                 need_expert=cfg.need_expert)
            return fq, nl, s0
        fq = pcells_frame(x, nl, cfg.cell_spec, cfg.params, centralized,
                          row_range=crr, axis_name=ax,
                          need_expert=cfg.need_expert)
    elif cfg.path == "cells":
        from multiagent_gnn_policies_tpu.ops.cells import (
            build_cell_grid,
            cells_frame,
        )

        crr, ax = _cell_row_range(cfg)
        nl = build_cell_grid(x[:, :2], cfg.cell_spec)
        fq = cells_frame(x, nl, cfg.cell_spec, cfg.params, centralized,
                         row_range=crr, axis_name=ax)
    elif cfg.path == "binned":
        from multiagent_gnn_policies_tpu.ops.binned import (
            binned_frame,
            build_neighbor_list,
        )

        # the table is built replicated (O(N log N) sort + O(N·cap));
        # each device then gathers only its destination-row slice
        nl = build_neighbor_list(x[:, :2], cfg.params.comm_radius, cfg.cap)
        fq = binned_frame(x, nl, cfg.params, centralized, row_range=rr)
    else:
        fq = blocked_frame(x, cfg.params, centralized, cfg.block, row_range=rr)
    if cfg.path == "blocked":
        nl = jnp.zeros((), jnp.int32)  # fixed-pytree dummy for the scan carry
    if cfg.axis is None or cfg.path in ("cells", "pcells"):  # full rows
        return fq, nl
    gather = lambda a: jax.lax.all_gather(a, cfg.axis, tiled=True)
    return fq._replace(
        values=gather(fq.values),
        degree=gather(fq.degree),
        expert=gather(fq.expert),
        min_r2=jax.lax.pmin(fq.min_r2, cfg.axis),
    ), nl


def _ystack(cfg: LargeNConfig, carry: DelayCarry, x_now, deg_now, nl,
            grid_hist=None):
    if cfg.path == "pcells":
        from multiagent_gnn_policies_tpu.ops.pallas_cells import (
            ystack as pcells_ystack,
        )

        crr, ax = _cell_row_range(cfg)
        # HBM ceiling: above ~300k agents the (3 + (K-1)*F)-channel apply
        # pack is the peak live buffer (~1 GB/step at N=1M) — chunk the
        # columns so the 1M-agent policy rollout fits one chip
        # (ops/pallas_cells.py:ystack max_cols rationale)
        max_cols = 6 if cfg.params.n_agents > 300_000 else None
        return pcells_ystack(
            carry, nl, x_now, deg_now, cfg.cell_spec, cfg.params,
            grid_hist=grid_hist, row_range=crr, axis_name=ax,
            max_cols=max_cols,
        )
    if cfg.path == "cells":
        from multiagent_gnn_policies_tpu.ops.cells import cells_ystack

        crr, ax = _cell_row_range(cfg)
        return cells_ystack(
            carry, nl, x_now, deg_now, cfg.cell_spec, cfg.params,
            row_range=crr, axis_name=ax,
        )
    if cfg.path == "binned":
        from multiagent_gnn_policies_tpu.ops.binned import binned_ystack

        return binned_ystack(
            carry, nl, cfg.params, cfg.cap,
            row_range=_row_range(cfg), axis_name=cfg.axis,
        )
    return delayed_ystack(
        carry, x_now[:, :2], cfg.params, cfg.block,
        row_range=_row_range(cfg),
        axis_name=cfg.axis,
        deg_now=deg_now,
    )


def _reset(cfg: LargeNConfig, key: jax.Array, centralized: bool = False):
    """Rejection-sampled initial state (envs/flocking.py:reset semantics),
    acceptance computed with blocked sweeps. In the lattice regime (always
    at these N) the candidate is valid by construction and the loop is
    skipped — this removes max_resets full graph passes per episode
    (measured 7.2 s of an 8.6 s N=100k episode) AND the while_loop from
    the compiled program."""
    from multiagent_gnn_policies_tpu.envs.flocking import (
        _init_candidate,
        _lattice_regime,
    )

    p = cfg.params

    if _lattice_regime(p):
        key, sub = jax.random.split(key)
        x = _init_candidate(sub, p)
        fq, nl = _frame(cfg, x, centralized=centralized)
        return x, fq, nl

    def ok(x):
        # degree/min_r2 (the acceptance quantities) are identical in both
        # expert modes; ``centralized`` only changes fq.expert, which the
        # first rollout step consumes — so it must match the episode's
        # expert or step 0 uses the wrong controller (dense-path parity).
        fq, nl = _frame(cfg, x, centralized=centralized)
        return (
            (fq.min_r2 >= p.min_separation**2)
            & (jnp.min(fq.degree) >= p.min_degree)
        ), fq, nl

    def cond(state):
        i, _, accepted, _, _, _ = state
        return (~accepted) & (i < p.max_resets)

    def body(state):
        i, key, _, _, _, _ = state
        key, sub = jax.random.split(key)
        x = _init_candidate(sub, p)
        accepted, fq, nl = ok(x)
        return i + 1, key, accepted, x, fq, nl

    key, sub = jax.random.split(key)
    x0 = _init_candidate(sub, p)
    acc0, fq0, nl0 = ok(x0)
    _, key, _, x, fq, nl = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), key, acc0, x0, fq0, nl0)
    )
    return x, fq, nl


def _episode_init(cfg: LargeNConfig, acfg: Optional[ActorConfig],
                  key: jax.Array, expert_mode: bool, centralized: bool):
    """Reset + initial episode-state pytree (the lax.scan carry)."""
    p = cfg.params
    reset_key, _ = jax.random.split(key)
    x, fq, nl = _reset(cfg, reset_key, centralized=centralized)
    k = acfg.k if acfg else 1
    carry = delay_carry_init(fq.values, p.n_agents, k)
    sparse = cfg.path in ("binned", "cells", "pcells")
    ovf = nl.overflow if sparse else jnp.zeros((), jnp.int32)
    # pcells carries the K-2 historical graphs' packings (a packing is a
    # pure function of positions, so seeding with the reset frame's is
    # exact: the matching history slots are zero until step >= k anyway)
    n_gh = k - 2 if (cfg.path == "pcells" and not expert_mode) else 0
    gh = tuple(nl for _ in range(n_gh))
    if _use_fused(cfg, acfg, expert_mode):
        # episode-start s=0 pre-apply: history slots 1.. are zeros, so the
        # applied columns are exactly zero (dense-path episode-boundary
        # semantics, ops/graph.py)
        s0 = jnp.zeros((p.n_agents, (k - 1) * carry.history.shape[-1]))
    else:
        s0 = jnp.zeros(())          # fixed-pytree dummy
    return (x, carry, fq, nl, gh, s0, ovf)


def _scan_steps(cfg: LargeNConfig, acfg: Optional[ActorConfig], params,
                state, step_keys, expert_mode: bool, centralized: bool,
                traj_agents: int = 0):
    """``lax.scan`` of len(step_keys) env steps from ``state``; returns
    ``(state', per-step outputs)``. The chunked 1M-agent episode runs this
    as several jit calls with the state crossing the host boundary."""
    p = cfg.params
    sparse = cfg.path in ("binned", "cells", "pcells")
    n_gh = len(state[4])
    fused = _use_fused(cfg, acfg, expert_mode)

    def body(state, step_key):
        x, carry, fq, nl, gh, s0, ovf = state
        if not expert_mode:
            if fused:
                from multiagent_gnn_policies_tpu.ops.pallas_cells import (
                    ystack_pre,
                )

                crr, ax = _cell_row_range(cfg)
                y = ystack_pre(carry, s0, cfg.cell_spec, p,
                               grid_hist=gh or None,
                               row_range=crr, axis_name=ax)
            else:
                y = _ystack(cfg, carry, x, fq.degree, nl,
                            grid_hist=gh or None)
        pos_prev = x[:, :2]
        if expert_mode:
            x2 = _dynamics(x, fq.expert, p, step_key)
        elif _use_sharded_actor(cfg):
            x2 = _shard_actor_dynamics(cfg, acfg, params, y, x, step_key)
        else:
            x2 = _dynamics(x, actor_forward(params, acfg, y, None), p,
                           step_key)
        if fused:
            # pre-apply the NEXT step's s=0 columns in the same fused
            # sweep that computes the new frame (one shared pack)
            fq2, nl2, s02 = _frame(cfg, x2, centralized,
                                   apply_cols=_s0_cols(carry))
        else:
            fq2, nl2 = _frame(cfg, x2, centralized)
            s02 = s0
        if sparse:
            ovf = jnp.maximum(ovf, nl2.overflow)
        carry2 = delay_carry_update(
            carry, fq2.values, pos_prev,
            deg_prev=fq.degree if carry.deg_hist.shape[0] else None,
        )
        gh2 = (nl,) + gh[:-1] if n_gh else gh
        out = _reward(x2)
        if traj_agents:
            out = (out, x2[traj_subset_indices(p.n_agents, traj_agents)])
        return (x2, carry2, fq2, nl2, gh2, s02, ovf), out

    return jax.lax.scan(body, state, step_keys)


def _rollout_body(cfg: LargeNConfig, acfg: Optional[ActorConfig], params,
                  key: jax.Array, T: int, expert_mode: bool,
                  centralized: bool, traj_agents: int = 0):
    """The fused rollout: reset + lax.scan of T steps. Runs identically
    single-device or inside shard_map (collectives gated on cfg.axis).

    Returns ``(rewards (T,), final_x, overflow)`` — overflow is the max
    per-step neighbor-table overflow count of the sparse path (always 0 on
    the dense paths; SURVEY §7 "no silent truncation"). With
    ``traj_agents = M > 0`` a fourth output records an evenly spaced
    M-agent subset's states per step ((T, M, 4) — the visualization dump;
    :func:`traj_subset_indices` spans the lattice init's radial ordering,
    so the subset covers the whole disc)."""
    _, noise_key = jax.random.split(key)
    state = _episode_init(cfg, acfg, key, expert_mode, centralized)
    state, out = _scan_steps(
        cfg, acfg, params, state, jax.random.split(noise_key, T),
        expert_mode, centralized, traj_agents,
    )
    x, ovf = state[0], state[6]
    if traj_agents:
        rewards, traj = out
        return rewards, x, ovf, traj
    return out, x, ovf


def rollout_large(
    params,
    acfg: Optional[ActorConfig],
    key: jax.Array,
    p: FlockingParams,
    mesh: Optional[Mesh] = None,
    axis: str = "agents",
    block: Optional[int] = None,
    expert_mode: bool = False,
    centralized_expert: bool = True,
    sparse: Optional[bool] = None,
    cap: Optional[int] = None,
    path: Optional[str] = None,
    cell_margin: float = 1.3,
    cell_edge_mult: float = 1.0,
    return_overflow: bool = False,
    force_n_dev: Optional[int] = None,
    traj_agents: int = 0,
    scan_chunks: int = 1,
    n_episodes: int = 1,
) -> Tuple[jax.Array, ...]:
    """One greedy episode at scale. Returns ``(rewards (T,), final_x)``
    (plus the sparse paths' max neighbor-structure overflow count when
    ``return_overflow`` — 0 means every step's structure was exact).

    Args:
      params/acfg: actor (``ind_agg`` must be 0 — all imitation policies);
        ignored when ``expert_mode``.
      mesh: optional mesh with an ``axis`` dimension to shard the graph
        sweeps; ``None`` = single device. The blocked/binned paths
        partition AGENT rows; the cells/pcells paths partition GRID rows
        (equal bands of the cell grid per device; each band's per-slot
        outputs are unpacked to per-agent values locally and a ``psum``
        over the mesh completes the (N, C) tables — O(N·C) bytes on the
        interconnect per sweep, never the slot table).
      expert_mode: roll the analytic controller instead of the policy
        (the large-N expert baseline).
      path: graph-pass implementation — "blocked" / "binned" / "cells" /
        "pcells" (see LargeNConfig). Default: "blocked" below N=32768 —
        XLA's fused N^2 sweeps measured 3.61 ms/step at N=10k on v5e,
        beating every sparse structure there — and "pcells" at
        N >= 32768, where the O(N) fused Pallas sweep wins (11.0 ms at
        N=32k, 39.7 ms at N=100k vs cells 47.7 and blocked 203;
        results/bench_large_n_r3.log). The O(N^2) Pallas VMEM path
        ("pallas") was retired after the round-3 shootout measured it
        dominated at every N (5.25 ms at 10k vs blocked 3.61; 42.8 ms at
        32k vs pcells 11.0) — see git history for ops/pallas_kernels.py.
      sparse: legacy boolean alias for ``path="binned"`` — the exactness
        oracle: correct everywhere, near-scalar gather speed on TPU
        (144 ms/step vs 14 ms blocked at N=10k) — prefer "cells" for
        performance. "binned" with a centralized expert requires
        ``comm_radius >= 1`` (the unit-range potential must fit in its
        3x3 cell neighborhood; "cells" sizes its cells as
        max(comm_radius, 1) so it has no such restriction).
      cap: per-cell capacity (default 32 binned / 12 cells).
      cell_margin: cells-path grid extent as a multiple of the swarm's
        initial extent (overflow certifies sufficiency per step).
      cell_edge_mult: pcells cell edge as a multiple of the minimum legal
        edge (ops/pallas_cells.py:make_pcell_spec — the sweep stays exact
        for any value >= 1; 2.0 quarters slot count and kernel area at
        the canonical density, with the overflow gate still certifying
        capacity per step).
      n_episodes: roll this many episodes inside ONE jitted program (a
        ``lax.scan`` over episode keys derived from ``key``) — returns the
        concatenated (E·T,) rewards, the LAST episode's final state, and
        the max overflow over episodes. Benchmarks use it to amortize the
        per-dispatch host latency (the axon tunnel costs ~25 ms per call —
        at sub-ms step times a single-episode dispatch is half RTT);
        incompatible with ``traj_agents``/``scan_chunks``.
      force_n_dev: MEASUREMENT KNOB — partition the sweeps as if the mesh
        had this many devices while running on the given (smaller) mesh.
        On a 1-device mesh each step then executes exactly device 0's
        program of a ``force_n_dev``-chip mesh (band sweep + band unpack +
        identity collective), which is how per-device scaling is measured
        on a single real chip (scripts/bench_scaling.py). Rewards and
        trajectories are NOT valid unless ``force_n_dev == mesh size``.
    """
    if acfg is not None and acfg.ind_agg != 0:
        raise ValueError("large-N path requires ind_agg == 0 actors")
    n = p.n_agents
    if mesh is not None and axis not in mesh.axis_names:
        mesh = None   # no agents axis to band over (e.g. an env-only
                      # data-parallel mesh) — run the single-device program
    n_dev = mesh.shape[axis] if mesh is not None else 1
    if force_n_dev is not None:
        if mesh is None:
            raise ValueError("force_n_dev needs a mesh (1-device is fine)")
        n_dev = force_n_dev
    if path is None:
        if sparse:
            path = "binned"
        elif sparse is None and n >= 32768:
            # the fused O(N) Pallas cell sweep wins at large N on single
            # chips AND meshes (grid-row bands per device, psum regather)
            path = "pcells"
        else:
            path = "blocked"
    if path == "binned" and centralized_expert and p.comm_radius < 1.0:
        raise ValueError(
            "binned path needs comm_radius >= 1.0 for the centralized "
            "expert's unit-range potential (use the cells or blocked path)"
        )
    if n % n_dev and path not in ("cells", "pcells"):
        # agent-row partition needs equal slices; the cell paths partition
        # grid rows instead, so any N works on any mesh
        raise ValueError(f"n_agents={n} not divisible by mesh axis {n_dev}")
    rows = n // n_dev
    blk = block or pick_block(rows)
    cell_spec = None
    if path == "cells":
        from multiagent_gnn_policies_tpu.ops.cells import make_cell_spec

        cell_spec = make_cell_spec(p, cap=cap or 12, margin=cell_margin,
                                   n_dev=n_dev)
    elif path == "pcells":
        from multiagent_gnn_policies_tpu.ops.pallas_cells import make_pcell_spec

        cell_spec = make_pcell_spec(p, cap=cap or 16, margin=cell_margin,
                                    n_dev=n_dev, edge_mult=cell_edge_mult)
    cfg = LargeNConfig(
        params=p, block=blk, rows=rows,
        axis=axis if mesh is not None else None,
        path=path, cap=cap or 32, cell_spec=cell_spec, n_dev=n_dev,
        emulated=(force_n_dev is not None
                  and force_n_dev != mesh.shape[axis]),
        # greedy policy rollouts never read fq.expert — skip the O(N)
        # replicated consensus/expert tail (the trainers build their own
        # cfg with the default need_expert=True for DAGGER labels)
        need_expert=(expert_mode or path != "pcells"),
    )
    if scan_chunks > 1:
        # Chunked episode: C jitted scans with the episode state crossing
        # the host boundary between them. Bitwise-identical to the single
        # scan (same reset key, same per-step key stream — asserted in
        # tests/test_large_n_lattice.py); what it buys is a bounded
        # program: the N=1M single-scan episode crashes the TPU worker at
        # T=200 from peak-HBM pressure, while T=50 chunks run (r3 VERDICT
        # weak #5). Costs C-1 extra dispatches (~0.1 s total).
        init_fn, chunk_fn = _jitted_chunked(
            cfg, acfg, expert_mode, centralized_expert, mesh, traj_agents
        )
        T = p.episode_steps
        state = init_fn(key)
        noise_key = jax.random.split(key)[1]
        step_keys = jax.random.split(noise_key, T)
        outs = []
        clen = -(-T // scan_chunks)
        for c0 in range(0, T, clen):
            state, o = chunk_fn(params, state, step_keys[c0:c0 + clen])
            outs.append(o)
        cat = lambda xs: jnp.concatenate([jnp.atleast_1d(x) for x in xs])
        if traj_agents:
            rewards = cat([o[0] for o in outs])
            traj = jnp.concatenate([o[1] for o in outs])
        else:
            rewards = cat(outs)
        x, ovf = state[0], state[6]
        out = (rewards, x, ovf) + ((traj,) if traj_agents else ())
    elif n_episodes > 1:
        if traj_agents:
            raise ValueError("n_episodes > 1 is timing-oriented; trajectory "
                             "dumps need per-episode calls")
        out = _jitted_chain(
            cfg, acfg, p.episode_steps, expert_mode, centralized_expert,
            mesh, n_episodes,
        )(params, key)
    else:
        out = _jitted_rollout(
            cfg, acfg, p.episode_steps, expert_mode, centralized_expert,
            mesh, traj_agents,
        )(params, key)
    if traj_agents:
        return out if return_overflow else (out[0], out[1], out[3])
    return out if return_overflow else out[:2]


@lru_cache(maxsize=64)
def _jitted_chunked(cfg, acfg, expert_mode, centralized, mesh, traj_agents):
    """Jitted (init, chunk) pair for the chunked episode (lru-cached per
    static setup, like _jitted_rollout)."""
    init = partial(_episode_init, cfg, acfg,
                   expert_mode=expert_mode, centralized=centralized)
    chunk = partial(_scan_steps, cfg, acfg,
                    expert_mode=expert_mode, centralized=centralized,
                    traj_agents=traj_agents)
    if mesh is None:
        return jax.jit(init), jax.jit(chunk)
    sh_init = jax.shard_map(init, mesh=mesh, in_specs=(P(),),
                            out_specs=P(), check_vma=False)
    sh_chunk = jax.shard_map(chunk, mesh=mesh, in_specs=(P(), P(), P()),
                             out_specs=P(), check_vma=False)
    return jax.jit(sh_init), jax.jit(sh_chunk)


@lru_cache(maxsize=64)
def _jitted_chain(cfg, acfg, T, expert_mode, centralized, mesh, n_episodes):
    """Jitted E-episode chain (rollout_large ``n_episodes``): one scan of
    full episodes per dispatch, so steady-state step timing is not half
    host-RTT at small per-device step times (scripts/bench_scaling.py)."""
    def run(params, key):
        def ep(_, k):
            r, x, ovf = _rollout_body(cfg, acfg, params, k, T=T,
                                      expert_mode=expert_mode,
                                      centralized=centralized)
            return None, (r, x, ovf)
        _, (rs, xs, ovfs) = jax.lax.scan(
            ep, None, jax.random.split(key, n_episodes))
        return rs.reshape(-1), xs[-1], jnp.max(ovfs)

    if mesh is None:
        return jax.jit(run)
    sharded = jax.shard_map(
        run, mesh=mesh, in_specs=(P(), P()), out_specs=(P(),) * 3,
        check_vma=False,
    )
    return jax.jit(sharded)


@lru_cache(maxsize=64)
def _jitted_rollout(cfg, acfg, T, expert_mode, centralized, mesh,
                    traj_agents=0):
    """Cache the jitted episode per static setup — re-wrapping ``jax.jit``
    every call would pay full Python retracing per episode (measured ~10 s
    at N=10k on the cells path; XLA's compile cache does not cover
    tracing)."""
    run = partial(
        _rollout_body, cfg, acfg,
        T=T, expert_mode=expert_mode, centralized=centralized,
        traj_agents=traj_agents,
    )
    if mesh is None:
        return jax.jit(run)
    n_out = 4 if traj_agents else 3
    sharded = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(), P()), out_specs=(P(),) * n_out,
        check_vma=False,
    )
    return jax.jit(sharded)
