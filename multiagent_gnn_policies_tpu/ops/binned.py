"""Sparse neighbor path for large swarms: spatial-hash binning + gathers.

The blocked path (ops/blocked.py) makes the dense O(N^2) sweeps memory-
bounded, but still PAYS N^2 work. Flocking swarms have **constant density**
(the arena area scales with N — envs/flocking.py:_sample_positions, mirroring
gym_flock), so the radius graph has O(1) average degree and the N^2 sweep is
~99.9% wasted at N = 10k. This module computes the same frame quantities and
adjacency applications in O(N · cap) via spatial hashing:

1. **Bin**: each agent's cell is ``(floor(px/r), floor(py/r))`` with cell
   size ``r = comm_radius`` (so all radius-neighbors live in the 3x3 cell
   neighborhood); cells are hashed into a 2^20 key space (no arena bounds,
   no grid arrays — the swarm can drift anywhere).
2. **Sort**: agents are sorted by cell key; each cell is a contiguous run.
3. **Scan**: per agent, the 9 neighboring cells' runs are located with
   ``searchsorted`` and up to ``cap`` agents gathered from each — a fixed
   (N, 9*cap) candidate table. Hash-colliding duplicate buckets among the 9
   are masked (no double counting); candidates beyond the true radius are
   masked by the exact distance check.

**Exactness contract** (property-tested vs the dense adjacency in
tests/test_binned.py): if no cell run exceeds ``cap`` — i.e.
``NeighborList.overflow == 0`` — the neighbor list contains EVERY radius
neighbor exactly once, so frame quantities and adjacency applications are
exact, not approximate. ``overflow`` counts agents hidden by a full cell;
it is returned, surfaced per-rollout, and never silently dropped (SURVEY §7
"no silent truncation").

Cell occupancy is bounded by packing: agents at the reference's equilibrium
spacing (~1 unit, the potential minimum — envs/flocking.py:expert_action)
put ~1-2 agents per r=1 cell; the default cap of 32 covers dense random
initializations with large margin at constant density.

This is the SURVEY §5 "sparse edge-list GSO" design point: the fixed-cap
candidate table IS the edge list (destination-major, gather-friendly — the
TPU-native layout, since VMEM gathers beat scatter/segment-sum), and the
K-hop delayed filter applies it with masked gather-sums instead of SpMM.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

from multiagent_gnn_policies_tpu.envs.flocking import COLLISION_R2_EPS, FlockingParams
from multiagent_gnn_policies_tpu.ops.precision import centralized_consensus

HASH_BITS = 20
HASH_SIZE = 1 << HASH_BITS
# classic 2-D spatial-hash primes (Teschner et al.); int32 wrap is fine.
# NumPy (not jnp) constants: this module is imported lazily from inside
# jitted code, and jnp arrays created during an active trace would leak
# tracers into module globals.
_P1 = _np.int32(73856093)
_P2 = _np.int32(19349663)

# 3x3 cell neighborhood offsets
_OFFS = _np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                  _np.int32)                                   # (9, 2)


class NeighborList(NamedTuple):
    """Fixed-capacity radius-neighbor table (the sparse edge list).

    Attributes:
      idx:  (N, 9*cap) int32 candidate indices (arbitrary where masked).
      mask: (N, 9*cap) float 1.0 for true radius-neighbors (r2 < comm_r^2,
            self excluded), 0.0 elsewhere. Each true neighbor appears
            exactly once when ``overflow == 0``.
      r2:   (N, 9*cap) squared distances (inf where masked) — lets callers
            apply tighter radii (the expert's unit truncation) for free.
      deg:  (N,) float radius degree (= mask.sum(-1)).
      overflow: () int32 — number of agents invisible to neighbors because
            their cell run exceeded ``cap``. 0 ⇒ the table is exact.
    """

    idx: jax.Array
    mask: jax.Array
    r2: jax.Array
    deg: jax.Array
    overflow: jax.Array


def _cell_keys(pos: jax.Array, cell: float) -> jax.Array:
    """Hashed cell key per agent, and the integer cell coords."""
    ij = jnp.floor(pos / cell).astype(jnp.int32)                # (N, 2)
    return _hash_ij(ij), ij


def _hash_ij(ij: jax.Array) -> jax.Array:
    h = (ij[..., 0] * _P1) ^ (ij[..., 1] * _P2)
    return (h & (HASH_SIZE - 1)).astype(jnp.int32)


def build_neighbor_list(
    pos: jax.Array,
    comm_radius: float,
    cap: int = 32,
) -> NeighborList:
    """Exact (when ``overflow == 0``) radius-neighbor table in O(N log N).

    Args:
      pos: (N, 2) agent positions.
      comm_radius: graph radius; also the binning cell size, so the 3x3
        neighborhood provably covers every radius neighbor.
      cap: max agents gathered per cell run. Must be a static int.
    """
    n = pos.shape[0]
    keys, ij = _cell_keys(pos, comm_radius)
    order = jnp.argsort(keys)                                   # (N,)
    sorted_keys = keys[order]

    # the 9 neighbor-cell hashes per agent, with hash-duplicate masking
    # (two different offsets may collide into one bucket; scan it once)
    nbr_h = _hash_ij(ij[:, None, :] + _OFFS[None, :, :])        # (N, 9)
    dup = (nbr_h[:, :, None] == nbr_h[:, None, :])              # (N, 9, 9)
    first = jnp.argmax(dup, axis=-1)                            # first equal
    keep = first == jnp.arange(9)[None, :]                      # (N, 9)

    start = jnp.searchsorted(sorted_keys, nbr_h.reshape(-1)).reshape(n, 9)
    end = jnp.searchsorted(
        sorted_keys, nbr_h.reshape(-1), side="right"
    ).reshape(n, 9)

    slot = jnp.arange(cap, dtype=jnp.int32)
    gather_pos = start[:, :, None] + slot[None, None, :]        # (N, 9, cap)
    valid = (slot[None, None, :] < (end - start)[:, :, None]) & keep[:, :, None]
    cand = order[jnp.clip(gather_pos, 0, n - 1)]                # (N, 9, cap)

    cand = cand.reshape(n, 9 * cap)
    valid = valid.reshape(n, 9 * cap)
    d = pos[:, None, :] - pos[cand]                             # (N, 9c, 2)
    r2 = d[..., 0] ** 2 + d[..., 1] ** 2
    self_or_invalid = (~valid) | (cand == jnp.arange(n)[:, None])
    r2 = jnp.where(self_or_invalid, jnp.inf, r2)
    mask = (r2 < comm_radius * comm_radius).astype(pos.dtype)

    # overflow: agents whose rank within their own cell run is >= cap are
    # never gathered by anyone — count them (exactness certificate)
    own_start = jnp.searchsorted(sorted_keys, keys)             # (N,)
    rank = jnp.arange(n) - own_start[order]   # rank of agent order[i]
    overflow = jnp.sum((rank >= cap).astype(jnp.int32))

    return NeighborList(
        idx=cand, mask=mask, r2=r2,
        deg=jnp.sum(mask, axis=-1), overflow=overflow,
    )


def _slice_rows(a: jax.Array, row_range) -> jax.Array:
    """Slice ``[start, start+length)`` rows (multi-chip agent slice)."""
    if row_range is None:
        return a
    start, length = row_range
    return jax.lax.dynamic_slice_in_dim(a, start, length, axis=0)


def binned_frame(
    x: jax.Array,
    nl: NeighborList,
    p: FlockingParams,
    centralized: bool = True,
    row_range=None,
):
    """Frame quantities from the neighbor table — same outputs as
    ops/blocked.py:blocked_frame (observation row-sums, degrees, expert,
    min pairwise r2), in O(N · cap).

    The centralized expert's velocity-consensus term sums over ALL agents
    (envs/flocking.py:expert_action); that is a rank-1 global reduction
    ``sum_j dv = N·v_i − Σ_j v_j`` — O(N), no pairwise sweep needed. Its
    potential term truncates at unit range, which the neighbor table covers
    whenever ``comm_radius >= 1`` (asserted by the caller,
    parallel/large_n.py:rollout_large).

    Args:
      row_range: ``(start, length)`` to emit only those destination rows
        (the multi-chip path hands each device its agent slice; ``x`` and
        ``nl`` stay full/replicated — outputs are destination-major, so row
        slices compose with an ``all_gather``, no ``psum`` needed).
    """
    from multiagent_gnn_policies_tpu.ops.blocked import FrameQuantities

    n = x.shape[0]
    idx = _slice_rows(nl.idx, row_range)                        # (R, 9c)
    m = _slice_rows(nl.mask, row_range)
    r2 = _slice_rows(nl.r2, row_range)
    xi = _slice_rows(x, row_range)                              # (R, 4)
    xj = x[idx]                                                 # (R, 9c, 4)
    dx = xi[:, None, 0] - xj[..., 0]
    dy = xi[:, None, 1] - xj[..., 1]
    dvx = xi[:, None, 2] - xj[..., 2]
    dvy = xi[:, None, 3] - xj[..., 3]
    r2s = jnp.maximum(jnp.where(jnp.isinf(r2), 1.0, r2), COLLISION_R2_EPS)
    inv_r2 = 1.0 / r2s
    inv_r4 = inv_r2 * inv_r2
    values = jnp.stack(
        [
            jnp.sum(dvx * m, axis=1),
            jnp.sum(dx * inv_r4 * m, axis=1),
            jnp.sum(dx * inv_r2 * m, axis=1),
            jnp.sum(dvy * m, axis=1),
            jnp.sum(dy * inv_r4 * m, axis=1),
            jnp.sum(dy * inv_r2 * m, axis=1),
        ],
        axis=-1,
    )

    in_range = (r2 <= 1.0).astype(x.dtype)
    gx = (-2.0 * dx * inv_r4 + 2.0 * dx * inv_r2) * in_range
    gy = (-2.0 * dy * inv_r4 + 2.0 * dy * inv_r2) * in_range
    if centralized:
        # compensated O(N) consensus closed form (ops/precision.py — a
        # plain f32 sum amplifies its reduction error by N)
        cons = _slice_rows(centralized_consensus(x[:, 2:4]), row_range)
        ux = -(cons[:, 0] + jnp.sum(gx, axis=1))
        uy = -(cons[:, 1] + jnp.sum(gy, axis=1))
    else:
        ux = -(jnp.sum(dvx * m, axis=1) + jnp.sum(gx * m, axis=1))
        uy = -(jnp.sum(dvy * m, axis=1) + jnp.sum(gy * m, axis=1))
    expert = jnp.clip(jnp.stack([ux, uy], -1), -10.0, 10.0)

    return FrameQuantities(
        values=values,
        degree=jnp.sum(m, axis=-1),
        expert=expert,
        min_r2=jnp.min(r2),
        # min over table = global min pairwise r2 whenever the true min is
        # below comm_radius (always the case for the reset acceptance
        # threshold min_separation < comm_radius)
    )


def apply_adjT(
    idx: jax.Array,
    mask: jax.Array,
    deg: jax.Array,
    cols: jax.Array,
    row_range=None,
) -> jax.Array:
    """``out[i] = sum_{j in nbr(i)} cols[j] / deg_j`` — the row-normalized
    adjacency transpose-apply (ops/graph.py:aggregate semantics; the radius
    graph is symmetric, so ``adj^T[i, j] = adj[i, j]`` and destination-major
    gathers replace the blocked SpMM). The source-degree normalization
    matches ops/blocked.py:blocked_apply_adjT exactly.

    Args:
      idx/mask/deg: a neighbor table (possibly a rebuilt historical one);
        ``deg`` must cover ALL N source agents even under ``row_range``.
      cols: (N, C) feature columns of the matching time step (replicated).
      row_range: ``(start, length)`` destination-row slice; the result is
        those rows only (``all_gather`` to complete — destination-major).
    """
    idx = _slice_rows(idx, row_range)
    mask = _slice_rows(mask, row_range)
    w = mask / jnp.maximum(deg, 1.0)[idx]                       # (R, 9c)
    return jnp.einsum("ne,nec->nc", w, cols[idx])


def binned_apply_adjT(
    nl: NeighborList,
    cols: jax.Array,
    deg: Optional[jax.Array] = None,
    row_range=None,
) -> jax.Array:
    """:func:`apply_adjT` addressed by a :class:`NeighborList`."""
    return apply_adjT(
        nl.idx, nl.mask, nl.deg if deg is None else deg, cols, row_range
    )


def binned_ystack(
    carry,
    nl_now: NeighborList,
    p: FlockingParams,
    cap: int = 32,
    row_range=None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """The aggregated delayed stack ``y_k = G_k(t)^T x_{t-k}`` (K, N, F) —
    exactly ops/blocked.py:delayed_ystack, with every adjacency
    transpose-apply routed through neighbor tables (O(N·cap) instead of
    O(N^2)). Historical graphs are rebuilt from the carry's stored
    positions (ops/blocked.py:DelayCarry.pos_hist) — an O(N log N) sort
    each, far cheaper than storing (K-2, N, 9·cap) tables in the carry.

    Newest graph applied first (the reference's left-multiplied GSO
    recursion, state_with_delay.py:44-47): ``A_t^T`` to every delayed slot,
    then ``A_{t-1}^T`` to slots >= 2, etc. Episode-start zero positions
    collapse all agents into one cell (a trivially overflowing table), but
    those graphs only ever multiply all-zero feature slots — overflow
    accounting therefore counts only CURRENT frames (each historical graph
    was counted when it was current; parallel/large_n.py surfaces the max).

    Args:
      carry: ops/blocked.py:DelayCarry (history + pos_hist; deg_hist is
        unused — rebuilt tables carry their own degrees, bit-identical to
        the stored ones since both come from the same positions).
      nl_now: the CURRENT frame's neighbor table (graph ``A_t``).
      row_range / axis_name: multi-chip mode — each device gathers its
        destination-row slice and the full columns are restored with a
        tiled ``all_gather`` over ``axis_name``.
    """
    k = carry.history.shape[0]
    n, f = carry.history.shape[1:]
    y = [carry.history[0]]
    if k == 1:
        return jnp.stack(y)
    v = carry.history[1:]                              # slots 1..K-1
    for s in range(k - 1):
        nl_s = nl_now if s == 0 else build_neighbor_list(
            carry.pos_hist[s - 1], p.comm_radius, cap
        )
        cols = jnp.transpose(v[s:], (1, 0, 2)).reshape(n, (k - 1 - s) * f)
        out = binned_apply_adjT(nl_s, cols, row_range=row_range)
        if axis_name is not None:
            out = jax.lax.all_gather(out, axis_name, tiled=True)
        v = v.at[s:].set(jnp.transpose(out.reshape(n, k - 1 - s, f), (1, 0, 2)))
        y.append(v[s])
    return jnp.stack(y)
