"""Pallas TPU kernels for the blocked graph pass.

The XLA blocked path (ops/blocked.py) materializes each (block, N)
adjacency slab to feed the aggregation matmul. Up to N ~ 10k the slab
(125 x 10k x 4B = 5 MB) fits in VMEM and XLA's fusion is near
speed-of-light — measured 458 steps/s at N=10k on v5e, ~6x faster than
these kernels (tile-grid overhead dominates at that size). Beyond
N ~ 32k the slab exceeds VMEM and the XLA path drowns in HBM spills:
at N=100k it cannot finish one 20-step episode in 9 minutes. These
kernels rebuild the adjacency **inside VMEM from positions**
(8 bytes/agent) per (TI, TJ) tile and feed the MXU directly, so HBM
traffic stays O(N·C) regardless of N — measured 3.1 env steps/s at
N=100,000 (10^11 pairwise interactions/s) on one v5e chip. The
large-N rollout (parallel/large_n.py) picks the path by swarm size.

Kernel: ``radius_adjT_matmul`` — the hot op of the delayed-aggregation
GNN at scale (the "SpMM" of BASELINE.json, expressed as a masked dense
tile matmul, which IS the speed-of-light formulation on the MXU for
radius graphs at the swarm densities involved):

    out[j, :] = sum_i 1[ ||p_i - p_j|| < R, i != j ] * cols[i, :]

Degree normalization is folded into ``cols`` by the caller (degrees are
full-row reductions; the rollout carries them — see ops/blocked.py).

Tiling: grid (J_tiles, I_tiles), I innermost; each step computes a
(TI, TJ) adjacency tile on the VPU from (TI, 1) / (1, TJ) coordinate
slabs and accumulates ``adj^T @ cols_tile`` into the (TJ, C) output block
resident in VMEM. Global agent ids (for the i == j self-mask under row
sharding) come from a scalar-prefetch row offset.

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _adjT_matmul_kernel(
    start_ref,            # (1,) int32 scalar prefetch: global row offset
    xi_ref, yi_ref,       # (TI, 1) row-agent coordinates
    xj_ref, yj_ref,       # (1, TJ) column-agent coordinates
    cols_ref,             # (TI, C) pre-scaled feature columns
    out_ref,              # (TJ, C) accumulated output block
    *, r2: float, ti: int, tj: int,
):
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dx = xi_ref[:] - xj_ref[:]                      # (TI, TJ) via broadcast
    dy = yi_ref[:] - yj_ref[:]
    d2 = dx * dx + dy * dy

    row_g = start_ref[0] + i * ti + jax.lax.broadcasted_iota(
        jnp.int32, (ti, tj), 0
    )
    col_g = j * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    adj = jnp.where((d2 < r2) & (row_g != col_g), 1.0, 0.0).astype(
        cols_ref.dtype
    )
    out_ref[:] += jnp.dot(
        adj.T, cols_ref[:], preferred_element_type=out_ref.dtype
    )


def radius_adjT_matmul(
    pos_rows: jax.Array,
    pos_all: jax.Array,
    cols: jax.Array,
    comm_radius: float,
    row_offset: jax.Array,
    *,
    block_i: int = 256,
    block_j: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``out[j] = sum_i adj[i, j] * cols[i]`` with adj built in VMEM.

    Args:
      pos_rows: (rows, 2) positions of the source agents swept by this
        device (a slice of the global positions under row sharding).
      pos_all: (N, 2) positions of all agents (the output axis).
      cols: (rows, C) feature columns, already scaled by 1/deg of their
        source row.
      comm_radius: radius-graph threshold.
      row_offset: () int32 — global index of ``pos_rows[0]`` (self-mask).

    Returns:
      (N, C) partial aggregation over the swept source rows (psum across
      devices to complete when sharded).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rows, n = pos_rows.shape[0], pos_all.shape[0]
    c = cols.shape[1]
    rows_p, n_p = _ceil_to(rows, block_i), _ceil_to(n, block_j)
    FAR = jnp.asarray(1e12, pos_rows.dtype)

    # Pad: far-away sources contribute adj = 0; padded columns are sliced
    # off the output. Column coordinates padded with a DIFFERENT far value
    # so padded-row/padded-col pairs stay out of radius too.
    xi = jnp.full((rows_p, 1), FAR, pos_rows.dtype).at[:rows, 0].set(pos_rows[:, 0])
    yi = jnp.full((rows_p, 1), FAR, pos_rows.dtype).at[:rows, 0].set(pos_rows[:, 1])
    xj = jnp.full((1, n_p), -FAR, pos_all.dtype).at[0, :n].set(pos_all[:, 0])
    yj = jnp.full((1, n_p), -FAR, pos_all.dtype).at[0, :n].set(pos_all[:, 1])
    cols_p = jnp.zeros((rows_p, c), cols.dtype).at[:rows].set(cols)

    grid = (n_p // block_j, rows_p // block_i)
    kernel = functools.partial(
        _adjT_matmul_kernel,
        r2=float(comm_radius) ** 2, ti=block_i, tj=block_j,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_i, 1), lambda j, i, s: (i, 0)),
                pl.BlockSpec((block_i, 1), lambda j, i, s: (i, 0)),
                pl.BlockSpec((1, block_j), lambda j, i, s: (0, j)),
                pl.BlockSpec((1, block_j), lambda j, i, s: (0, j)),
                pl.BlockSpec((block_i, c), lambda j, i, s: (i, 0)),
            ],
            out_specs=pl.BlockSpec((block_j, c), lambda j, i, s: (j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_p, c), cols.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_p * n_p * (c + 4),
            bytes_accessed=(rows_p + n_p) * 8 + rows_p * c * 4 + n_p * c * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(row_offset, jnp.int32).reshape(1), xi, yi, xj, yj, cols_p)
    return out[:n]


def _frame_kernel(
    start_ref,            # (1,) int32: global row offset
    xi_ref, yi_ref, vxi_ref, vyi_ref,   # (TI, 1) row agent state
    xj_ref, yj_ref, vxj_ref, vyj_ref,   # (1, TJ) column agent state
    out_ref,              # (TI, 16): 6 feat | 2 expert | degree | min_r2 | pad
    *, r2: float, ti: int, tj: int, centralized: bool,
):
    """Observation features + expert + degree row-sums for one tile pair
    (ops/blocked.py:blocked_frame semantics). Column 9 carries the row-min
    squared pairwise distance (reset acceptance) — a min- rather than
    sum-accumulated lane."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:, 9] = jnp.full((ti,), 1e12, out_ref.dtype)

    dx = xi_ref[:] - xj_ref[:]
    dy = yi_ref[:] - yj_ref[:]
    dvx = vxi_ref[:] - vxj_ref[:]
    dvy = vyi_ref[:] - vyj_ref[:]
    d2 = dx * dx + dy * dy
    row_g = start_ref[0] + i * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    col_g = j * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    nonself = row_g != col_g
    adj = jnp.where((d2 < r2) & nonself, 1.0, 0.0).astype(out_ref.dtype)

    d2s = jnp.where(nonself & (d2 > 0), d2, 1.0)
    inv2 = 1.0 / d2s
    inv4 = inv2 * inv2

    in_range = jnp.where((d2 <= 1.0) & nonself, 1.0, 0.0).astype(out_ref.dtype)
    gx = (-2.0 * dx * inv4 + 2.0 * dx * inv2) * in_range
    gy = (-2.0 * dy * inv4 + 2.0 * dy * inv2) * in_range
    if centralized:
        vmask = jnp.where(nonself, 1.0, 0.0).astype(out_ref.dtype)
        ex = -(jnp.sum(dvx * vmask, 1) + jnp.sum(gx, 1))
        ey = -(jnp.sum(dvy * vmask, 1) + jnp.sum(gy, 1))
    else:
        ex = -(jnp.sum(dvx * adj, 1) + jnp.sum(gx * adj, 1))
        ey = -(jnp.sum(dvy * adj, 1) + jnp.sum(gy * adj, 1))

    tile = jnp.stack(
        [
            jnp.sum(dvx * adj, 1),
            jnp.sum(dx * inv4 * adj, 1),
            jnp.sum(dx * inv2 * adj, 1),
            jnp.sum(dvy * adj, 1),
            jnp.sum(dy * inv4 * adj, 1),
            jnp.sum(dy * inv2 * adj, 1),
            ex,
            ey,
            jnp.sum(adj, 1),
        ],
        axis=-1,
    )                                                  # (TI, 9)
    pad = jnp.zeros((ti, out_ref.shape[1] - 9), out_ref.dtype)
    out_ref[:] += jnp.concatenate([tile, pad], axis=-1)
    row_min = jnp.min(jnp.where(nonself, d2, 1e12), axis=1)
    out_ref[:, 9] = jnp.minimum(out_ref[:, 9], row_min)


def frame_rowsums(
    x_rows: jax.Array,
    x_all: jax.Array,
    comm_radius: float,
    row_offset: jax.Array,
    centralized: bool = True,
    *,
    block_i: int = 256,
    block_j: int = 256,
    interpret: Optional[bool] = None,
):
    """Fused (values, expert, degree) row-sums for ``x_rows`` against the
    full swarm — the Pallas version of ops/blocked.py:blocked_frame.

    Expert clipping ([-10, 10], envs/flocking.py:expert_action) is applied
    by the caller after summation (it is a post-reduction op).

    Returns:
      (rows, 10) array: columns 0-5 = observation features, 6-7 = unclipped
      expert accelerations, 8 = degree, 9 = row-min squared pairwise
      distance (reset acceptance).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rows, n = x_rows.shape[0], x_all.shape[0]
    rows_p, n_p = _ceil_to(rows, block_i), _ceil_to(n, block_j)
    FAR = jnp.asarray(1e12, x_rows.dtype)

    def col_i(v, fill):
        return jnp.full((rows_p, 1), fill, x_rows.dtype).at[:rows, 0].set(v)

    def row_j(v, fill):
        return jnp.full((1, n_p), fill, x_all.dtype).at[0, :n].set(v)

    xi, yi = col_i(x_rows[:, 0], FAR), col_i(x_rows[:, 1], FAR)
    vxi, vyi = col_i(x_rows[:, 2], 0), col_i(x_rows[:, 3], 0)
    xj, yj = row_j(x_all[:, 0], -FAR), row_j(x_all[:, 1], -FAR)
    vxj, vyj = row_j(x_all[:, 2], 0), row_j(x_all[:, 3], 0)

    grid = (rows_p // block_i, n_p // block_j)
    kernel = functools.partial(
        _frame_kernel,
        r2=float(comm_radius) ** 2, ti=block_i, tj=block_j,
        centralized=centralized,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((block_i, 1), lambda i, j, s: (i, 0))] * 4
            + [pl.BlockSpec((1, block_j), lambda i, j, s: (0, j))] * 4,
            out_specs=pl.BlockSpec((block_i, 16), lambda i, j, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((rows_p, 16), x_rows.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=40 * rows_p * n_p,
            bytes_accessed=(rows_p + n_p) * 16 + rows_p * 16 * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(row_offset, jnp.int32).reshape(1),
        xi, yi, vxi, vyi, xj, yj, vxj, vyj,
    )
    out = out[:rows, :10]
    if centralized:
        # remove the padded columns' contribution to the all-pairs velocity
        # consensus term: each of the (n_p - n) padded j added dv = v_i - 0.
        n_pad = n_p - n
        if n_pad:
            corr_x = n_pad * x_rows[:, 2]
            corr_y = n_pad * x_rows[:, 3]
            out = out.at[:, 6].add(corr_x).at[:, 7].add(corr_y)
    return out
