"""Blocked, memory-bounded graph pass for large swarms (N = 10k+).

The dense path (ops/graph.py + envs/flocking.py) materializes (N, N) and
(N, N, 6) intermediates and carries a (K, N, N) delayed GSO whose recursion
costs O(K N^3) — the reference's representation (state_with_delay.py:38-53),
fine at N=100, impossible at N=10,000. This module computes the SAME
quantities with peak memory O(B·N) and FLOPs O(K N^2 F) riding the MXU:

* **Blocked frame pass** (:func:`blocked_frame`): one ``lax.scan`` over
  row blocks of agents computes the 6-feature observation row-sums, the
  radius-graph degrees, and the expert-controller terms without ever
  materializing an N x N array (envs/flocking.py:observe / expert_action
  semantics, which in turn pin gym_flock's — SURVEY §2.9).

* **Blocked adjacency transpose-apply** (:func:`blocked_apply_adjT`):
  ``out[j] = sum_i adj[i,j]/deg_i · cols[i]`` — the exact contraction the
  actor's aggregation performs (ops/graph.py:aggregate over the
  row-normalized adjacency), one (B, N)^T x (B, C) MXU matmul per block.

* **Delayed K-hop stack in feature space** (:func:`delayed_ystack`): the
  actor only ever consumes ``aggregate(delay_gso, delay_state)``
  (learner/actor.py:70 — each (N, N) GSO is immediately contracted into
  features), so the (K, N, N) stack never needs to exist. The reference's
  recursion ``G_k(t) = A_t · G_{k-1}(t-1)`` (state_with_delay.py:44-47)
  gives ``y_k(t) = G_k(t)^T x_{t-k} = A_{t-k+1}^T ... A_{t-1}^T A_t^T
  x_{t-k}`` — newest graph applied FIRST. That exact order is reproduced
  from a (K-2)-frame position history: apply ``A_t^T`` to all delayed
  feature slots, then ``A_{t-1}^T`` to slots >= 2, etc. — K-1 blocked
  passes per step, each over the adjacency rebuilt from stored positions
  (positions are (N, 2); adjacencies are never stored).

Used by parallel/large_n.py for single-chip and agent-sharded multi-chip
large-N rollouts (the reference's transfer-at-scale experiments,
test_model_transfer.py, at N two orders of magnitude beyond its dense-N^2
ceiling). ``row_range`` hands each device its own agent slice; partial
column accumulations complete with a ``psum`` over the mesh.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multiagent_gnn_policies_tpu.envs.flocking import COLLISION_R2_EPS, FlockingParams


class FrameQuantities(NamedTuple):
    """Per-agent quantities of the current frame (row-sharded under
    ``row_range``).

    Attributes:
      values:  (rows, 6) observation feature row-sums.
      degree:  (rows,) radius-graph degree (excluding self).
      expert:  (rows, 2) analytic flocking-controller accelerations.
      min_r2:  () minimum squared pairwise distance over the swept rows
               (reset acceptance; min-reduce across devices if sharded).
    """

    values: jax.Array
    degree: jax.Array
    expert: jax.Array
    min_r2: jax.Array


def _pair_blocks(xi: jax.Array, x: jax.Array, p: FlockingParams, rows: jax.Array):
    """Shared geometry for a (B, 4) row block vs the full (N, 4) state."""
    n = x.shape[0]
    dx = xi[:, None, 0] - x[None, :, 0]
    dy = xi[:, None, 1] - x[None, :, 1]
    r2 = dx * dx + dy * dy
    self_mask = rows[:, None] == jnp.arange(n)[None, :]
    r2 = jnp.where(self_mask, jnp.inf, r2)
    adj = (r2 < p.comm_radius * p.comm_radius).astype(x.dtype)
    return dx, dy, r2, adj, self_mask


def blocked_frame(
    x: jax.Array,
    p: FlockingParams,
    centralized: bool = True,
    block: int = 128,
    row_range: Optional[Tuple[jax.Array, int]] = None,
) -> FrameQuantities:
    """Observation features + degrees + expert for the current positions.

    Args:
      x: (N, 4) full physical state ``[px, py, vx, vy]`` (replicated).
      row_range: ``(start, length)`` to sweep only those rows (the
        multi-chip path hands each device its agent slice); ``length``
        must be a static int divisible by ``block``.
    """
    n = x.shape[0]
    start, length = (jnp.zeros((), jnp.int32), n) if row_range is None else row_range
    if length % block:
        raise ValueError(f"row count {length} not divisible by block {block}")

    def body(min_r2, ib):
        off = start + ib * block
        xi = jax.lax.dynamic_slice(x, (off, 0), (block, 4))
        rows = off + jnp.arange(block)
        dx, dy, r2, adj, self_mask = _pair_blocks(xi, x, p, rows)
        dvx = xi[:, None, 2] - x[None, :, 2]
        dvy = xi[:, None, 3] - x[None, :, 3]
        r2s = jnp.maximum(jnp.where(jnp.isinf(r2), 1.0, r2),
                          COLLISION_R2_EPS)
        inv_r2 = 1.0 / r2s
        inv_r4 = inv_r2 * inv_r2
        values = jnp.stack(
            [
                jnp.sum(dvx * adj, axis=1),
                jnp.sum(dx * inv_r4 * adj, axis=1),
                jnp.sum(dx * inv_r2 * adj, axis=1),
                jnp.sum(dvy * adj, axis=1),
                jnp.sum(dy * inv_r4 * adj, axis=1),
                jnp.sum(dy * inv_r2 * adj, axis=1),
            ],
            axis=-1,
        )
        degree = jnp.sum(adj, axis=1)

        # Expert: truncated potential gradient + velocity consensus
        # (envs/flocking.py:expert_action).
        in_range = (r2 <= 1.0).astype(x.dtype)
        gx = (-2.0 * dx * inv_r4 + 2.0 * dx * inv_r2) * in_range
        gy = (-2.0 * dy * inv_r4 + 2.0 * dy * inv_r2) * in_range
        if centralized:
            nonself = 1.0 - self_mask.astype(x.dtype)
            ux = -(jnp.sum(dvx * nonself, axis=1) + jnp.sum(gx, axis=1))
            uy = -(jnp.sum(dvy * nonself, axis=1) + jnp.sum(gy, axis=1))
        else:
            ux = -(jnp.sum(dvx * adj, axis=1) + jnp.sum(gx * adj, axis=1))
            uy = -(jnp.sum(dvy * adj, axis=1) + jnp.sum(gy * adj, axis=1))
        expert = jnp.clip(jnp.stack([ux, uy], -1), -10.0, 10.0)

        blk_min = jnp.min(jnp.where(jnp.isinf(r2), jnp.inf, r2))
        return jnp.minimum(min_r2, blk_min), (values, degree, expert)

    min_r2, (values, degree, expert) = jax.lax.scan(
        body, jnp.asarray(jnp.inf, x.dtype), jnp.arange(length // block)
    )
    return FrameQuantities(
        values=values.reshape(length, 6),
        degree=degree.reshape(length),
        expert=expert.reshape(length, 2),
        min_r2=min_r2,
    )


def blocked_apply_adjT(
    pos: jax.Array,
    cols: jax.Array,
    p: FlockingParams,
    block: int = 128,
    row_range: Optional[Tuple[jax.Array, int]] = None,
    deg: Optional[jax.Array] = None,
) -> jax.Array:
    """``out[j] = sum_i adj[i,j] / deg_i · cols[i]`` without storing adj.

    This is :func:`ops.graph.aggregate` for one row-normalized radius
    adjacency built on the fly from ``pos``. Row-blocked: each block
    contributes a (B, N)^T x (B, C) matmul.

    Args:
      pos: (N, 2) agent positions defining the radius graph (replicated).
      cols: (N, C) feature columns to aggregate (replicated).
      row_range: sweep only rows ``[start, start+length)`` — the returned
        (N, C) is then a PARTIAL sum over those source rows; ``psum``
        across devices to complete.
      deg: optional precomputed (N,) radius degrees of the SOURCE rows'
        graph (the rollout carries them); recomputed here when ``None``.

    Returns:
      (N, C) aggregated columns.
    """
    n = pos.shape[0]
    start, length = (jnp.zeros((), jnp.int32), n) if row_range is None else row_range
    if length % block:
        raise ValueError(f"row count {length} not divisible by block {block}")
    x = jnp.concatenate([pos, jnp.zeros_like(pos)], axis=-1)  # (N, 4) shim

    def body(acc, ib):
        off = start + ib * block
        xi = jax.lax.dynamic_slice(x, (off, 0), (block, 4))
        rows = off + jnp.arange(block)
        _, _, _, adj, _ = _pair_blocks(xi, x, p, rows)
        if deg is None:
            d = jnp.sum(adj, axis=1)
        else:
            d = jax.lax.dynamic_slice(deg, (off,), (block,))
        aod = adj / jnp.maximum(d, 1.0)[:, None]       # (B, N)
        ci = jax.lax.dynamic_slice(cols, (off, 0), (block, cols.shape[1]))
        return acc + aod.T @ ci, None

    acc0 = jnp.zeros((n, cols.shape[1]), cols.dtype)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(length // block))
    return acc


class DelayCarry(NamedTuple):
    """Rollout carry for the feature-space delayed stack.

    Attributes:
      history: (K, N, F) raw feature history ``[x_t, ..., x_{t-K+1}]``
               (zeros before episode step k — ops/graph.py episode
               boundary semantics).
      pos_hist: (max(K-2, 0), N, 2) positions at ``[t-1, ..., t-K+2]``
               (adjacency sources for the outer applications).
      deg_hist: (max(K-2, 0), N) radius degrees of those historical graphs
               (normalizers; avoids recomputing full-row reductions).
    """

    history: jax.Array
    pos_hist: jax.Array
    deg_hist: jax.Array


def delay_carry_init(values: jax.Array, n: int, k: int) -> DelayCarry:
    """Episode-start carry: history ``[x_0, 0, ..., 0]``, positions zeroed
    (never used before they are filled — slots k >= 1 of the y-stack are
    zero for the first k steps exactly as in the dense path)."""
    f = values.shape[-1]
    history = jnp.concatenate(
        [values[None], jnp.zeros((k - 1, n, f), values.dtype)], axis=0
    ) if k > 1 else values[None]
    pos_hist = jnp.zeros((max(k - 2, 0), n, 2), values.dtype)
    deg_hist = jnp.ones((max(k - 2, 0), n), values.dtype)
    return DelayCarry(history=history, pos_hist=pos_hist, deg_hist=deg_hist)


def delayed_ystack(
    carry: DelayCarry,
    pos_now: jax.Array,
    p: FlockingParams,
    block: int = 128,
    row_range: Optional[Tuple[jax.Array, int]] = None,
    axis_name: Optional[str] = None,
    deg_now: Optional[jax.Array] = None,
) -> jax.Array:
    """The aggregated delayed stack ``y_k = G_k(t)^T x_{t-k}`` (K, N, F).

    Exactly ``aggregate(delay_gso, delay_state)`` of the dense path, built
    by K-1 blocked transpose-applies over historical adjacencies:
    ``A_t^T`` to every delayed slot, then ``A_{t-1}^T`` to slots >= 2, ...
    (newest-first — the reference's left-multiplied GSO recursion order,
    state_with_delay.py:44-47).

    Args:
      carry: delay carry BEFORE this step's history shift (history[0] is
        x_t, pos_hist[0] is positions at t-1, ...).
      pos_now: (N, 2) current positions (graph ``A_t``).
      row_range / axis_name: multi-chip mode — each device sweeps its row
        slice and the partial column sums are completed with ``psum`` over
        ``axis_name``.
    """
    k = carry.history.shape[0]
    n, f = carry.history.shape[1:]
    y = [carry.history[0]]
    if k == 1:
        return jnp.stack(y)
    v = carry.history[1:]                              # slots 1..K-1
    for s in range(k - 1):
        pos_s = pos_now if s == 0 else carry.pos_hist[s - 1]
        deg_s = deg_now if s == 0 else carry.deg_hist[s - 1]
        cols = jnp.transpose(v[s:], (1, 0, 2)).reshape(n, (k - 1 - s) * f)
        out = blocked_apply_adjT(
            pos_s, cols, p, block, row_range, deg=deg_s,
        )
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        v = v.at[s:].set(jnp.transpose(out.reshape(n, k - 1 - s, f), (1, 0, 2)))
        y.append(v[s])
    return jnp.stack(y)


def delay_carry_update(
    carry: DelayCarry,
    new_values: jax.Array,
    pos_prev: jax.Array,
    deg_prev: Optional[jax.Array] = None,
) -> DelayCarry:
    """Shift-and-insert after an env step: ``x_{t+1}`` enters the feature
    history; the pre-step positions/degrees enter the graph history."""
    k = carry.history.shape[0]
    history = (
        jnp.concatenate([new_values[None], carry.history[: k - 1]], axis=0)
        if k > 1
        else new_values[None]
    )
    if carry.pos_hist.shape[0]:
        pos_hist = jnp.concatenate(
            [pos_prev[None], carry.pos_hist[:-1]], axis=0
        )
        if deg_prev is None:
            raise ValueError(
                "delay_carry_update needs deg_prev (the pre-step frame's "
                "degrees) when K > 2 — ones would silently mis-normalize"
            )
        deg_hist = jnp.concatenate(
            [deg_prev[None], carry.deg_hist[:-1]], axis=0
        )
    else:
        pos_hist, deg_hist = carry.pos_hist, carry.deg_hist
    return DelayCarry(history=history, pos_hist=pos_hist, deg_hist=deg_hist)
