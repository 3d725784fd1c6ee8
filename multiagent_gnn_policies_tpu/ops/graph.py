"""Delayed K-hop graph-state runtime (pure, jittable, vmap-able).

This is the TPU-native replacement for the reference's host-side
``MultiAgentStateWithDelay`` object (reference: learner/state_with_delay.py).
Semantics are identical; the representation is a pytree of arrays so whole
rollouts stay on device under ``jit`` / ``lax.scan`` / ``vmap``.

Layout convention (differs from the reference deliberately):
  * features are agents-major: ``(..., N, F)`` instead of torch's
    ``(B, 1, F, N)`` — the aggregation matmul then contracts the large agent
    axis on the MXU without transposes;
  * graph-shift operators (GSOs) keep the reference's entry semantics:
    ``S[i, j]`` is the weight with which agent ``j`` receives from agent
    ``i`` (the reference right-multiplies features by the GSO,
    learner/actor.py:70); aggregation here is
    ``y[j] = sum_i S[i, j] x[i]`` — see :func:`aggregate`.

Definitions (matching learner/state_with_delay.py:38-53):
  * ``curr_gso[k]  = A_t^k``                      (powers of the current graph)
  * ``delay_gso[k] = A_t · A_{t-1} · … · A_{t-k+1}``  (delayed operator,
    built recursively: ``delay_gso[1:] = A_t @ prev.delay_gso[:-1]``)
  * ``delay_state[k] = x_{t-k}``                  (feature history)

At an episode boundary (``prev is None`` in the reference) the delayed slots
``k >= 1`` are zero and ``delay_gso[0] = I`` — replicated exactly by
:func:`initial_graph_state`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GraphState(NamedTuple):
    """Pytree carrying the delayed graph state for one (or a batch of) envs.

    Shapes below are for the unbatched case; every field may carry arbitrary
    leading batch dims (the update functions are written unbatched and are
    ``vmap``-compatible).

    Attributes:
      values:      ``(N, F)``   current per-agent features ``x_t``.
      network:     ``(N, N)``   current graph shift operator ``A_t``
                   (zero diagonal; typically row-normalized adjacency).
      delay_gso:   ``(K, N, N)`` delayed GSO stack.
      delay_state: ``(K, N, F)`` feature history stack.
      curr_gso:    ``(K, N, N)`` powers of ``A_t`` (only needed by the DDPG
                   critic; pass ``with_curr_gso=False`` to skip computing it,
                   in which case the field holds a zero-size placeholder).
    """

    values: jax.Array
    network: jax.Array
    delay_gso: jax.Array
    delay_state: jax.Array
    curr_gso: jax.Array


def gso_powers(network: jax.Array, k: int) -> jax.Array:
    """``[I, A, A^2, …, A^{k-1}]`` — reference state_with_delay.py:38-41.

    Args:
      network: ``(N, N)`` graph shift operator.
      k: number of taps.

    Returns:
      ``(k, N, N)`` stacked powers.
    """
    n = network.shape[-1]
    eye = jnp.eye(n, dtype=network.dtype)

    def step(prev, _):
        nxt = network @ prev
        return nxt, nxt

    if k == 1:
        return eye[None]
    _, rest = jax.lax.scan(step, eye, None, length=k - 1)
    return jnp.concatenate([eye[None], rest], axis=0)


def delayed_gso_update(network: jax.Array, prev_delay_gso: jax.Array) -> jax.Array:
    """One step of the delayed-GSO recursion (state_with_delay.py:44-47).

    ``new[0] = I``; ``new[k] = A_t @ prev[k-1]`` for ``k >= 1``.

    Args:
      network: ``(N, N)`` current GSO ``A_t``.
      prev_delay_gso: ``(K, N, N)`` previous step's delayed GSO.

    Returns:
      ``(K, N, N)`` updated delayed GSO.
    """
    k, n, _ = prev_delay_gso.shape
    eye = jnp.eye(n, dtype=network.dtype)
    if k == 1:
        return eye[None]
    shifted = jnp.einsum(
        "ij,kjm->kim", network, prev_delay_gso[: k - 1],
        preferred_element_type=network.dtype,
    )
    return jnp.concatenate([eye[None], shifted], axis=0)


def history_shift(prev_history: jax.Array, new_slot: jax.Array) -> jax.Array:
    """Shift-and-insert along the leading (tap) axis.

    ``new[0] = new_slot``; ``new[k] = prev[k-1]`` — state_with_delay.py:50-53.
    """
    k = prev_history.shape[0]
    if k == 1:
        return new_slot[None]
    return jnp.concatenate([new_slot[None], prev_history[: k - 1]], axis=0)


def _empty_curr_gso(network: jax.Array, k: int) -> jax.Array:
    n = network.shape[-1]
    return jnp.zeros((0, n, n), dtype=network.dtype)


def initial_graph_state(
    values: jax.Array,
    network: jax.Array,
    k: int,
    with_curr_gso: bool = False,
) -> GraphState:
    """Episode-start graph state (reference ``prev_state=None`` path).

    ``delay_gso = [I, 0, …, 0]``, ``delay_state = [x_t, 0, …, 0]``.
    """
    n, f = values.shape
    eye = jnp.eye(n, dtype=network.dtype)
    delay_gso = jnp.concatenate(
        [eye[None], jnp.zeros((k - 1, n, n), dtype=network.dtype)], axis=0
    ) if k > 1 else eye[None]
    delay_state = jnp.concatenate(
        [values[None], jnp.zeros((k - 1, n, f), dtype=values.dtype)], axis=0
    ) if k > 1 else values[None]
    curr = gso_powers(network, k) if with_curr_gso else _empty_curr_gso(network, k)
    return GraphState(values, network, delay_gso, delay_state, curr)


def update_graph_state(
    prev: GraphState,
    values: jax.Array,
    network: jax.Array,
    with_curr_gso: bool = False,
) -> GraphState:
    """Advance the delayed graph state by one env step.

    One ``(K-1)``-batched dense matmul amortizes the whole K-hop history —
    the recursion of state_with_delay.py:44-53, on device.
    """
    k = prev.delay_gso.shape[0]
    delay_gso = delayed_gso_update(network, prev.delay_gso)
    delay_state = history_shift(prev.delay_state, values)
    curr = gso_powers(network, k) if with_curr_gso else _empty_curr_gso(network, k)
    return GraphState(values, network, delay_gso, delay_state, curr)


def aggregate(gso: jax.Array, x: jax.Array) -> jax.Array:
    """Apply a stack of GSOs to a stack of features.

    Equivalent to the reference's ``torch.matmul(x, delay_gso)`` with
    ``x`` laid out ``(B, K, F, N)`` (learner/actor.py:70) — here features are
    ``(..., K, N, F)`` so the contraction reads
    ``y[..., k, j, f] = sum_i gso[..., k, i, j] * x[..., k, i, f]``.

    Args:
      gso: ``(..., K, N, N)``.
      x:   ``(..., K, N, F)``.

    Returns:
      ``(..., K, N, F)`` aggregated features.
    """
    return jnp.einsum(
        "...kij,...kif->...kjf", gso, x, preferred_element_type=x.dtype
    )


def normalized_adjacency(adj: jax.Array) -> jax.Array:
    """Row-normalize a (zero-diagonal) adjacency by out-degree (mean pooling).

    Matches gym_flock's ``adj_mat_mean`` (degree clamped to >= 1), which the
    FlockingRelative env returns as ``state_network`` (SURVEY §2.9).
    """
    deg = jnp.sum(adj, axis=-1, keepdims=True)
    deg = jnp.maximum(deg, 1.0)
    return adj / deg
