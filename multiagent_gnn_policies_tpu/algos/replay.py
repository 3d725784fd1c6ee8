"""On-device structure-of-arrays replay buffer.

The reference keeps a Python list of whole state objects on the accelerator
(learner/replay_buffer.py; ~2.4 GB of dense GSO tensors at N=100, K=3 —
SURVEY §2.8). Here the buffer is a preallocated pytree of device arrays with
an integer cursor, so insert/sample are jittable scatter/gather and the whole
train step stays in one compiled program.

Sampling is uniform **without replacement** over the filled prefix, matching
``random.sample`` in the reference (replay_buffer.py:40): draw a uniform key
per slot, mask unfilled slots to ``-inf``, take the top-``batch`` indices.

For the imitation learners the stored record is the PRE-AGGREGATED delayed
feature stack ``delay_gso^T · delay_state`` (valid because ``ind_agg == 0``
there, gnn_dagger.py:43) — (K, N, F) per step instead of (K, N, N) — which
cuts buffer memory by ~N/F and removes the GSO matmul from every gradient
step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class ReplayBuffer(NamedTuple):
    """Ring buffer over an arbitrary sample pytree.

    Attributes:
      data: pytree whose leaves have leading dim ``capacity``.
      size: () int32 — number of valid entries.
      cursor: () int32 — next write position.
    """

    data: Any
    size: jax.Array
    cursor: jax.Array

    @property
    def capacity(self) -> int:
        return jax.tree_util.tree_leaves(self.data)[0].shape[0]


def replay_init(capacity: int, example: Any) -> ReplayBuffer:
    """Allocate a buffer shaped like ``capacity`` copies of ``example``."""
    data = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        example,
    )
    return ReplayBuffer(
        data=data, size=jnp.zeros((), jnp.int32), cursor=jnp.zeros((), jnp.int32)
    )


def replay_insert_batch(buf: ReplayBuffer, samples: Any) -> ReplayBuffer:
    """Insert ``T`` stacked samples (leading axis) at the cursor, wrapping.

    ``T`` must be <= capacity (an episode chunk; asserted statically).
    Overwrite order matches the reference's one-at-a-time ring inserts.
    """
    cap = buf.capacity
    t = jax.tree_util.tree_leaves(samples)[0].shape[0]
    if t > cap:
        raise ValueError(f"chunk of {t} exceeds buffer capacity {cap}")
    idx = (buf.cursor + jnp.arange(t)) % cap
    data = jax.tree.map(lambda d, s: d.at[idx].set(s), buf.data, samples)
    return ReplayBuffer(
        data=data,
        size=jnp.minimum(buf.size + t, cap),
        cursor=(buf.cursor + t) % cap,
    )


def replay_sample(buf: ReplayBuffer, key: jax.Array, batch: int) -> Any:
    """Uniform sample of ``batch`` distinct filled slots (gathered pytree)."""
    cap = buf.capacity
    u = jax.random.uniform(key, (cap,))
    u = jnp.where(jnp.arange(cap) < buf.size, u, -jnp.inf)
    _, idx = jax.lax.top_k(u, batch)
    return jax.tree.map(lambda d: d[idx], buf.data)
