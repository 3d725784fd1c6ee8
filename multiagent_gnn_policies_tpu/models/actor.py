"""Delayed-aggregation GNN policy (pure-functional JAX).

Re-design of the reference ``Actor`` (learner/actor.py). The reference
expresses each layer as a ``nn.Conv2d`` with kernel ``(step, 1)`` where
``step = k`` only at the aggregation layer — i.e. every layer is really just
a per-agent linear map, except the aggregation layer which additionally
contracts the K delay taps. Here that is written directly as einsums, which
XLA fuses into a handful of MXU matmuls:

  * layers before ``ind_agg``: per-tap per-agent linear ``(..., K, N, F_in)
    -> (..., K, N, F_out)``;
  * at ``ind_agg``: neighborhood aggregation ``x <- delay_gso^T x`` (the one
    and only graph operation — "the policy network is allowed to have only
    one aggregation operation due to communication latency",
    learner/actor.py:11-12) followed by a tap-contracting linear
    ``(..., K, N, F) -> (..., N, F_out)``;
  * layers after: per-agent linear ``(..., N, F_in) -> (..., N, F_out)``.

``tanh`` between layers, identity at the output (learner/actor.py:73-77).

Parameters are a plain pytree: ``[{'w': (F_out, F_in, taps), 'b': (F_out,)}]``
with ``taps = k`` at ``ind_agg`` and ``1`` elsewhere — the exact information
content of the reference's conv weights ``(F_out, F_in, step, 1)``, so the
pretrained checkpoint imports losslessly (models/torch_import.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from multiagent_gnn_policies_tpu.ops.graph import aggregate

Params = List[dict]


@dataclasses.dataclass(frozen=True)
class ActorConfig:
    """Static architecture of the policy network.

    Attributes:
      n_s: per-agent feature (MDP state) width.
      n_a: per-agent action width.
      hidden: hidden layer widths.
      k: number of delay taps (graph filter length).
      ind_agg: index of the layer before which aggregation happens
        (0 in the imitation learners, reference gnn_dagger.py:43).
      bound: output bounding — "none" (reference semantics: the raw linear
        output, learner/actor.py:75-84 ships with scaling/clamping disabled)
        or "tanh" (bounded policy class; the DDPG default here — cfg key
        ``policy_bound``, see algos/ddpg.py for why). Parameters are
        identical either way, so checkpoints are interchangeable.
    """

    n_s: int
    n_a: int
    hidden: Tuple[int, ...]
    k: int
    ind_agg: int = 0
    bound: str = "none"

    def __post_init__(self):
        if self.bound not in ("none", "tanh"):
            raise ValueError(f"unknown actor bound {self.bound!r}")

    @property
    def widths(self) -> Tuple[int, ...]:
        return (self.n_s, *self.hidden, self.n_a)

    @property
    def n_layers(self) -> int:
        return len(self.widths) - 1

    def taps(self, i: int) -> int:
        return self.k if i == self.ind_agg else 1


def _conv_init(key: jax.Array, fan_out: int, fan_in: int, taps: int, dtype):
    """torch ``nn.Conv2d`` default init: kaiming-uniform(a=sqrt(5)) weights and
    uniform bias, both with bound ``1/sqrt(fan_in * taps)`` — replicated so
    training dynamics match the reference at matched seeds-in-distribution."""
    bound = 1.0 / math.sqrt(fan_in * taps)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (fan_out, fan_in, taps), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_actor(key: jax.Array, cfg: ActorConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.n_layers)
    widths = cfg.widths
    return [
        _conv_init(keys[i], widths[i + 1], widths[i], cfg.taps(i), dtype)
        for i in range(cfg.n_layers)
    ]


def actor_forward(
    params: Params,
    cfg: ActorConfig,
    delay_state: jax.Array,
    delay_gso: Optional[jax.Array] = None,
    *,
    return_activations: bool = False,
):
    """Run the policy.

    Args:
      params: pytree from :func:`init_actor` (or the torch importer).
      cfg: static architecture.
      delay_state: ``(..., K, N, F)`` feature history — or, when
        ``delay_gso is None`` and ``ind_agg == 0``, the PRE-AGGREGATED
        history ``delay_gso^T·x`` (what the scalable rollout path stores in
        replay, avoiding (K,N,N) tensors entirely).
      delay_gso: ``(..., K, N, N)`` delayed GSO, or ``None`` for the
        pre-aggregated path.
      return_activations: also return the list of post-layer activations
        (used by parity tests against the reference).

    Returns:
      ``(..., N, n_a)`` per-agent actions (and activations if requested).
    """
    if delay_gso is None and cfg.ind_agg != 0:
        raise ValueError("pre-aggregated input requires ind_agg == 0")

    x = delay_state
    acts = []
    for i, layer in enumerate(params):
        w, b = layer["w"], layer["b"]
        if i == cfg.ind_agg:
            if delay_gso is not None:
                # The single neighborhood aggregation (learner/actor.py:68-71).
                x = aggregate(delay_gso, x)
            # Contract the K delay taps and the feature axis in one matmul.
            # w: (F_out, F_in, K); x: (..., K, N, F_in).
            x = jnp.einsum(
                "gfk,...knf->...ng", w, x, preferred_element_type=x.dtype
            ) + b
        else:
            # Per-agent (and per-tap, if pre-aggregation) linear map.
            x = jnp.einsum(
                "gf,...nf->...ng", w[:, :, 0], x, preferred_element_type=x.dtype
            ) + b
        if i < cfg.n_layers - 1:
            x = jnp.tanh(x)
        elif cfg.bound == "tanh":
            x = jnp.tanh(x)          # bounded policy class (cfg.bound)
        if return_activations:
            acts.append(x)
    if return_activations:
        return x, acts
    return x


def actor_param_count(params: Params) -> int:
    return sum(int(p.size) for layer in params for p in layer.values())


def hidden_layers(hidden_size: int, n_layers: int) -> Sequence[int]:
    """Reference convention: ``n_layers`` copies of ``hidden_size``
    (gnn_dagger.py:42)."""
    return tuple([hidden_size] * n_layers)
