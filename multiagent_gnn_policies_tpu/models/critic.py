"""Centralized GNN critic (pure-functional JAX).

Re-design of the reference ``Critic`` (learner/critic.py). The critic is
centralized, so unlike the actor it applies the graph shift operator at
*every* layer: ``[GSO -> linear -> GroupNorm -> relu]`` repeated, width path
``[n_s + n_a] + hidden + [1]`` (learner/critic.py:22, 73-84), consuming the
*current* GSO powers ``[I, A_t, …, A_t^{K-1}]``.

Note: the reference's ``forward`` crashes with a ``NameError`` because
``torch.nn.functional`` is never imported there (learner/critic.py:82) — the
intended structure (relu after GroupNorm) is reproduced here, fixed by
design.

Per reference layer ``i`` with input width ``W_i``:
  1. broadcast-apply all K GSO powers to the ``(…, 1, N, W_i)`` features,
     giving ``(…, K, N, W_i)``;
  2. linear map contracting both the K channels and the ``W_i`` features:
     weight ``(W_{i+1}, K, W_i)`` — torch's Conv2d(in=K, kernel=(W_i,1),
     stride=(W_i,1)) in disguise (learner/critic.py:33-35);
  3. (hidden layers only) GroupNorm(num_groups=W_{i+1},
     num_channels=W_{i+1}) == per-feature instance norm over the agent axis,
     with per-feature affine (learner/critic.py:39-44), then relu.

Output: ``(..., N)`` per-agent Q values (learner/critic.py:86).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp

Params = List[dict]

_GROUPNORM_EPS = 1e-5  # torch.nn.GroupNorm default


@dataclasses.dataclass(frozen=True)
class CriticConfig:
    n_s: int
    n_a: int
    hidden: Tuple[int, ...]
    k: int
    gso_first: bool = True  # hardcoded True in the reference (critic.py:25)
    # Framework extension (default True = reference's intended structure).
    # GroupNorm(groups == channels) normalizes every feature over the agent
    # axis PER SAMPLE, which erases the feature-magnitude information the
    # Q target (discounted velocity-disagreement cost) is made of — two
    # states with the same disagreement pattern but different magnitudes
    # become indistinguishable to the critic. The reference never actually
    # ran this critic as shipped (its forward crashes on an unimported
    # F.relu, learner/critic.py:82), so the GN design is untested there;
    # ``use_groupnorm=False`` (cfg key ``critic_gn = False``) is what makes
    # the DDPG demo learn (cfg/ddpg_toy.cfg, RESULTS §DDPG).
    use_groupnorm: bool = True
    # Framework extension (default "identity" = reference semantics):
    # compression applied to the STATE features before the critic (actions
    # pass through raw — they are already in [-1, 1]). The 1/r^4
    # observation features spike to ~1e5 near collisions (measured p99=78,
    # max=1.3e5 on the toy config), so with raw inputs the first linear
    # layer must scale down by ~1e5 and the +-1 action columns become
    # invisible: the trained critic's dQ/da was measured UNCORRELATED
    # (cosine 0.03) with the true differentiable reward gradient.
    # "asinh" (sign-preserving log compression) raised that to 0.55 and is
    # what makes DDPG produce useful policy gradients.
    input_transform: str = "identity"

    @property
    def widths(self) -> Tuple[int, ...]:
        return (self.n_s + self.n_a, *self.hidden, 1)

    @property
    def n_layers(self) -> int:
        return len(self.widths) - 1

    def in_channels(self, i: int) -> int:
        return self.k if (i > 0 or self.gso_first) else 1


def init_critic(key: jax.Array, cfg: CriticConfig, dtype=jnp.float32) -> Params:
    params = []
    keys = jax.random.split(key, cfg.n_layers)
    widths = cfg.widths
    for i in range(cfg.n_layers):
        c_in, w_in, w_out = cfg.in_channels(i), widths[i], widths[i + 1]
        bound = 1.0 / math.sqrt(c_in * w_in)
        wkey, bkey = jax.random.split(keys[i])
        layer = {
            "w": jax.random.uniform(wkey, (w_out, c_in, w_in), dtype, -bound, bound),
            "b": jax.random.uniform(bkey, (w_out,), dtype, -bound, bound),
        }
        if i < cfg.n_layers - 1 and cfg.use_groupnorm:
            layer["gn_scale"] = jnp.ones((w_out,), dtype)
            layer["gn_bias"] = jnp.zeros((w_out,), dtype)
        params.append(layer)
    return params


def critic_forward(
    params: Params,
    cfg: CriticConfig,
    states: jax.Array,
    actions: jax.Array,
    gso: jax.Array,
) -> jax.Array:
    """Evaluate per-agent Q values.

    Args:
      states: ``(..., N, n_s)``.
      actions: ``(..., N, n_a)``.
      gso: ``(..., K, N, N)`` current GSO powers.

    Returns:
      ``(..., N)`` Q values.
    """
    if cfg.input_transform == "asinh":
        states = jnp.arcsinh(states)
    elif cfg.input_transform != "identity":
        raise ValueError(f"unknown critic input_transform {cfg.input_transform!r}")
    # (..., 1, N, W0) with a singleton channel axis, as in critic.py:70.
    x = jnp.concatenate([states, actions], axis=-1)[..., None, :, :]
    for i, layer in enumerate(params):
        if i > 0 or cfg.gso_first:
            # Broadcast the (possibly singleton) channel axis against K GSO
            # powers: y[..., k, j, w] = sum_i gso[..., k, i, j] x[..., c, i, w].
            x = jnp.einsum(
                "...kij,...cif->...kjf", gso, x, preferred_element_type=x.dtype
            )
        # Linear: contract channels and features (critic.py:33-35, 79).
        x = jnp.einsum(
            "gcf,...cnf->...ng", layer["w"], x, preferred_element_type=x.dtype
        ) + layer["b"]
        if i < cfg.n_layers - 1:
            if cfg.use_groupnorm:
                # GroupNorm(groups == channels) over the agent axis + relu.
                mean = jnp.mean(x, axis=-2, keepdims=True)
                var = jnp.var(x, axis=-2, keepdims=True)
                x = (x - mean) * jax.lax.rsqrt(var + _GROUPNORM_EPS)
                x = x * layer["gn_scale"] + layer["gn_bias"]
            x = jax.nn.relu(x)
        # Re-insert the singleton channel axis for the next GSO application
        # (the reference's view() at critic.py:84).
        x = x[..., None, :, :]
    return x[..., 0, :, 0]
