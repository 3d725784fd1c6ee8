"""Sharded training and agent-axis-sharded inference.

Two scale-out paths (SURVEY §2.11 / §7):

* :class:`ShardedImitationLearner` — data parallelism for training: parallel
  rollout episodes are sharded over the mesh ``env`` axis, and each gradient
  batch is sharded over the same axis (XLA inserts the gradient ``psum``
  against the replicated params). This is the DP column of the parallelism
  table; one fused program per round, collectives ride ICI.

* :func:`sharded_policy_forward` — the large-N inference path: shards the
  *agent* axis of the delayed GSO/features over the ``agents`` mesh axis.
  The dense ``(K, N, N) x (K, N, F)`` aggregation partitions by output-agent
  blocks: each device holds the GSO columns of its agents and contracts the
  full feature set — XLA all-gathers the (small) ``(K, N, F)`` features and
  keeps the O(N^2) GSO resident, so memory per device is O(N^2 / shards).
  This is what lets evaluation scale to N >> trained-N (the reference's
  transfer experiments at dense-N^2 cost, SURVEY §5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multiagent_gnn_policies_tpu.algos.imitation import (
    ImitationConfig,
    ImitationLearner,
)
from multiagent_gnn_policies_tpu.models.actor import ActorConfig, actor_forward
from multiagent_gnn_policies_tpu.ops.graph import aggregate
from multiagent_gnn_policies_tpu.utils.metrics import MetricsLogger


class ShardedImitationLearner(ImitationLearner):
    """Imitation learner whose training round runs data-parallel on a mesh.

    ``cfg.n_rollout_envs`` should be a multiple of the mesh's ``env`` axis
    size (one or more whole episodes per device).
    """

    def __init__(
        self,
        cfg: ImitationConfig,
        mesh: Mesh,
        logger: Optional[MetricsLogger] = None,
    ):
        n_env = mesh.shape["env"]
        if cfg.n_rollout_envs % n_env:
            raise ValueError(
                f"n_rollout_envs={cfg.n_rollout_envs} not divisible by mesh "
                f"env axis {n_env}"
            )
        super().__init__(cfg, logger)
        self.mesh = mesh
        self.shard_episode = NamedSharding(mesh, P("env"))
        self.shard_batch = NamedSharding(mesh, P("env"))
        # params/opt/buffer replicated; rollout + grad batches sharded inside
        replicated = NamedSharding(mesh, P())
        self._round = jax.jit(
            self._round.__wrapped__,  # re-jit the bound impl with shardings
            out_shardings=(replicated, replicated, replicated, replicated, replicated),
        )


def sharded_policy_forward(
    params,
    acfg: ActorConfig,
    delay_state: jax.Array,
    delay_gso: jax.Array,
    mesh: Mesh,
):
    """Policy forward with the agent axis sharded over ``mesh['agents']``.

    Args:
      delay_state: ``(K, N, F)``.
      delay_gso: ``(K, N, N)`` — sharded on the *output*-agent (last) axis.

    Returns:
      ``(N, n_a)`` actions, sharded over agents.
    """
    gso_sharding = NamedSharding(mesh, P(None, None, "agents"))
    state_sharding = NamedSharding(mesh, P())
    out_sharding = NamedSharding(mesh, P("agents"))

    @jax.jit
    def fwd(params, ds, gso):
        ds = jax.lax.with_sharding_constraint(ds, state_sharding)
        gso = jax.lax.with_sharding_constraint(gso, gso_sharding)
        agg = aggregate(gso, ds)  # (K, N, F): output agents sharded
        agg = jax.lax.with_sharding_constraint(
            agg, NamedSharding(mesh, P(None, "agents"))
        )
        out = actor_forward(params, acfg, agg, None)
        return jax.lax.with_sharding_constraint(out, out_sharding)

    return fwd(params, delay_state, delay_gso)
