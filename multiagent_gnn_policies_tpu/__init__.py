"""TPU-native framework for decentralized swarm-control GNN policies.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
katetolstaya/multiagent_gnn_policies (Tolstaya et al., "Learning Decentralized
Controllers for Robot Swarms with Graph Neural Networks", CoRL 2020):
delayed-aggregation graph filters over time-varying proximity graphs, trained
by behavior cloning / DAGGER / DDPG on fused on-device flocking environments.

Design stance (TPU-first, not a port):
  * the environment (double-integrator dynamics, radius-graph construction,
    expert controller, reward) is a pure jittable function, `vmap`-ed over
    parallel environments and `lax.scan`-ed over time — rollouts never leave
    the device;
  * the delayed K-hop graph state is a pytree updated by one batched matmul
    per step (the recursion of reference state_with_delay.py:44-53, done
    on-device);
  * the replay buffer is a preallocated structure-of-arrays on device;
  * scale-out shards the environment batch and the agent axis over a
    `jax.sharding.Mesh`, with XLA collectives over ICI.
"""

__version__ = "0.1.0"

from multiagent_gnn_policies_tpu.ops.graph import (  # noqa: F401
    GraphState,
    initial_graph_state,
    update_graph_state,
)
from multiagent_gnn_policies_tpu.models.actor import (  # noqa: F401
    ActorConfig,
    init_actor,
    actor_forward,
)
