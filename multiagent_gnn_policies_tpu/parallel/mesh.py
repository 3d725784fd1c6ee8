"""Device-mesh construction.

Axes (SURVEY §7 design):
  * ``env``    — data parallelism over parallel environments / replay batch;
  * ``agents`` — the swarm's agent axis (the framework's analogue of
    tensor/sequence parallelism: the model is ~1.7k params, the *graph* is
    the big tensor, so scale-out shards N, not the weights).

The reference has no parallelism of any kind (single process, single device
— SURVEY §2.11); this module is the TPU replacement.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    n_env: Optional[int] = None,
    n_agent_shards: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build an ``('env', 'agents')`` mesh over the available devices.

    Args:
      n_env: size of the env (data-parallel) axis; defaults to
        ``n_devices // n_agent_shards``.
      n_agent_shards: size of the agent-sharding axis.
      devices: defaults to ``jax.devices()``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_env is None:
        if len(devices) % n_agent_shards:
            raise ValueError(
                f"{len(devices)} devices not divisible by {n_agent_shards} agent shards"
            )
        n_env = len(devices) // n_agent_shards
    need = n_env * n_agent_shards
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_env, n_agent_shards)
    return Mesh(grid, axis_names=("env", "agents"))
