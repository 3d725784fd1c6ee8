"""Multi-host bootstrap: ``jax.distributed`` wiring (SURVEY §2.11/§5).

The reference is strictly single-process (SURVEY §2.11); the committed
multi-host design runs XLA collectives over ICI within a slice and DCN
across hosts. This module is the process-bootstrap half of that: env-var
driven ``jax.distributed.initialize`` so the SAME training / rollout code
runs unchanged under a multi-process mesh — meshes built over
``jax.devices()`` automatically become global, and the ``psum`` /
``all_gather`` completions in parallel/large_n.py and parallel/sharded.py
ride the cross-process backend.

Env contract (all three must be set to activate; no-op otherwise so every
CLI can call :func:`maybe_initialize_distributed` unconditionally):

  MAGNN_COORDINATOR   host:port of process 0 (e.g. "10.0.0.1:8476")
  MAGNN_NUM_PROCESSES total process count
  MAGNN_PROCESS_ID    this process's rank in [0, num_processes)

On TPU pods the standard JAX auto-detection (``jax.distributed.initialize``
with no args) also works — set ``MAGNN_AUTO_DISTRIBUTED=1`` for that.

CPU meshes (CI / the virtual 8-device mesh) need a cross-process collective
implementation; :func:`maybe_initialize_distributed` selects ``gloo``
automatically when the platform is CPU. Verified by the 2-process test
(tests/test_multihost.py) driving scripts/multihost_demo.py: a psum across
8 global devices in 2 processes, an agent-sharded large-N rollout matching
its single-process value, and a data-parallel training round.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed() -> bool:
    """Initialize ``jax.distributed`` from env vars; returns True if done.

    Safe to call more than once (subsequent calls are no-ops) and before
    any jax computation. Must run before the first backend touch.
    """
    if os.environ.get("MAGNN_AUTO_DISTRIBUTED") == "1":
        import jax

        jax.distributed.initialize()
        return True
    coord = os.environ.get("MAGNN_COORDINATOR")
    nproc = os.environ.get("MAGNN_NUM_PROCESSES")
    pid = os.environ.get("MAGNN_PROCESS_ID")
    if not (coord and nproc and pid):
        return False
    initialize_distributed(coord, int(nproc), int(pid))
    return True


def initialize_distributed(
    coordinator: str, num_processes: int, process_id: int,
    platform: Optional[str] = None,
) -> None:
    """Explicit multi-process init.

    Args:
      coordinator: ``host:port`` of process 0's coordination service.
      num_processes / process_id: global process count and this rank.
      platform: force a platform first (e.g. ``"cpu"`` for the virtual
        mesh — also selects the gloo CPU collectives backend).
    """
    import jax

    if platform is None:
        platform = os.environ.get("MAGNN_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu" or _effective_platform_is_cpu():
        # XLA:CPU needs an explicit cross-process collectives impl
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def _effective_platform_is_cpu() -> bool:
    import jax

    plats = jax.config.jax_platforms or ""
    return plats.split(",")[0] == "cpu" if plats else False


def process_info() -> tuple[int, int]:
    """(process_id, num_processes) of the running job (0, 1 if single)."""
    import jax

    return jax.process_index(), jax.process_count()
