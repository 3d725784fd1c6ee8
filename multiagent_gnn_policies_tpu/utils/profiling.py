"""Tracing / profiling hooks (SURVEY §5).

The reference has zero instrumentation (its only telemetry is a print of
episode stats, gnn_dagger.py:213-219). Here:

* :func:`trace` — context manager emitting a TensorBoard/XProf trace of
  everything run inside it (``jax.profiler``); wired to ``train.py
  --profile DIR`` so any experiment section can be profiled end to end.
* :class:`Throughput` — wall-clock throughput meter for the fused loops;
  reports env steps/s and graph edges/s (the BASELINE.json units). Edge
  counts come from the frame degrees the rollout already computes — no
  extra device work.
* :func:`assert_finite` — opt-in NaN/Inf tripwire for CI (the
  race-detection analogue: deterministic single-program training means
  the failure mode to guard is numeric, not concurrency).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed block into ``log_dir`` (no-op when ``None``)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class Throughput:
    """Counts env steps (and optionally edges) against wall-clock time."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self.steps = 0
        self.edges = 0.0

    def add(self, steps: int, edges: float = 0.0) -> None:
        self.steps += steps
        self.edges += edges

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def rates(self) -> dict:
        dt = max(self.elapsed, 1e-9)
        out = {"steps_per_s": self.steps / dt, "elapsed_s": dt}
        if self.edges:
            out["edges_per_s"] = self.edges / dt
        return out


def assert_finite(tree, where: str = "") -> None:
    """Host-side check that every leaf is finite (call on fetched values)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.all(jnp.isfinite(leaf))):
            name = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values at {name}" + (f" ({where})" if where else "")
            )
