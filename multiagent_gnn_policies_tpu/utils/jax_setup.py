"""JAX runtime setup shared by every entry point.

The TPU in this environment is reached through a remote compile/execute
service whose compile latency is high-variance (tens of seconds to minutes
for the fused training programs). The persistent compilation cache makes
that a one-time cost per program shape: every CLI (train.py, evaluate.py,
bench.py) and the driver entry points call :func:`enable_persistent_cache`
right after importing jax, so re-runs and subsequent processes load compiled
executables from disk instead of recompiling.

Override the location with ``MAGNN_TPU_CACHE`` (set it empty to disable).
"""

from __future__ import annotations

import os


def respect_platform_env() -> None:
    """Honor an explicit ``JAX_PLATFORMS`` even under the TPU boot shim.

    This environment's interpreter-start shim registers the remote-TPU
    backend unconditionally, which re-writes ``jax_platforms`` to
    ``"axon,cpu"`` — silently overriding a caller's ``JAX_PLATFORMS=cpu``
    (and making CPU-only subprocesses contend for the single TPU). CLIs
    call this first so an explicitly requested platform wins."""
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat and "axon" not in plat.split(","):
        jax.config.update("jax_platforms", plat)


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Turn on JAX's on-disk compilation cache. Safe to call repeatedly;
    must run before the first compilation to benefit it."""
    import jax

    if path is None:
        path = os.environ.get(
            "MAGNN_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "magnn_tpu_xla"),
        )
    if not path:
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
