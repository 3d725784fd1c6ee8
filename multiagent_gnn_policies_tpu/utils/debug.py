"""Numerical-sanitizer hooks — the framework's answer to SURVEY §5's
"race detection / sanitizers" row.

The reference has no numerical checking at all (single-threaded PyTorch; a
NaN silently poisons training until the final CSV row reads ``nan``). Here
the invariants are explicit and cheap enough for CI:

* :func:`nan_debug` — context manager flipping ``jax_debug_nans`` on, so any
  op producing a NaN raises at the producing primitive (XLA re-runs the
  program un-jitted to locate it). Use around small repro runs, not
  production training (it disables async dispatch).
* :func:`assert_finite` — jittable pytree check via
  ``jax.debug.check_nans``-style error: uses ``equinox``-free pure lax so it
  compiles into the training step when ``MAGNN_CHECK_FINITE=1``.
* :func:`check_finite` — host-side hard assert for tests and checkpoint
  boundaries (params/opt-state must be finite before being written to disk).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Iterator


@contextlib.contextmanager
def nan_debug() -> Iterator[None]:
    """Enable ``jax_debug_nans`` for the duration of the block."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree: Any, name: str = "value") -> Any:
    """Jittable: pass ``tree`` through, erroring at runtime on NaN/Inf.

    Compiled in only when ``MAGNN_CHECK_FINITE=1`` (or when called directly,
    e.g. from tests); otherwise it is the identity so the hot path carries
    zero cost. The error is raised via ``jax.experimental.checkify``-free
    ``jax.debug.callback`` so it works inside scan/vmap on any backend.
    """
    import jax
    import jax.numpy as jnp

    if os.environ.get("MAGNN_CHECK_FINITE", "1") != "1":
        return tree

    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return tree
    bad = jnp.zeros((), jnp.bool_)
    for leaf in leaves:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
            bad = bad | ~jnp.isfinite(leaf).all()

    def _raise(is_bad):
        if bool(is_bad):
            raise FloatingPointError(f"non-finite values in {name}")

    jax.debug.callback(_raise, bad)
    return tree


def check_finite(tree: Any, name: str = "value") -> None:
    """Host-side hard assert: every inexact leaf of ``tree`` is finite."""
    import jax
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.inexact) and not np.isfinite(arr).all():
            keystr = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name}{keystr} "
                f"(nan={int(np.isnan(arr).sum())}, "
                f"inf={int(np.isinf(arr).sum())})"
            )
