"""Checkpoint / resume.

Beyond the reference (which saves only a final inference state_dict,
gnn_dagger.py:98-112), full training state — params, optimizer state, PRNG
key, episode counter, and optionally the replay buffer — is saved so runs
restart from where they stopped (SURVEY §5 failure-recovery requirement).

Format: a single ``.npz`` with flattened pytree leaves + a JSON treedef
manifest. Actor params can additionally be exported in the reference's torch
``state_dict`` layout so the reference's own ``test_model.py`` can evaluate
models trained here.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np
import jax


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, tree: Any) -> None:
    """Save an arbitrary pytree of arrays/scalars to ``path`` (.npz).

    Atomic: written to a temp file in the same directory, then renamed —
    a large-N training-state checkpoint is gigabytes (the replay buffer)
    and takes minutes to fetch+write, so a preemption mid-save must leave
    the previous good checkpoint intact, not a truncated archive that the
    next resume crashes on."""
    leaves, treedef = _flatten(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save`, structured like ``like``.

    The stored treedef string is checked against ``like``'s for a clear
    error on mismatch (instead of a silent mis-zip).
    """
    with np.load(path) as z:
        stored = json.loads(bytes(z["__treedef__"]).decode())
        leaves_like, treedef = _flatten(like)
        if stored != str(treedef):
            raise ValueError(
                f"checkpoint structure mismatch:\n saved: {stored}\n want: {treedef}"
            )
        n = len(leaves_like)
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_actor_torch_format(
    path: str, actor_params, verbose: bool = False
) -> Optional[str]:
    """Export actor params as a torch state_dict file in the reference's
    ``models/actor_{env}_{fname}`` layout; returns the path or ``None`` when
    torch is unavailable."""
    try:
        import torch
    except ImportError:
        return None
    from multiagent_gnn_policies_tpu.models.torch_import import (
        actor_state_dict_from_params,
    )

    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in actor_state_dict_from_params(actor_params).items()
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(sd, path)
    if verbose:
        print(f"Saving model to {path}")
    return path
