"""Lossless conversion between reference PyTorch state_dicts and our pytrees.

The reference ships one pretrained artifact
(``models/actor_FlockingRelative-v0_dagger_k3``, a ``state_dict`` with keys
``conv_layers.{i}.weight`` ``(F_out, F_in, taps, 1)`` and
``conv_layers.{i}.bias`` ``(F_out,)`` — see SURVEY §2.1). Importing it gives
the parity tests exact weights; exporting lets checkpoints trained here be
evaluated by the reference's ``test_model.py``.

Works from either a live ``torch`` state_dict or a ``{key: np.ndarray}``
mapping, so the core framework has no torch dependency.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import numpy as np
import jax.numpy as jnp


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch.Tensor (avoids importing torch here)
    return v.detach().cpu().numpy()


def actor_params_from_state_dict(sd: Mapping[str, object]) -> List[dict]:
    """Reference Actor state_dict -> our params pytree.

    ``conv_layers.{i}.weight (F_out, F_in, taps, 1)`` -> ``w (F_out, F_in, taps)``.
    """
    params = []
    i = 0
    while f"conv_layers.{i}.weight" in sd:
        w = _to_numpy(sd[f"conv_layers.{i}.weight"])
        b = _to_numpy(sd[f"conv_layers.{i}.bias"])
        assert w.ndim == 4 and w.shape[-1] == 1, w.shape
        params.append({"w": jnp.asarray(w[:, :, :, 0]), "b": jnp.asarray(b)})
        i += 1
    if not params:
        raise ValueError("no conv_layers.* keys found in state_dict")
    return params


def actor_state_dict_from_params(params: List[dict]) -> Dict[str, np.ndarray]:
    """Our actor params -> reference-layout state_dict (numpy arrays).

    Pass through ``torch.save({k: torch.from_numpy(v) ...})`` to produce a
    checkpoint loadable by reference gnn_dagger.py:114-123.
    """
    sd: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params):
        sd[f"conv_layers.{i}.weight"] = np.asarray(layer["w"])[:, :, :, None]
        sd[f"conv_layers.{i}.bias"] = np.asarray(layer["b"])
    return sd


def critic_params_from_state_dict(sd: Mapping[str, object]) -> List[dict]:
    """Reference Critic state_dict -> our params pytree.

    ``conv_layers.{i}.weight (W_out, C_in, W_in, 1)`` -> ``w (W_out, C_in, W_in)``;
    ``layer_norms.{i}.{weight,bias}`` -> ``gn_scale / gn_bias``.
    """
    params = []
    i = 0
    while f"conv_layers.{i}.weight" in sd:
        w = _to_numpy(sd[f"conv_layers.{i}.weight"])
        b = _to_numpy(sd[f"conv_layers.{i}.bias"])
        layer = {"w": jnp.asarray(w[:, :, :, 0]), "b": jnp.asarray(b)}
        if f"layer_norms.{i}.weight" in sd:
            layer["gn_scale"] = jnp.asarray(_to_numpy(sd[f"layer_norms.{i}.weight"]))
            layer["gn_bias"] = jnp.asarray(_to_numpy(sd[f"layer_norms.{i}.bias"]))
        params.append(layer)
        i += 1
    if not params:
        raise ValueError("no conv_layers.* keys found in state_dict")
    return params
