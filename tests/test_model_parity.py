"""Activation-parity tests against the PyTorch reference.

The reference's ``learner/actor.py`` / ``learner/critic.py`` (torch, CPU) are
imported from the read-only checkout and used purely as numerical oracles —
including the shipped pretrained checkpoint
``models/actor_FlockingRelative-v0_dagger_k3`` (SURVEY §2.1). Skipped
gracefully if torch or the checkout is unavailable.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from multiagent_gnn_policies_tpu.models.actor import ActorConfig, actor_forward
from multiagent_gnn_policies_tpu.models.critic import CriticConfig, critic_forward
from multiagent_gnn_policies_tpu.models import torch_import

N, K, NS, NA = 10, 3, 6, 2
HID = (32, 32)


def _ref_modules(reference_path):
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    from learner import actor as ref_actor
    from learner import critic as ref_critic
    # The reference critic references F without importing it
    # (learner/critic.py:82, latent bug per SURVEY §2.3) — patch the module
    # namespace so the oracle can run.
    import torch.nn.functional as F
    ref_critic.F = F
    return ref_actor, ref_critic


def _random_inputs(rng, batch, n=N, k=K, ns=NS):
    """Random delayed state/GSO in reference layout (B,K,F,N)/(B,K,N,N)."""
    delay_state_fn = rng.standard_normal((batch, k, ns, n)).astype(np.float32)
    gso = rng.uniform(0, 1, size=(batch, k, n, n)).astype(np.float32)
    return delay_state_fn, gso


def _to_ours(delay_state_fn, gso):
    # (B,K,F,N) -> (B,K,N,F)
    return jnp.asarray(delay_state_fn.transpose(0, 1, 3, 2)), jnp.asarray(gso)


@pytest.mark.parametrize("ind_agg", [0, 1])
def test_actor_matches_reference_random_weights(reference_path, ind_agg):
    ref_actor, _ = _ref_modules(reference_path)
    torch.manual_seed(0)
    ref = ref_actor.Actor(NS, NA, list(HID), K, ind_agg)
    params = torch_import.actor_params_from_state_dict(ref.state_dict())
    cfg = ActorConfig(NS, NA, HID, K, ind_agg)

    rng = np.random.default_rng(0)
    ds_fn, gso = _random_inputs(rng, batch=4)
    with torch.no_grad():
        want = ref(torch.from_numpy(ds_fn), torch.from_numpy(gso)).numpy()
    ds, g = _to_ours(ds_fn, gso)
    got = np.asarray(actor_forward(params, cfg, ds, g))
    # reference output (B,1,nA,N) vs ours (B,N,nA)
    want_bna = want[:, 0].transpose(0, 2, 1)
    np.testing.assert_allclose(got, want_bna, rtol=1e-5, atol=1e-5)


def test_actor_matches_pretrained_dagger_checkpoint(reference_path):
    ref_actor, _ = _ref_modules(reference_path)
    sd = torch.load(
        reference_path + "/models/actor_FlockingRelative-v0_dagger_k3",
        map_location="cpu",
    )
    ref = ref_actor.Actor(NS, NA, [32, 32], 3, 0)
    ref.load_state_dict(sd)
    params = torch_import.actor_params_from_state_dict(sd)
    cfg = ActorConfig(NS, NA, (32, 32), 3, 0)

    rng = np.random.default_rng(1)
    n_agents = 100
    ds_fn = rng.standard_normal((2, 3, NS, n_agents)).astype(np.float32)
    gso = rng.uniform(0, 0.2, size=(2, 3, n_agents, n_agents)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(ds_fn), torch.from_numpy(gso)).numpy()
    ds, g = _to_ours(ds_fn, gso)
    got = np.asarray(actor_forward(params, cfg, ds, g))
    np.testing.assert_allclose(got, want[:, 0].transpose(0, 2, 1),
                               rtol=1e-5, atol=1e-5)


def test_actor_preaggregated_path_equivalent():
    """ind_agg=0: feeding gso^T·x with delay_gso=None must match."""
    from multiagent_gnn_policies_tpu.models.actor import init_actor
    from multiagent_gnn_policies_tpu.ops.graph import aggregate
    import jax

    cfg = ActorConfig(NS, NA, HID, K, 0)
    params = init_actor(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    ds_fn, gso = _random_inputs(rng, batch=3)
    ds, g = _to_ours(ds_fn, gso)
    full = actor_forward(params, cfg, ds, g)
    pre = actor_forward(params, cfg, aggregate(g, ds), None)
    np.testing.assert_allclose(np.asarray(full), np.asarray(pre),
                               rtol=1e-5, atol=1e-5)


def test_critic_matches_reference_random_weights(reference_path):
    _, ref_critic = _ref_modules(reference_path)
    torch.manual_seed(1)
    ref = ref_critic.Critic(NS, NA, list(HID), K)
    params = torch_import.critic_params_from_state_dict(ref.state_dict())
    cfg = CriticConfig(NS, NA, HID, K)

    rng = np.random.default_rng(3)
    B = 4
    states_fn = rng.standard_normal((B, 1, NS, N)).astype(np.float32)
    actions_fn = rng.standard_normal((B, 1, NA, N)).astype(np.float32)
    gso = rng.uniform(0, 1, size=(B, K, N, N)).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(states_fn),
            torch.from_numpy(actions_fn),
            torch.from_numpy(gso),
        ).numpy()  # (B, 1, N)
    got = np.asarray(
        critic_forward(
            params, cfg,
            jnp.asarray(states_fn[:, 0].transpose(0, 2, 1)),
            jnp.asarray(actions_fn[:, 0].transpose(0, 2, 1)),
            jnp.asarray(gso),
        )
    )
    np.testing.assert_allclose(got, want[:, 0], rtol=1e-4, atol=1e-4)


def test_actor_roundtrip_export(reference_path):
    """params -> state_dict -> params is the identity (checkpoint export)."""
    import jax
    from multiagent_gnn_policies_tpu.models.actor import init_actor

    cfg = ActorConfig(NS, NA, HID, K, 0)
    params = init_actor(jax.random.key(7), cfg)
    sd = torch_import.actor_state_dict_from_params(params)
    back = torch_import.actor_params_from_state_dict(sd)
    for a, b in zip(params, back):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
        np.testing.assert_array_equal(np.asarray(a["b"]), np.asarray(b["b"]))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
