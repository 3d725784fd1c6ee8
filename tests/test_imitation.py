"""End-to-end smoke + learning tests for cloning and DAGGER (tiny configs)."""

import numpy as np
import pytest

from multiagent_gnn_policies_tpu.algos.imitation import (
    ImitationConfig,
    ImitationLearner,
)
from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
from multiagent_gnn_policies_tpu.models.actor import ActorConfig


def tiny_cfg(mode, **kw):
    defaults = dict(
        mode=mode,
        actor=ActorConfig(n_s=6, n_a=2, hidden=(16, 16), k=2, ind_agg=0),
        env_name="FlockingRelative-v0",
        env=FlockingParams(n_agents=12, episode_steps=30),
        batch_size=8,
        buffer_size=300,
        updates_per_episode=20,
        actor_lr=3e-4,
        n_train_episodes=6,
        test_interval=3,
        n_test_episodes=3,
        seed=0,
    )
    defaults.update(kw)
    return ImitationConfig(**defaults)


@pytest.mark.parametrize("mode", ["cloning", "dagger"])
def test_trains_and_returns_stats(mode):
    learner = ImitationLearner(tiny_cfg(mode))
    stats = learner.train()
    assert set(stats) == {"mean", "std"}
    assert np.isfinite(stats["mean"]) and np.isfinite(stats["std"])


def test_cloning_improves_over_untrained():
    cfg = tiny_cfg("cloning", n_train_episodes=20,
                   updates_per_episode=60, n_test_episodes=5)
    learner = ImitationLearner(cfg)
    before, _ = learner.evaluate()
    stats = learner.train()
    # the trained (best) policy must beat the random-init policy
    assert stats["mean"] > before


def test_dagger_beta_schedule_floor():
    cfg = tiny_cfg("dagger")
    beta, betas = 1.0, []
    for _ in range(300):
        beta = max(beta * cfg.beta_coeff, cfg.beta_floor)
        betas.append(beta)
    assert betas[0] == pytest.approx(0.993)
    assert betas[-1] == 0.5  # the reference's non-standard floor (gnn_dagger.py:148)


def test_deterministic_given_seed():
    s1 = ImitationLearner(tiny_cfg("dagger", n_train_episodes=2)).train()
    s2 = ImitationLearner(tiny_cfg("dagger", n_train_episodes=2)).train()
    assert s1["mean"] == pytest.approx(s2["mean"], abs=1e-5)


def test_parallel_rollout_envs():
    cfg = tiny_cfg("cloning", n_rollout_envs=3, n_train_episodes=6)
    learner = ImitationLearner(cfg)
    stats = learner.train()
    assert np.isfinite(stats["mean"])
    assert int(learner.buffer.size) == min(300, 6 // 3 * 3 * 30)


def test_checkpoint_roundtrip(tmp_path):
    from multiagent_gnn_policies_tpu.utils import checkpoint

    learner = ImitationLearner(tiny_cfg("cloning", n_train_episodes=2))
    learner.train(save_path=str(tmp_path / "actor"))
    import jax
    like = jax.tree.map(np.asarray, learner.params)
    loaded = checkpoint.load(str(tmp_path / "actor") + ".npz", like)
    # structure preserved; arrays finite
    for a, b in zip(loaded, learner.params):
        assert a["w"].shape == np.asarray(b["w"]).shape


def test_checkpoint_torch_export_loads_in_reference(tmp_path, reference_path):
    torch = pytest.importorskip("torch")
    import sys
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    from learner.actor import Actor as RefActor

    learner = ImitationLearner(tiny_cfg("cloning", n_train_episodes=1))
    path = str(tmp_path / "actor_export")
    learner.train(save_path=path)
    sd = torch.load(path, map_location="cpu")
    ref = RefActor(6, 2, [16, 16], 2, 0)
    ref.load_state_dict(sd)  # raises on any shape/name mismatch
