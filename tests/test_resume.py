"""Crash-safe resume: interrupting training at a checkpoint and restarting
from the saved state must reproduce the uninterrupted run exactly (params,
optimizer, buffer, PRNG stream, beta schedule, best-eval tracking)."""

import numpy as np
import jax
import pytest

from multiagent_gnn_policies_tpu.algos.imitation import (
    ImitationConfig,
    ImitationLearner,
)
from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
from multiagent_gnn_policies_tpu.models.actor import ActorConfig


def _cfg(mode, n_episodes):
    return ImitationConfig(
        mode=mode,
        actor=ActorConfig(n_s=6, n_a=2, hidden=(8,), k=2, ind_agg=0),
        env_name="FlockingRelative-v0",
        env=FlockingParams(n_agents=12, episode_steps=8),
        batch_size=4, buffer_size=64, updates_per_episode=3,
        n_train_episodes=n_episodes, test_interval=2, n_test_episodes=2,
        seed=3,
    )


@pytest.mark.parametrize("mode", ["dagger", "cloning"])
def test_resume_matches_uninterrupted(tmp_path, mode):
    state = str(tmp_path / "state.npz")

    full = ImitationLearner(_cfg(mode, 6))
    stats_full = full.train()

    # run 1: preempted after round 3; the state file captures everything
    part = ImitationLearner(_cfg(mode, 6))
    out = part.train(state_path=state, stop_after=3)
    assert out["interrupted"]

    # run 2: fresh process resumes from the state file and finishes
    rest = ImitationLearner(_cfg(mode, 6))
    stats_rest = rest.train(state_path=state)

    assert rest._rnd == 6
    for a, b in zip(
        jax.tree_util.tree_leaves(full.params),
        jax.tree_util.tree_leaves(rest.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(stats_rest["mean"], stats_full["mean"],
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(full.buffer.size), np.asarray(rest.buffer.size)
    )


def test_state_roundtrip(tmp_path):
    lrn = ImitationLearner(_cfg("dagger", 2))
    lrn.train()
    p = str(tmp_path / "s.npz")
    lrn.save_training_state(p)
    fresh = ImitationLearner(_cfg("dagger", 2))
    fresh.load_training_state(p)
    assert fresh._rnd == lrn._rnd
    assert fresh._beta == lrn._beta
    for a, b in zip(
        jax.tree_util.tree_leaves(lrn.training_state()),
        jax.tree_util.tree_leaves(fresh.training_state()),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_without_buffer(tmp_path):
    """checkpoint_buffer = False: cheap checkpoints (no multi-GB replay
    fetch) — resume restarts with an empty buffer and keeps training;
    params/opt/PRNG/schedule still restore exactly."""
    import dataclasses

    state = str(tmp_path / "state_nobuf.npz")
    cfg = dataclasses.replace(_cfg("dagger", 6), checkpoint_buffer=False)

    part = ImitationLearner(cfg)
    out = part.train(state_path=state, stop_after=3)
    assert out["interrupted"]
    params_at_stop = jax.tree.map(np.asarray, part.params)

    # params at the stop point restore exactly; the buffer starts empty
    # (load this BEFORE resuming — train() rewrites the state at exit)
    lrn2 = ImitationLearner(cfg)
    lrn2.load_training_state(state)
    for a, b in zip(jax.tree_util.tree_leaves(params_at_stop),
                    jax.tree_util.tree_leaves(lrn2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(lrn2.buffer.size) == 0

    # the state file held no buffer: much smaller than the exact variant
    import os
    full_state = str(tmp_path / "state_full.npz")
    full = ImitationLearner(_cfg("dagger", 6))
    full.train(state_path=full_state, stop_after=3)
    assert os.path.getsize(state) < os.path.getsize(full_state)

    # and the resumed run completes
    rest = ImitationLearner(cfg)
    rest.train(state_path=state)
    assert rest._rnd == 6
