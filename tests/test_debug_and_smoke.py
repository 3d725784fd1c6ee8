"""Tests for the numerical sanitizers (utils/debug.py) and the env smoke /
render CLIs (scripts/smoke_env.py, scripts/render_trajectory.py) — the
framework equivalents of the reference's manual smoke scripts
(reference flocking_gym_test.py, airsim_test.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


# ---------------------------------------------------------------------------
# utils/debug.py
# ---------------------------------------------------------------------------

def test_check_finite_passes_on_finite_tree():
    from multiagent_gnn_policies_tpu.utils.debug import check_finite

    check_finite({"w": np.ones((3, 3)), "b": np.zeros(3), "n": np.int32(4)})


def test_check_finite_raises_with_leaf_path():
    from multiagent_gnn_policies_tpu.utils.debug import check_finite

    tree = {"layer0": {"w": np.array([1.0, np.nan])}}
    with pytest.raises(FloatingPointError, match="layer0.*w"):
        check_finite(tree, "params")


def test_check_finite_ignores_integer_leaves():
    from multiagent_gnn_policies_tpu.utils.debug import check_finite

    check_finite({"counts": np.array([1, 2, 3], dtype=np.int64)})


def test_assert_finite_raises_inside_jit():
    import jax
    import jax.numpy as jnp
    from multiagent_gnn_policies_tpu.utils.debug import assert_finite

    @jax.jit
    def f(x):
        return assert_finite(x / x, "ratio")  # 0/0 -> nan

    f(jnp.ones(4))  # finite path ok
    # the callback's FloatingPointError may surface wrapped in the runtime's
    # callback-failure error depending on backend/dispatch mode
    with pytest.raises(Exception, match="non-finite values in ratio"):
        f(jnp.zeros(4))
        jax.effects_barrier()


def test_nan_debug_restores_flag():
    import jax
    from multiagent_gnn_policies_tpu.utils.debug import nan_debug

    before = jax.config.jax_debug_nans
    with nan_debug():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_save_training_state_rejects_nan_params(tmp_path):
    import jax
    import jax.numpy as jnp
    from multiagent_gnn_policies_tpu.algos.imitation import (
        ImitationConfig,
        ImitationLearner,
    )
    from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
    from multiagent_gnn_policies_tpu.models.actor import ActorConfig

    cfg = ImitationConfig(
        mode="cloning",
        actor=ActorConfig(n_s=6, n_a=2, hidden=(8,), k=2, ind_agg=0),
        env_name="FlockingRelative-v0",
        env=FlockingParams(n_agents=8, episode_steps=4),
        batch_size=2, buffer_size=16, updates_per_episode=1,
        n_train_episodes=1, test_interval=1, n_test_episodes=1, seed=0,
    )
    learner = ImitationLearner(cfg)
    learner.params = jax.tree.map(
        lambda x: jnp.full_like(x, jnp.nan), learner.params
    )
    with pytest.raises(FloatingPointError, match="params"):
        learner.save_training_state(str(tmp_path / "state.npz"))


# ---------------------------------------------------------------------------
# scripts/smoke_env.py + scripts/render_trajectory.py
# ---------------------------------------------------------------------------

def test_smoke_env_all_envs_and_trajectory_roundtrip(tmp_path):
    import smoke_env

    traj = tmp_path / "traj.npz"
    rc = smoke_env.main([
        "--episodes", "1", "--n-agents", "12", "--dt", "0.05",
        "--save", str(traj),
    ])
    assert rc == 0
    with np.load(traj) as z:
        x, reward = z["x"], z["reward"]
    assert x.ndim == 3 and x.shape[1:] == (12, 4)
    assert reward.shape == (x.shape[0],)
    assert np.isfinite(x).all()

    import render_trajectory

    png = tmp_path / "out.png"
    assert render_trajectory.main([str(traj), str(png)]) == 0
    assert png.stat().st_size > 0


def test_smoke_env_decentralized_single_env():
    import smoke_env

    rc = smoke_env.main([
        "--env", "FlockingAirsimAccel-v0", "--episodes", "1",
        "--n-agents", "12", "--dt", "0.05", "--decentralized",
    ])
    assert rc == 0


def test_smoke_env_cli_runs_as_subprocess():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "smoke_env.py"),
         "--env", "FlockingRelative-v0", "--episodes", "1",
         "--n-agents", "10", "--dt", "0.05"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "FlockingRelative-v0 ep0" in out.stdout
