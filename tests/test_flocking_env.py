"""Behavioral tests for the fused flocking environment.

Oracle: an independent NumPy transcription of the gym_flock contract
(SURVEY §2.9) for the observation features and expert controller, plus
physics invariants (golden trajectories, conservation, expert convergence).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiagent_gnn_policies_tpu.envs import flocking as FL

P = FL.FlockingParams(n_agents=20, episode_steps=50)


def np_observe(x, comm_radius):
    """Independent NumPy oracle for the 6-feature observation."""
    n = x.shape[0]
    diff = x[:, None, :] - x[None, :, :]
    r2 = diff[..., 0] ** 2 + diff[..., 1] ** 2
    np.fill_diagonal(r2, np.inf)
    adj = (r2 < comm_radius**2).astype(np.float64)
    feats = np.stack(
        [diff[..., 2], diff[..., 0] / r2**2, diff[..., 0] / r2,
         diff[..., 3], diff[..., 1] / r2**2, diff[..., 1] / r2], axis=-1)
    feats = np.where(np.isfinite(feats), feats, 0.0)
    values = (feats * adj[..., None]).sum(1)
    deg = np.maximum(adj.sum(1, keepdims=True), 1.0)
    return values, adj / deg


def np_expert(x, comm_radius, centralized):
    n = x.shape[0]
    diff = x[:, None, :] - x[None, :, :]
    r2 = diff[..., 0] ** 2 + diff[..., 1] ** 2
    np.fill_diagonal(r2, np.inf)
    adj = (r2 < comm_radius**2).astype(np.float64)
    with np.errstate(divide="ignore"):
        gx = -2 * diff[..., 0] / r2**2 + 2 * diff[..., 0] / r2
        gy = -2 * diff[..., 1] / r2**2 + 2 * diff[..., 1] / r2
    trunc = (r2 <= 1.0).astype(np.float64)
    gx, gy = gx * trunc, gy * trunc
    vmask = 1.0 - np.eye(n) if centralized else adj
    if not centralized:
        gx, gy = gx * adj, gy * adj
    ux = -(diff[..., 2] * vmask + gx).sum(1)
    uy = -(diff[..., 3] * vmask + gy).sum(1)
    return np.clip(np.stack([ux, uy], -1), -10, 10)


def _some_state(seed=0, p=P):
    state, obs = FL.reset(jax.random.key(seed), p)
    return state, obs


def test_reset_satisfies_contract():
    state, obs = _some_state()
    n = P.n_agents
    assert obs.values.shape == (n, 6)
    assert obs.network.shape == (n, n)
    # zero diagonal (asserted by the reference at state_with_delay.py:26)
    np.testing.assert_allclose(np.asarray(jnp.diag(obs.network)), 0.0)
    # min separation and min degree hold
    x = np.asarray(state.x)
    d2 = ((x[:, None, :2] - x[None, :, :2]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    assert d2.min() >= P.min_separation**2
    adj = d2 < P.comm_radius**2
    assert adj.sum(1).min() >= P.min_degree


def test_observation_matches_numpy_oracle():
    state, obs = _some_state(1)
    x = np.asarray(state.x, dtype=np.float64)
    want_vals, want_net = np_observe(x, P.comm_radius)
    np.testing.assert_allclose(np.asarray(obs.values), want_vals, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(obs.network), want_net, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("centralized", [True, False])
def test_expert_matches_numpy_oracle(centralized):
    state, _ = _some_state(2)
    x = np.asarray(state.x, dtype=np.float64)
    got = np.asarray(FL.expert_action(state.x, P, centralized=centralized))
    want = np_expert(x, P.comm_radius, centralized)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_zero_action_is_ballistic():
    state, _ = _some_state(3)
    x0 = np.asarray(state.x)
    s, _, _, _ = FL.step(state, jnp.zeros((P.n_agents, 2)), P)
    x1 = np.asarray(s.x)
    np.testing.assert_allclose(x1[:, :2], x0[:, :2] + x0[:, 2:] * P.dt, rtol=1e-5)
    np.testing.assert_allclose(x1[:, 2:], x0[:, 2:], rtol=1e-6)


def test_action_clip_and_integration():
    state, _ = _some_state(4)
    big = jnp.full((P.n_agents, 2), 100.0)  # clips to max_accel
    s, _, _, _ = FL.step(state, big, P)
    x0, x1 = np.asarray(state.x), np.asarray(s.x)
    a = P.max_accel * P.gain
    np.testing.assert_allclose(x1[:, 2:], x0[:, 2:] + a * P.dt, rtol=1e-5)
    np.testing.assert_allclose(
        x1[:, :2], x0[:, :2] + x0[:, 2:] * P.dt + 0.5 * a * P.dt**2, rtol=1e-5)


def test_done_after_horizon():
    state, _ = _some_state(5)
    done = False
    for _ in range(P.episode_steps):
        state, _, _, done = FL.step(state, jnp.zeros((P.n_agents, 2)), P)
    assert bool(done)


def test_expert_rollout_reduces_velocity_disagreement():
    """The centralized expert must drive the swarm toward consensus —
    the qualitative claim of the CoRL 2020 paper."""
    p = FL.FlockingParams(n_agents=30, episode_steps=400, dt=0.01)
    env = FL.make_env("FlockingRelative-v0", p)
    state, _ = env.reset(jax.random.key(0))

    @jax.jit
    def run(state):
        def body(s, _):
            u = env.controller(s)
            s, _, r, _ = env.step(s, u)
            return s, r
        return jax.lax.scan(body, state, None, length=400)

    _, rewards = run(state)
    r = np.asarray(rewards)
    assert r[-1] > r[0]           # cost shrinks
    assert r[-1] > -0.5           # near-consensus by the end
    assert np.isfinite(r).all()


def test_reward_is_negative_velocity_variance():
    state, _ = _some_state(6)
    x = np.asarray(state.x)
    want = -np.var(x[:, 2], ddof=0) - np.var(x[:, 3], ddof=0)
    got = float(FL.reward(state.x))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_leader_variant_leaders_ignore_control():
    p = FL.FlockingParams(n_agents=10, n_leaders=2)
    state, _ = FL.reset(jax.random.key(0), p)
    v0 = np.asarray(state.x)[:2, 2:4]
    s, _, _, _ = FL.step(state, jnp.ones((10, 2)), p)
    np.testing.assert_allclose(np.asarray(s.x)[:2, 2:4], v0, rtol=1e-6)
    # followers do accelerate
    assert not np.allclose(np.asarray(s.x)[2:, 2:4], np.asarray(state.x)[2:, 2:4])


def test_two_flocks_variant_has_two_groups():
    p = FL.FlockingParams(n_agents=20, two_flocks=True, min_degree=1)
    state, _ = FL.reset(jax.random.key(1), p)
    x = np.asarray(state.x)
    # groups are separated in x and have different mean velocities
    assert x[:10, 0].mean() < x[10:, 0].mean()
    assert not np.allclose(x[:10, 2:].mean(0), x[10:, 2:].mean(0), atol=1e-3)


def test_stochastic_variant_is_random_but_seeded():
    p = FL.FlockingParams(n_agents=10, dynamics_noise=0.05)
    state, _ = FL.reset(jax.random.key(2), p)
    s1, _, _, _ = FL.step(state, jnp.zeros((10, 2)), p)
    s2, _, _, _ = FL.step(state, jnp.zeros((10, 2)), p)
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x))  # same key
    s3, _, _, _ = FL.step(s1, jnp.zeros((10, 2)), p)
    assert not np.allclose(np.asarray(s3.x[:, 2:]), np.asarray(s1.x[:, 2:]))


def test_registry_and_unknown_env():
    for name in FL.ENV_REGISTRY:
        env = FL.make_env(name, FL.FlockingParams(n_agents=8, min_degree=1))
        state, obs = env.reset(jax.random.key(0))
        assert obs.values.shape == (8, 6)
    with pytest.raises(KeyError):
        FL.make_env("Nope-v0")


def test_vmapped_parallel_envs():
    p = FL.FlockingParams(n_agents=12)
    B = 4
    keys = jax.random.split(jax.random.key(0), B)
    states, obs = jax.vmap(lambda k: FL.reset(k, p))(keys)
    assert states.x.shape == (B, 12, 4)
    acts = jnp.zeros((B, 12, 2))
    states2, obs2, r, d = jax.vmap(lambda s, a: FL.step(s, a, p))(states, acts)
    assert r.shape == (B,)
    assert obs2.network.shape == (B, 12, 12)


def test_lattice_init_separation_and_density():
    """Large-N init (jittered lattice): min pairwise separation holds by
    CONSTRUCTION (the rejection sampler can't deliver it at this N — its
    acceptance is ~exp(-0.033 N)), and the density matches the uniform
    disc's (mean radius-1 degree ~ 1/arena_r2_per_agent = 6.7)."""
    import numpy as np

    p = FL.FlockingParams(n_agents=600)
    assert FL._lattice_regime(p)
    state, obs = FL.reset(jax.random.key(3), p)
    x = np.asarray(state.x)
    diff = x[:, None, :2] - x[None, :, :2]
    d2 = (diff**2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    assert np.sqrt(d2.min()) >= p.min_separation - 1e-6
    deg = (d2 < p.comm_radius**2).sum(1)
    assert 5.0 < deg.mean() < 8.5
    # radius of the point set matches the uniform disc's
    r = np.sqrt((x[:, :2] ** 2).sum(-1).max())
    assert abs(r - np.sqrt(p.arena_r2_per_agent * p.n_agents)) < 2.0
    # velocities keep the small-N distribution (uniform + shared bias)
    assert np.abs(x[:, 2:4]).max() <= 2 * p.v_max + 1e-5


def test_small_n_reset_unchanged_by_lattice_regime():
    """N < LATTICE_INIT_N keeps the reference rejection semantics."""
    p = FL.FlockingParams(n_agents=32)
    assert not FL._lattice_regime(p)
    state, _ = FL.reset(jax.random.key(0), p)
    assert state.x.shape == (32, 4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
