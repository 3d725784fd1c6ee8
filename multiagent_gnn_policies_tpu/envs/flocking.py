"""Fused flocking environments (the gym_flock L0 rebuild), pure JAX.

The reference depends on the external ``gym_flock`` package (not vendored;
its behavioral contract is pinned by the reference's call sites — SURVEY
§2.9): point-mass double-integrator swarm dynamics, a radius-graph adjacency,
a 6-feature relative observation, an analytic flocking expert controller
(Tanner 2003 potential + velocity consensus), and a velocity-disagreement
reward. Here that whole layer is a single fused, jittable function suite —
``reset``/``step``/``expert`` are pure, run on device, ``vmap`` over parallel
environments, and ``lax.scan`` over time, so data collection never touches
the host.

Contract replicated from the reference call sites:
  * observation = ``(values (N, 6), network (N, N))`` with zero diagonal
    (state_with_delay.py:24-26);
  * ``network`` is the degree-normalized radius-graph adjacency
    (mean-pooling GSO);
  * per-agent features (sums over radius neighbors j of agent i):
    ``[dvx, dx/r^4, dx/r^2, dvy, dy/r^4, dy/r^2]`` with ``d* = *_i - *_j``;
  * action = per-agent 2-D acceleration, clipped to ``max_accel``;
  * expert: ``u_i = -sum_j (v_i - v_j) - sum_j grad U(r_ij)`` with
    ``U(r) = 1/r^2 + log r^2`` truncated at unit range;
    ``centralized=True`` sums over all agents, else over radius neighbors
    (gnn_baseline.py:16, flocking_gym_test.py:28);
  * reward = negative total velocity variance (the CoRL 2020
    velocity-disagreement cost);
  * episodes have a fixed horizon (gym TimeLimit in the reference).

Config keys consumed (cfg/default.cfg): ``v_max, comm_radius, n_agents, dt``
via :meth:`FlockingParams.from_cfg` — the analogue of
``env.env.params_from_cfg(args)`` (train.py:20-21).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multiagent_gnn_policies_tpu.ops.graph import normalized_adjacency


@dataclasses.dataclass(frozen=True)
class FlockingParams:
    """Static environment parameters (hashable -> usable as jit static arg)."""

    n_agents: int = 100
    comm_radius: float = 1.0
    dt: float = 0.01
    v_max: float = 3.0          # initial per-agent velocity spread
    v_bias: Optional[float] = None  # shared velocity bias; default = v_max
    max_accel: float = 1.0      # action clip (gym_flock's max_accel)
    gain: float = 1.0           # action gain applied after the clip
    arena_r2_per_agent: float = 0.15  # squared arena radius per agent:
    # uniform-disc init with radius sqrt(0.15 * N) gives expected radius-1.0
    # degree ~6.7 for any N — the density at which the min-degree>=2
    # rejection test passes in a handful of draws (a "few % dense" graph in
    # a ~7-unit-diameter arena at N=100, SURVEY §5)
    min_separation: float = 0.1  # resample until no pair is closer than this
    min_degree: int = 2          # …and every agent has >= this many neighbors
    max_resets: int = 256        # bound for the rejection-sampling loop
    episode_steps: int = 200     # gym TimeLimit horizon
    # variant knobs
    n_leaders: int = 0           # FlockingLeader: first n agents ignore control
    two_flocks: bool = False     # FlockingTwoFlocks: two opposing groups
    dynamics_noise: float = 0.0  # FlockingStochastic: velocity noise std (per step)
    drag: float = 0.0            # FlockingAirsimAccel: linear velocity drag

    @property
    def bias(self) -> float:
        return self.v_max if self.v_bias is None else self.v_bias

    @classmethod
    def from_cfg(cls, args, **overrides) -> "FlockingParams":
        """Build from a configparser section — mirrors
        ``FlockingRelativeEnv.params_from_cfg`` (consumes v_max, comm_radius,
        n_agents, dt; SURVEY §2.9)."""
        kw = dict(
            n_agents=args.getint("n_agents"),
            comm_radius=args.getfloat("comm_radius"),
            dt=args.getfloat("dt"),
            v_max=args.getfloat("v_max"),
        )
        kw.update(overrides)
        return cls(**kw)


class EnvState(NamedTuple):
    """Dynamic env state pytree: ``x = [px, py, vx, vy]`` per agent."""

    x: jax.Array          # (N, 4)
    t: jax.Array          # () int32 step counter
    key: jax.Array        # PRNG key (used by stochastic variants)


class Obs(NamedTuple):
    values: jax.Array     # (N, 6)
    network: jax.Array    # (N, N) degree-normalized adjacency, zero diagonal


def _pairwise(x: jax.Array, comm_radius: float):
    """Shared N^2 geometry: diffs, squared distances (inf diagonal), adjacency."""
    diff = x[:, None, :] - x[None, :, :]                      # (N, N, 4)
    r2 = diff[..., 0] ** 2 + diff[..., 1] ** 2                # (N, N)
    n = x.shape[0]
    eye = jnp.eye(n, dtype=bool)
    r2 = jnp.where(eye, jnp.inf, r2)
    adj = (r2 < comm_radius * comm_radius).astype(x.dtype)     # zero diagonal
    return diff, r2, adj


def observe(x: jax.Array, p: FlockingParams) -> Obs:
    """The 6-feature relative observation + normalized adjacency."""
    diff, r2, adj = _pairwise(x, p.comm_radius)
    r2s = jnp.maximum(jnp.where(jnp.isinf(r2), 1.0, r2), COLLISION_R2_EPS)
    feats = jnp.stack(
        [
            diff[..., 2],                    # vx_i - vx_j
            diff[..., 0] / (r2s * r2s),      # dx / r^4
            diff[..., 0] / r2s,              # dx / r^2
            diff[..., 3],                    # vy_i - vy_j
            diff[..., 1] / (r2s * r2s),      # dy / r^4
            diff[..., 1] / r2s,              # dy / r^2
        ],
        axis=-1,
    )                                         # (N, N, 6)
    values = jnp.sum(feats * adj[..., None], axis=1)
    return Obs(values=values, network=normalized_adjacency(adj))


def expert_action(x: jax.Array, p: FlockingParams, centralized: bool = True) -> jax.Array:
    """Analytic flocking controller (Tanner 2003): velocity consensus +
    truncated collision/cohesion potential gradient.

    ``U(r^2) = 1/r^2 + log r^2``; ``grad_i U = 2 d (1/r^2 - 1/r^4)`` for the
    positional difference ``d = pos_i - pos_j``, truncated to zero beyond unit
    range. Decentralized mode restricts both sums to radius neighbors.
    """
    diff, r2, adj = _pairwise(x, p.comm_radius)
    r2s = jnp.maximum(jnp.where(jnp.isinf(r2), 1.0, r2), COLLISION_R2_EPS)
    grad_x = -2.0 * diff[..., 0] / (r2s * r2s) + 2.0 * diff[..., 0] / r2s
    grad_y = -2.0 * diff[..., 1] / (r2s * r2s) + 2.0 * diff[..., 1] / r2s
    in_range = (r2 <= 1.0).astype(x.dtype)    # potential truncation radius
    grad_x = grad_x * in_range
    grad_y = grad_y * in_range
    if centralized:
        vmask = jnp.ones_like(adj) * (1.0 - jnp.eye(x.shape[0], dtype=x.dtype))
    else:
        vmask = adj
        grad_x = grad_x * adj
        grad_y = grad_y * adj
    ux = -jnp.sum(diff[..., 2] * vmask + grad_x, axis=1)
    uy = -jnp.sum(diff[..., 3] * vmask + grad_y, axis=1)
    u = jnp.stack([ux, uy], axis=-1)
    return jnp.clip(u, -10.0, 10.0)


# Exact f32 agent co-location must degrade to an enormous-but-FINITE
# repulsive observation, not inf -> NaN: at N=1e6 some pair eventually
# lands on bit-identical f32 coordinates mid-episode (measured: key 11 at
# N=1M NaN'd at step ~50 with min pairwise r^2 -> 0 while key 12 ran the
# full horizon; coordinate resolution at |x|~300 is ~2e-5). The clamp only
# engages below r = 1e-6 -- 4000x under min_separation -- where the
# reference's own NumPy would emit inf; capped, 1/r^4 <= 1e24 stays finite
# through every f32 sum/product and the clipped action pushes the pair
# apart.
COLLISION_R2_EPS = 1e-12


def reward(x: jax.Array) -> jax.Array:
    """Negative total velocity variance (velocity-disagreement cost)."""
    v = x[:, 2:4]
    return -jnp.sum(jnp.var(v, axis=0))


# Above this swarm size the init uses the jittered lattice (and reset skips
# the rejection loop): whole-swarm rejection acceptance is
# P(no pair < min_separation) ~ exp(-0.033 N) — ~4% at N=100, vacuously 0
# by N~300, where the reference-semantics loop would burn max_resets full
# graph passes and then silently accept a violating sample anyway.
LATTICE_INIT_N = 512


def _lattice_regime(p: FlockingParams) -> bool:
    pitch = math.sqrt(math.pi * p.arena_r2_per_agent)
    return p.n_agents >= LATTICE_INIT_N and pitch > 1.05 * p.min_separation


def _lattice_positions(key: jax.Array, p: FlockingParams) -> jax.Array:
    """Blue-noise disc init for large swarms: a randomly rotated + offset
    square lattice with per-agent jitter, keeping the uniform disc's density
    (pitch^2 = disc area / N) while guaranteeing ``min_separation`` by
    construction (per-axis jitter amplitude (pitch - min_separation)/2, so
    any two sites can close their gap by at most pitch - min_separation).
    This is the distribution the small-N rejection sampler *conditions
    toward* (uniform given no close pairs), made constructive so reset is
    one graph pass instead of max_resets of them."""
    n = p.n_agents
    pitch = math.sqrt(math.pi * p.arena_r2_per_agent)
    jit_amp = 0.5 * (pitch - p.min_separation)
    r_max = math.sqrt(p.arena_r2_per_agent * n)
    m = int(math.ceil(2.0 * (r_max + pitch) / pitch)) + 1
    okey, akey, jkey = jax.random.split(key, 3)
    ii = (jnp.arange(m) - (m - 1) / 2.0) * pitch
    gx, gy = jnp.meshgrid(ii, ii, indexing="ij")
    pts = jnp.stack([gx.ravel(), gy.ravel()], -1)
    pts = pts + jax.random.uniform(okey, (2,), minval=-pitch / 2,
                                   maxval=pitch / 2)
    # the N lattice sites closest to the origin = a jagged-edged disc of
    # exactly the uniform init's radius/density
    _, idx = jax.lax.top_k(-jnp.sum(pts * pts, axis=-1), n)
    pts = pts[idx]
    pts = pts + jax.random.uniform(jkey, (n, 2), minval=-jit_amp,
                                   maxval=jit_amp)
    ang = jax.random.uniform(akey, (), maxval=2 * jnp.pi)
    c, s = jnp.cos(ang), jnp.sin(ang)
    # Rotate ELEMENTWISE on the VPU — never as a matmul. A (N,2)@(2,2)
    # dot lowers to the MXU at default precision, which truncates f32
    # inputs to bf16: at N=100k coordinates reach +-123 where bf16
    # resolution is ~0.5, so ~3k agent pairs quantized onto BIT-IDENTICAL
    # positions -> r^2 = 0 -> 1/r^4 = inf -> NaN rollouts (BENCH_r02's
    # overflow=99984 regression; CPU matmuls are f32, which is why every
    # CPU test passed). Elementwise mul/add stays f32 on the VPU.
    x0, y0 = pts[:, 0], pts[:, 1]
    return jnp.stack([c * x0 - s * y0, s * x0 + c * y0], axis=-1)


def _sample_positions(key: jax.Array, p: FlockingParams) -> jax.Array:
    if _lattice_regime(p):
        return _lattice_positions(key, p)
    n = p.n_agents
    r2_max = p.arena_r2_per_agent * n
    lkey, akey = jax.random.split(key)
    length = jnp.sqrt(jax.random.uniform(lkey, (n,), maxval=r2_max))
    angle = jax.random.uniform(akey, (n,), maxval=2 * jnp.pi)
    return jnp.stack([length * jnp.cos(angle), length * jnp.sin(angle)], -1)


def _init_candidate(key: jax.Array, p: FlockingParams) -> jax.Array:
    """One candidate initial state (positions + biased velocities)."""
    pkey, bkey, vkey = jax.random.split(key, 3)
    pos = _sample_positions(pkey, p)
    bias = jax.random.uniform(bkey, (2,), minval=-p.bias, maxval=p.bias)
    vel = jax.random.uniform(vkey, (p.n_agents, 2), minval=-p.v_max, maxval=p.v_max) + bias

    if p.two_flocks:
        # two spatially separated groups with opposing velocity biases
        n = p.n_agents
        half = n // 2
        offset = jnp.sqrt(p.arena_r2_per_agent * n)
        side = jnp.where(jnp.arange(n) < half, -1.0, 1.0)[:, None]
        pos = pos * 0.5 + side * jnp.array([[offset, 0.0]])
        vel = vel - bias + side * jnp.array([[0.0, 0.0]]) + (-side) * bias * 0.5

    if p.n_leaders > 0:
        # leaders move with exactly the shared bias velocity
        is_leader = (jnp.arange(p.n_agents) < p.n_leaders)[:, None]
        vel = jnp.where(is_leader, bias[None, :], vel)

    return jnp.concatenate([pos, vel], axis=-1)


def _init_ok(x: jax.Array, p: FlockingParams) -> jax.Array:
    """gym_flock's acceptance test: min pairwise distance and min degree."""
    _, r2, adj = _pairwise(x, p.comm_radius)
    min_d2 = jnp.min(jnp.where(jnp.isinf(r2), jnp.inf, r2))
    degree = jnp.min(jnp.sum(adj, axis=1))
    return (min_d2 >= p.min_separation**2) & (degree >= p.min_degree)


def reset(key: jax.Array, p: FlockingParams) -> Tuple[EnvState, Obs]:
    """Rejection-sample an initial configuration (bounded loop, jittable).

    In the lattice regime (``n_agents >= LATTICE_INIT_N``) the candidate
    satisfies min-separation by construction and the rejection loop is
    skipped entirely — one graph pass instead of up to ``max_resets``."""
    if _lattice_regime(p):
        key, sub = jax.random.split(key)
        x = _init_candidate(sub, p)
        state = EnvState(x=x, t=jnp.zeros((), jnp.int32), key=key)
        return state, observe(x, p)

    def cond(carry):
        i, _, ok, _ = carry
        return (~ok) & (i < p.max_resets)

    def body(carry):
        i, key, _, _ = carry
        key, sub = jax.random.split(key)
        x = _init_candidate(sub, p)
        return i + 1, key, _init_ok(x, p), x

    key, sub = jax.random.split(key)
    x0 = _init_candidate(sub, p)
    _, key, _, x = jax.lax.while_loop(cond, body, (0, key, _init_ok(x0, p), x0))
    state = EnvState(x=x, t=jnp.zeros((), jnp.int32), key=key)
    return state, observe(x, p)


def step(
    state: EnvState, action: jax.Array, p: FlockingParams
) -> Tuple[EnvState, Obs, jax.Array, jax.Array]:
    """Double-integrator step. Returns ``(state', obs', reward, done)``."""
    u = jnp.clip(action, -p.max_accel, p.max_accel) * p.gain

    if p.n_leaders > 0:
        is_leader = (jnp.arange(p.n_agents) < p.n_leaders)[:, None]
        u = jnp.where(is_leader, 0.0, u)

    x = state.x
    pos = x[:, 0:2] + x[:, 2:4] * p.dt + 0.5 * u * p.dt * p.dt
    vel = x[:, 2:4] + u * p.dt

    if p.drag > 0.0:
        vel = vel * (1.0 - p.drag * p.dt)

    key = state.key
    if p.dynamics_noise > 0.0:
        key, nkey = jax.random.split(key)
        vel = vel + p.dynamics_noise * jax.random.normal(nkey, vel.shape, vel.dtype)

    x = jnp.concatenate([pos, vel], axis=-1)
    t = state.t + 1
    new_state = EnvState(x=x, t=t, key=key)
    obs = observe(x, p)
    done = t >= p.episode_steps
    return new_state, obs, reward(x), done


@dataclasses.dataclass(frozen=True)
class FlockingEnv:
    """Bundles the pure functions with their params, gym_flock-style naming.

    All methods are jit/vmap-compatible; ``params`` is static.
    """

    params: FlockingParams
    centralized_expert: bool = True

    def reset(self, key):
        return reset(key, self.params)

    def step(self, state, action):
        return step(state, action, self.params)

    def controller(self, state, centralized: Optional[bool] = None):
        c = self.centralized_expert if centralized is None else centralized
        return expert_action(state.x, self.params, centralized=c)

    def observe(self, state):
        return observe(state.x, self.params)

    @property
    def n_agents(self) -> int:
        return self.params.n_agents


def _relative(params: FlockingParams) -> FlockingParams:
    return params


def _leader(params: FlockingParams) -> FlockingParams:
    return dataclasses.replace(params, n_leaders=max(params.n_leaders, 2))


def _two_flocks(params: FlockingParams) -> FlockingParams:
    return dataclasses.replace(params, two_flocks=True)


def _stochastic(params: FlockingParams) -> FlockingParams:
    return dataclasses.replace(
        params, dynamics_noise=params.dynamics_noise or 0.05
    )


def _airsim_accel(params: FlockingParams) -> FlockingParams:
    # AirSim's acceleration-control interface is approximated by a
    # double integrator with linear drag; the hardware-in-the-loop AirSim
    # transport of the reference (airsim_test.py) is out of scope on TPU.
    return dataclasses.replace(params, drag=params.drag or 0.1)


ENV_REGISTRY: Dict[str, Callable[[FlockingParams], FlockingParams]] = {
    "FlockingRelative-v0": _relative,
    "FlockingLeader-v0": _leader,
    "FlockingTwoFlocks-v0": _two_flocks,
    "FlockingStochastic-v0": _stochastic,
    "FlockingAirsimAccel-v0": _airsim_accel,
}


def make_env(name: str, params: FlockingParams = FlockingParams()) -> FlockingEnv:
    """The ``gym.make`` analogue — env ids match the reference's cfgs."""
    if name not in ENV_REGISTRY:
        raise KeyError(
            f"unknown env '{name}'; known: {sorted(ENV_REGISTRY)}"
        )
    return FlockingEnv(params=ENV_REGISTRY[name](params))
