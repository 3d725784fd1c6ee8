#!/usr/bin/env python3
"""Multi-process mesh demo/verification (SURVEY §2.11 "DCN across hosts").

Run one copy per process (ranks exchange over the coordinator):

    MAGNN_PLATFORM=cpu python scripts/multihost_demo.py \
        --coordinator localhost:8476 --num-processes 2 --process-id 0 &
    MAGNN_PLATFORM=cpu python scripts/multihost_demo.py \
        --coordinator localhost:8476 --num-processes 2 --process-id 1

Each process contributes ``--local-devices`` virtual CPU devices (or its
real local TPU chips) to ONE global mesh, then:

  1. psum sanity across every global device;
  2. an agent-sharded large-N expert rollout (parallel/large_n.py) over the
     global mesh, checked against the same rollout computed WITHOUT the
     mesh on this process's local device — the collectives (psum +
     all_gather row completion) must be exact;
  3. one data-parallel DAGGER training round (parallel/sharded.py) over the
     global ``env`` axis.

Prints one ``MULTIHOST_OK`` line with the checked numbers (identical on
every rank); tests/test_multihost.py asserts it from a 2-process run.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4,
                    help="virtual CPU devices contributed by this process")
    ap.add_argument("--n-agents", type=int, default=512)
    args = ap.parse_args(argv)

    if os.environ.get("MAGNN_PLATFORM", "cpu") == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.local_devices}"
            ).strip()
        os.environ.setdefault("MAGNN_PLATFORM", "cpu")

    from multiagent_gnn_policies_tpu.parallel.distributed import (
        initialize_distributed,
    )

    initialize_distributed(
        args.coordinator, args.num_processes, args.process_id,
        platform=os.environ.get("MAGNN_PLATFORM", "cpu"),
    )

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    rank, nproc = jax.process_index(), jax.process_count()
    n_dev = len(devs)
    assert nproc == args.num_processes, (nproc, args.num_processes)

    # 1. psum sanity over the global mesh
    mesh = Mesh(np.array(devs), ("agents",))
    out = jax.jit(jax.shard_map(
        lambda a: jax.lax.psum(a * (jax.lax.axis_index("agents") + 1.0),
                               "agents"),
        mesh=mesh, in_specs=P(), out_specs=P(),
    ))(jnp.ones(()))
    psum_val = float(out)
    want = n_dev * (n_dev + 1) / 2
    assert psum_val == want, (psum_val, want)

    # 2. agent-sharded large-N expert rollout over the global mesh vs the
    #    identical rollout on this process's local device (no mesh)
    from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams
    from multiagent_gnn_policies_tpu.parallel.large_n import rollout_large

    p = FlockingParams(n_agents=args.n_agents, episode_steps=8, max_resets=2)
    key = jax.random.key(7)
    r_mesh, _ = rollout_large(None, None, key, p, mesh=mesh,
                              expert_mode=True)
    r_local, _ = rollout_large(None, None, key, p, expert_mode=True)
    r_mesh = float(jnp.sum(r_mesh))
    r_local = float(jnp.sum(r_local))
    assert abs(r_mesh - r_local) < 1e-3 * max(1.0, abs(r_local)), (
        r_mesh, r_local,
    )

    # 3. one data-parallel DAGGER round over the global env axis
    from multiagent_gnn_policies_tpu.algos.imitation import ImitationConfig
    from multiagent_gnn_policies_tpu.envs.flocking import FlockingParams as FP
    from multiagent_gnn_policies_tpu.models.actor import ActorConfig
    from multiagent_gnn_policies_tpu.parallel.mesh import make_mesh
    from multiagent_gnn_policies_tpu.parallel.sharded import (
        ShardedImitationLearner,
    )

    train_mesh = make_mesh(n_env=n_dev, n_agent_shards=1)
    cfg = ImitationConfig(
        mode="dagger",
        actor=ActorConfig(n_s=6, n_a=2, hidden=(8, 8), k=2, ind_agg=0),
        env_name="FlockingRelative-v0",
        env=FP(n_agents=8, episode_steps=8),
        batch_size=8, buffer_size=128, updates_per_episode=2,
        n_train_episodes=n_dev, n_rollout_envs=n_dev, n_test_episodes=2,
        seed=0,
    )
    learner = ShardedImitationLearner(cfg, train_mesh)
    learner.params, learner.opt_state, learner.buffer, ep_r, loss = (
        learner._round(
            learner.params, learner.opt_state, learner.buffer,
            jax.random.key(0), jnp.asarray(0.9, jnp.float32),
        )
    )
    ep_r, loss = float(ep_r), float(loss)
    assert np.isfinite(ep_r) and np.isfinite(loss)

    print(
        f"MULTIHOST_OK rank={rank}/{nproc} devices={n_dev} "
        f"psum={psum_val:.1f} rollout={r_mesh:.4f} local={r_local:.4f} "
        f"round_reward={ep_r:.4f} loss={loss:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
