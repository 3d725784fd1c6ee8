from multiagent_gnn_policies_tpu.envs.flocking import (  # noqa: F401
    FlockingParams,
    FlockingEnv,
    EnvState,
    make_env,
    ENV_REGISTRY,
)
