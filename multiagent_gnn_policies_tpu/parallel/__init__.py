from multiagent_gnn_policies_tpu.parallel.mesh import make_mesh  # noqa: F401
from multiagent_gnn_policies_tpu.parallel.sharded import (  # noqa: F401
    ShardedImitationLearner,
    sharded_policy_forward,
)
