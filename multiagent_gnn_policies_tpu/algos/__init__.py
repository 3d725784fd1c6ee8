from multiagent_gnn_policies_tpu.algos.replay import (  # noqa: F401
    ReplayBuffer,
    replay_init,
    replay_insert_batch,
    replay_sample,
)
from multiagent_gnn_policies_tpu.algos.imitation import (  # noqa: F401
    ImitationConfig,
    ImitationLearner,
    train_cloning,
    train_dagger,
)
from multiagent_gnn_policies_tpu.algos.baseline import train_baseline  # noqa: F401
