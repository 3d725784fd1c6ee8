from multiagent_gnn_policies_tpu.models.actor import (  # noqa: F401
    ActorConfig,
    init_actor,
    actor_forward,
)
from multiagent_gnn_policies_tpu.models.critic import (  # noqa: F401
    CriticConfig,
    init_critic,
    critic_forward,
)
