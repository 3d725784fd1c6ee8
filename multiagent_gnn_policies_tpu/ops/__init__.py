from multiagent_gnn_policies_tpu.ops.graph import (  # noqa: F401
    GraphState,
    gso_powers,
    delayed_gso_update,
    history_shift,
    initial_graph_state,
    update_graph_state,
    aggregate,
)
