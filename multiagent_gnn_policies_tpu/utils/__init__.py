from multiagent_gnn_policies_tpu.utils.config import ExperimentConfig, load_ini  # noqa: F401
from multiagent_gnn_policies_tpu.utils.metrics import MetricsLogger  # noqa: F401
from multiagent_gnn_policies_tpu.utils import checkpoint  # noqa: F401
