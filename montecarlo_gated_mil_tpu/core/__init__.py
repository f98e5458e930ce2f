from montecarlo_gated_mil_tpu.core.bag import Bag, BucketSpec  # noqa: F401
from montecarlo_gated_mil_tpu.core.config import (  # noqa: F401
    Config,
    DataConfig,
    SchedulerConfig,
    TrainingParameters,
    TrainingPlan,
    TpuConfig,
    config_from_dict,
    load_config,
)
