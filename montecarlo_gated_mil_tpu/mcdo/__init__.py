from montecarlo_gated_mil_tpu.mcdo.ensemble import (  # noqa: F401
    ensemble_mc_inference,
    ensemble_mc_inference_sharded,
    load_fold_ensemble,
    stack_params,
)
from montecarlo_gated_mil_tpu.mcdo.sampling import (  # noqa: F401
    AttentionStats,
    MCOutputs,
    PredictiveStats,
    attention_stats,
    interpret_entropy,
    mc_head,
    mc_inference,
    mc_inference_serial,
    mc_inference_single_head,
    predictive_stats,
)
