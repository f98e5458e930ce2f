from montecarlo_gated_mil_tpu.models.gamil import (  # noqa: F401
    GatedAttentionMIL,
    MultiHeadGatedAttentionMIL,
    auxiliary_loss,
)
from montecarlo_gated_mil_tpu.models.resnet import (  # noqa: F401
    MaskedBatchStatsNorm,
    ResNetFeatures,
    feature_dim,
    make_backbone,
)
from montecarlo_gated_mil_tpu.models.causal import (  # noqa: F401
    CounterfactualOutputs,
    causal_counterfactual_dropout,
)
