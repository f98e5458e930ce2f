from montecarlo_gated_mil_tpu.data.pipeline import (  # noqa: F401
    BagLoader,
    PipelineConfig,
    canonicalize_image,
    estimate_valid_tiles,
    image_to_bag,
    stack_multimodal,
)
from montecarlo_gated_mil_tpu.data.records import (  # noqa: F401
    BagRecord,
    class_weights,
    select_records,
)
from montecarlo_gated_mil_tpu.data.splits import (  # noqa: F401
    Split,
    kfold_split,
    random_split,
    stratified_test_split,
    weighted_sample_order,
)
from montecarlo_gated_mil_tpu.data.synthetic import (  # noqa: F401
    make_synthetic_reader,
    synthetic_image,
    synthetic_records,
)
