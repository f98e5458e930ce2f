from montecarlo_gated_mil_tpu.utils.metrics import (  # noqa: F401
    JsonlSink,
    MemorySink,
    Metrics,
    NeptuneSink,
    StdoutSink,
    TensorBoardSink,
)
from montecarlo_gated_mil_tpu.utils.profiling import (  # noqa: F401
    PhaseTimer,
    annotate,
    slope_time,
    xla_trace,
)
