from montecarlo_gated_mil_tpu.utils.metrics import (  # noqa: F401
    JsonlSink,
    MemorySink,
    Metrics,
    NeptuneSink,
    StdoutSink,
)
