"""Metrics sinks: fan-out, fold prefixes, Neptune step forwarding."""

from montecarlo_gated_mil_tpu.utils.metrics import MemorySink, Metrics, NeptuneSink


class _FakeSeries:
    def __init__(self):
        self.calls = []

    def log(self, value, step=None):
        self.calls.append((value, step))


class _FakeRun:
    def __init__(self):
        self.series = {}

    def __getitem__(self, name):
        return self.series.setdefault(name, _FakeSeries())

    def stop(self):
        pass


def test_neptune_sink_forwards_step():
    """Epoch-indexed series keep their x-axis (the reference logs per-epoch
    losses against epoch numbers, net_utils.py:67-76)."""
    run = _FakeRun()
    sink = NeptuneSink(run)
    sink.log("train/epoch_loss", 0.5, step=3)
    sink.log("best_model_path", "/tmp/x")  # step-less values still log
    assert run.series["train/epoch_loss"].calls == [(0.5, 3)]
    assert run.series["best_model_path"].calls == [("/tmp/x", None)]


def test_metrics_fold_prefix_and_fanout():
    a, b = MemorySink(), MemorySink()
    m = Metrics([a, b]).scoped(fold=2)
    m.log("val/epoch_acc", 0.75, step=1)
    assert a.records == [("2/val/epoch_acc", 0.75, 1)]
    assert b.records == a.records


def test_tensorboard_sink_writes_events(tmp_path):
    """Scalars and text land in a TensorBoard event file (SURVEY.md §5)."""
    from montecarlo_gated_mil_tpu.utils.metrics import TensorBoardSink

    sink = TensorBoardSink(str(tmp_path))
    sink.log("train/epoch_loss", 0.5, step=1)
    sink.log("train/epoch_loss", 0.4, step=2)
    sink.log("test/accuracy", 0.9)  # step-less scalar: auto-stepped
    sink.log("test/accuracy", 0.95)
    sink.log("best_model_path", "/tmp/x")  # non-numeric -> text
    sink.close()
    events = list(tmp_path.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0
