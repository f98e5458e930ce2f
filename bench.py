#!/usr/bin/env python
"""Benchmark entry: prints ONE JSON line with the headline metric.

Full per-bag MCDO inference (ResNet-18 embed + T=30 fused Pallas MC
gated-attention) on a 256x224px-patch bag, single chip, measured with the
chained-scan slope method (see docs/PERFORMANCE.md), vs the reference's
serial torch pattern (BASELINE_measured.json).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from montecarlo_gated_mil_tpu.bench import run_bench_both  # noqa: E402

if __name__ == "__main__":
    print(json.dumps(run_bench_both()))
