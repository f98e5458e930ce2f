#!/usr/bin/env python
"""Phase timing for build_predictor on the live backend (cold-start hunt).

Times each sub-phase of server.build_predictor + MCDOPredictor.from_config
so the ~80 s build cost can be attributed (init? quantization? kernel param
packing?) and attacked.  One-shot diagnostic, run quiet-host.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax

    t_all = time.perf_counter()

    def lap(label, t0):
        print(f"{label}: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    print(f"backend: {jax.default_backend()}", flush=True)
    lap("backend init", t0)

    from montecarlo_gated_mil_tpu.core.config import config_from_dict

    cfg = config_from_dict(
        {
            "model": "r18",
            "N": 30,
            "tpu": {
                "buckets": [128, 256, 512, 1024],
                "compute_dtype": "bfloat16",
                "quantized_inference": True,
            },
        }
    )

    from montecarlo_gated_mil_tpu.experiment import build_model
    from montecarlo_gated_mil_tpu.runners import init_params

    t0 = time.perf_counter()
    model = build_model(cfg)
    lap("build_model", t0)

    t0 = time.perf_counter()
    params = init_params(model, jax.random.key(cfg.seed))
    jax.block_until_ready(params)
    lap("init_params", t0)

    t0 = time.perf_counter()
    from montecarlo_gated_mil_tpu.ops.quantized import quantize_backbone_static

    qp = quantize_backbone_static(params["features"], model.backbone)
    jax.block_until_ready(qp)
    lap("quantize_backbone_static", t0)

    t0 = time.perf_counter()
    from montecarlo_gated_mil_tpu.ops.gated_attention import GatedAttentionParams

    kp = GatedAttentionParams.from_model_params(params)
    jax.block_until_ready(kp)
    lap("GatedAttentionParams.from_model_params", t0)

    t0 = time.perf_counter()
    from montecarlo_gated_mil_tpu.server import build_predictor  # noqa: F401
    from montecarlo_gated_mil_tpu.serve import MCDOPredictor

    predictor = MCDOPredictor.from_config(cfg, params)
    lap("MCDOPredictor.from_config (incl. re-quantize)", t0)
    del predictor
    lap("TOTAL", t_all)


if __name__ == "__main__":
    main()
