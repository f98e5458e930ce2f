#!/usr/bin/env python
"""Serving request latency/throughput at full production scale.

Complements bench.py (pure device time via the chained-scan slope) with the
numbers a deployment actually sees: warm wall-clock latency of
``MCDOPredictor.predict`` per request — raw 7036x2800 mammogram in,
uncertainty stats out — and sustained request throughput of a back-to-back
loop.  On this image the host<->device tunnel adds ~25 ms per transfer leg,
so wall latency is dominated by transport, not compute (the honest device
time is in tools/measure_fullscale.py); both are reported.

Run on a QUIET host (docs/PERFORMANCE.md §methodology item 3).

Usage: python tools/measure_serving.py [n_requests]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from montecarlo_gated_mil_tpu.core.config import config_from_dict  # noqa: E402
from montecarlo_gated_mil_tpu.server import build_predictor  # noqa: E402

H, W = 7036, 2800  # reference config.yml data.img_size


def main(n: int = 30) -> None:
    print(f"backend: {jax.default_backend()}")
    cfg = config_from_dict(
        {
            "N": 30,
            "seed": 0,
            "model": "r18",
            "data": {
                "H": H, "W": W, "patch_size": 224,
                "overlap_train": 0.75, "overlap_val_test": 0.75,
                "empty_threshold": 0.25, "synthetic_count": 1,
            },
            "tpu": {
                "buckets": [1024],
                "compute_dtype": "bfloat16",
                "quantized_inference": jax.default_backend() == "tpu",
            },
        }
    )
    t0 = time.perf_counter()
    predictor = build_predictor(cfg)
    print(f"build_predictor: {time.perf_counter() - t0:.1f} s "
          f"(quantized={predictor.quantized}, pallas={predictor.use_pallas})")

    rng = np.random.default_rng(0)
    imgs = [rng.random((H, W), np.float32) ** 2 for _ in range(4)]
    # the DICOM wire format: 12-bit pixels in uint16 (2 bytes/px uploaded,
    # normalized on device by pixel_max)
    imgs16 = [np.round(im * 4095).astype(np.uint16) for im in imgs]

    t0 = time.perf_counter()
    predictor.predict(imgs[0])
    print(f"first request (compile): {time.perf_counter() - t0:.1f} s")

    for label, batch, kw in (
        ("float32 in", imgs, {}),
        ("uint16 in", imgs16, {"pixel_max": 4095}),
    ):
        predictor.predict(batch[0], **kw)  # compile the dtype variant
        lat = []
        for i in range(n):
            t0 = time.perf_counter()
            predictor.predict(batch[i % len(batch)], seed=i, **kw)
            lat.append(time.perf_counter() - t0)
        lat_ms = np.array(lat) * 1e3
        print(
            f"warm predict({label}) wall latency over {n}: "
            f"p50 {np.percentile(lat_ms, 50):.1f} ms, "
            f"p90 {np.percentile(lat_ms, 90):.1f} ms, "
            f"min {lat_ms.min():.1f} ms; "
            f"throughput {n / np.sum(lat):.1f} req/s"
        )

    t0 = time.perf_counter()
    r = predictor.predict(imgs[0], return_maps=True)
    t_maps_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = predictor.predict(imgs[1], return_maps=True)
    t_maps = time.perf_counter() - t0
    print(
        f"predict(return_maps=True): {t_maps * 1e3:.1f} ms warm "
        f"({t_maps_first:.1f} s first; maps {r.attention_mean_maps.shape}, "
        f"{r.attention_mean_maps.nbytes / 1e6:.0f} MB/map fetched)"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
