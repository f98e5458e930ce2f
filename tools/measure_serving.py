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

Usage:
  python tools/measure_serving.py [n_requests]          # single-stream
  python tools/measure_serving.py --concurrency 1,4,8 --duration 300 \
      [--max-inflight G]
      # soak: N HTTP clients hammer a real ThreadingHTTPServer for D
      # seconds per level (one warm predictor across levels); reports
      # sustained req/s + wall-latency percentiles.  G sizes the
      # predictor's device-execution gate (serve.py max_inflight).
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


def _make_cfg():
    return config_from_dict(
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


def soak(
    concurrencies: list[int], duration: float, n_imgs: int = 4,
    max_inflight: int = 1,
) -> None:
    """N concurrent HTTP clients against the real server for ``duration``
    seconds per concurrency level, one warm predictor across levels
    (full-size images referenced via ``image_path`` under a data root, as
    a PACS-adjacent deployment would)."""
    import os
    import tempfile
    import threading

    from montecarlo_gated_mil_tpu.server import make_server

    print(f"backend: {jax.default_backend()}")
    cfg = _make_cfg()
    t0 = time.perf_counter()
    predictor = build_predictor(cfg, max_inflight=max_inflight)
    print(f"build_predictor: {time.perf_counter() - t0:.1f} s "
          f"(max_inflight={max_inflight})", flush=True)

    data_root = tempfile.mkdtemp(prefix="mcgmil_soak_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_imgs):
        p = os.path.join(data_root, f"img_{i}.npy")
        np.save(p, rng.random((H, W), np.float32).astype(np.float32) ** 2)
        paths.append(p)

    t0 = time.perf_counter()
    predictor.predict(np.load(paths[0]))
    print(f"first request (compile): {time.perf_counter() - t0:.1f} s",
          flush=True)

    srv = make_server(predictor, port=0, data_root=data_root)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    for concurrency in concurrencies:
        _soak_one(port, paths, concurrency, duration)
    srv.shutdown()


def _soak_one(port: int, paths, concurrency: int, duration: float) -> None:
    import http.client
    import json
    import threading

    start_gate = threading.Barrier(concurrency + 1)
    stop = time.perf_counter() + duration  # set precisely after the barrier
    lat: list[list[float]] = [[] for _ in range(concurrency)]
    errors = [0] * concurrency
    error_samples: list[str] = []  # first few, for diagnosis

    def client(ci: int) -> None:
        conn = http.client.HTTPConnection("127.0.0.1", port)
        start_gate.wait()
        i = ci
        while time.perf_counter() < stop:
            body = json.dumps(
                {"image_path": paths[i % len(paths)], "seed": i}
            ).encode()
            t = time.perf_counter()
            try:
                conn.request(
                    "POST", "/predict", body,
                    {"Content-Type": "application/json"},
                )
                resp = conn.getresponse()
                payload = resp.read()
                if resp.status != 200:
                    errors[ci] += 1
                    if len(error_samples) < 5:
                        error_samples.append(
                            f"HTTP {resp.status}: {payload[:300]!r}"
                        )
                else:
                    lat[ci].append(time.perf_counter() - t)
            except Exception as e:  # noqa: BLE001 — count, keep hammering
                errors[ci] += 1
                if len(error_samples) < 5:
                    error_samples.append(f"{type(e).__name__}: {e}")
                conn = http.client.HTTPConnection("127.0.0.1", port)
            i += concurrency
        conn.close()

    threads = [
        threading.Thread(target=client, args=(ci,)) for ci in range(concurrency)
    ]
    for t in threads:
        t.start()
    start_gate.wait()
    t_start = time.perf_counter()
    stop = t_start + duration
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t_start

    all_lat = np.array(sorted(x for li in lat for x in li)) * 1e3
    n_ok = len(all_lat)
    n_err = sum(errors)
    print(
        f"soak concurrency={concurrency} duration={elapsed:.0f}s: "
        f"{n_ok} ok, {n_err} errors, sustained {n_ok / elapsed:.2f} req/s",
        flush=True,
    )
    if n_ok:
        print(
            f"wall latency: p50 {np.percentile(all_lat, 50):.0f} ms, "
            f"p95 {np.percentile(all_lat, 95):.0f} ms, "
            f"p99 {np.percentile(all_lat, 99):.0f} ms, "
            f"max {all_lat.max():.0f} ms",
            flush=True,
        )
    for s in error_samples:
        print(f"  sample error: {s}", flush=True)


def main(n: int = 30) -> None:
    print(f"backend: {jax.default_backend()}")
    cfg = _make_cfg()
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
    print(f"first request (compile): {time.perf_counter() - t0:.1f} s",
          flush=True)

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
    if "--concurrency" in sys.argv:
        conc = [
            int(c)
            for c in sys.argv[sys.argv.index("--concurrency") + 1].split(",")
        ]
        dur = (
            float(sys.argv[sys.argv.index("--duration") + 1])
            if "--duration" in sys.argv
            else 300.0
        )
        gate = (
            int(sys.argv[sys.argv.index("--max-inflight") + 1])
            if "--max-inflight" in sys.argv
            else 1
        )
        soak(conc, dur, max_inflight=gate)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
