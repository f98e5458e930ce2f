#!/usr/bin/env python
"""Serving cold-start measurement + AOT-cache feasibility probes (round 3).

Round 2 recorded ~4 min to first response (90 s predictor build + 150 s
first compile) with the persistent XLA compilation cache unusable (hangs
the axon plugin).  This harness measures where the time actually goes and
probes the two escape hatches:

  build     time build_predictor + warmup phases, per bucket
  serialize can a compiled executable round-trip through
            jax.experimental.serialize_executable on this PJRT plugin?
            (if yes, per-bucket programs can be AOT-cached on disk)

Usage: python tools/measure_coldstart.py [build|serialize|all]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def probe_serialize():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.perf_counter()

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((512, 512), jnp.bfloat16)
    lowered = f.lower(x)
    compiled = lowered.compile()
    print(f"compile small program: {time.perf_counter() - t0:.2f}s", flush=True)
    want = float(compiled(x))
    try:
        from jax.experimental import serialize_executable as se

        t0 = time.perf_counter()
        payload, in_tree, out_tree = se.serialize(compiled)
        print(
            f"serialize OK: {len(payload)} bytes in "
            f"{time.perf_counter() - t0:.2f}s",
            flush=True,
        )
        t0 = time.perf_counter()
        loaded = se.deserialize_and_load(payload, in_tree, out_tree)
        got = float(loaded(x))
        print(
            f"deserialize+run OK in {time.perf_counter() - t0:.2f}s, "
            f"value match: {got == want}",
            flush=True,
        )
        return True
    except Exception as e:  # noqa: BLE001 — feasibility probe
        print(f"serialize probe FAILED: {type(e).__name__}: {e}", flush=True)
        return False


def measure_build():
    import numpy as np

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
    from montecarlo_gated_mil_tpu.server import build_predictor

    t0 = time.perf_counter()
    predictor = build_predictor(cfg)
    t_build = time.perf_counter() - t0
    print(f"build_predictor: {t_build:.1f}s", flush=True)

    hw = (predictor.pipeline.height, predictor.pipeline.width)
    img = np.zeros(hw, np.uint16)
    t0 = time.perf_counter()
    predictor.predict(img, "L")
    print(
        f"first predict (cap bucket {predictor.pipeline.bucket}): "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    # each remaining bucket's compile (served lazily or by warmup)
    if predictor.bucket_spec is not None:
        for b in predictor.bucket_spec.sizes:
            if b >= predictor.pipeline.bucket:
                continue
            t0 = time.perf_counter()
            predictor._infer_for(b)(
                img.astype(np.uint16),
                __import__("jax").numpy.asarray(False),
                __import__("jax").numpy.asarray(0, "int32"),
                np.float32(1.0 / 65535),
            )
            print(f"bucket {b} compile+run: {time.perf_counter() - t0:.1f}s",
                  flush=True)


def measure_aot(directory: str = "/tmp/mcgmil_aot_cache"):
    """Time-to-ready through the AOT executable cache, production scale:
    first launch (compile + serialize) vs restart (deserialize)."""
    import numpy as np

    from montecarlo_gated_mil_tpu.core.config import config_from_dict
    from montecarlo_gated_mil_tpu.server import build_predictor

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
    t0 = time.perf_counter()
    predictor = build_predictor(cfg)
    print(f"build_predictor: {time.perf_counter() - t0:.1f}s", flush=True)
    # Separate the tunnel's once-per-process first-fetch stall (1-4 min
    # lottery, environment-imposed) from the honest warmup cost.
    t0 = time.perf_counter()
    predictor.absorb_first_fetch()
    print(f"first-fetch stall: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    hits = predictor.aot_warmup(directory, dtypes=(np.uint16,))
    label = "restart (cache hit)" if hits else "first launch (compile+save)"
    print(f"aot_warmup [{label}]: {time.perf_counter() - t0:.1f}s "
          f"({hits} loaded)", flush=True)
    img = np.zeros((cfg.data.H, cfg.data.W), np.uint16)
    for i in range(3):
        t0 = time.perf_counter()
        r = predictor.predict(img, "L")
        print(f"predict #{i + 1}: {time.perf_counter() - t0:.2f}s "
              f"(prediction {r.prediction})", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("serialize", "all"):
        probe_serialize()
    if which in ("build", "all"):
        measure_build()
    if which == "aot":
        measure_aot(sys.argv[2] if len(sys.argv) > 2 else "/tmp/mcgmil_aot_cache")
