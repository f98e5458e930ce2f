"""MCDO inference throughput benchmark (the BASELINE.json headline metric).

Measures mammograms/sec/chip for the full per-bag MCDO path — ResNet-18
patch embedding (once) + T Monte-Carlo gated-attention samples (fused Pallas
kernel) — at the reference-scale workload: a 256-instance bag of 224x224
patches, T=30.  ``vs_baseline`` compares against the reference's own serial
pattern measured in torch on the hardware available to it here
(tools/measure_baseline.py -> BASELINE_measured.json).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.core.config import Config
from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL
from montecarlo_gated_mil_tpu.ops.gated_attention import (
    GatedAttentionParams,
    mc_gated_attention_fused,
)

_BASELINE_FILE = os.path.join(os.path.dirname(__file__), "..", "BASELINE_measured.json")


def load_baseline() -> dict | None:
    try:
        with open(os.path.abspath(_BASELINE_FILE)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def run_bench(
    cfg: Config | None = None,
    *,
    bag_size: int = 256,
    patch: int = 224,
    num_samples: int = 30,
    repeats: int = 20,
    use_pallas: bool | None = None,
    quantized: bool | None = None,
) -> dict:
    backbone = cfg.model if cfg else "r18"
    dtype = jnp.dtype(cfg.tpu.compute_dtype) if cfg else jnp.bfloat16
    if use_pallas is None:
        use_pallas = (cfg.tpu.use_pallas_attention if cfg else True) and (
            jax.default_backend() == "tpu"
        )
    if quantized is None:
        # Headline default: the int8 PTQ serving path (validated in
        # tests/test_quantized.py: feature cosine ~0.995, prediction
        # agreement, masking invariance; docs/PERFORMANCE.md reports the
        # exact-bf16 number alongside).  The metric string labels the mode.
        quantized = cfg.tpu.quantized_inference if cfg else (
            jax.default_backend() == "tpu"
        )
    model = MultiHeadGatedAttentionMIL(backbone=backbone, dtype=dtype)
    key = jax.random.key(0)
    # Feed patches in the compute dtype: the embed casts to it on entry
    # anyway (resnet.py), so values are bit-identical while the input HBM
    # read halves (measured 7.46 -> 7.17 ms/bag, docs/PERFORMANCE.md §r2).
    patches = jax.random.normal(key, (bag_size, patch, patch, 3), jnp.float32)
    patches = patches.astype(dtype)
    mask = jnp.ones((bag_size,), bool)
    # init with a small dummy (params are spatial-size agnostic), on the
    # in-process CPU backend with host-numpy results: jit treats them as
    # ordinary constants, and keeping the bench free of device->host reads
    # sidesteps the tunnel's first-fetch stall (docs/PERFORMANCE.md §R3c)
    # during setup.
    import numpy as np

    def _init():
        return jax.jit(model.init)(
            {"params": key, "dropout": key},
            jnp.zeros((8, 64, 64, 3), jnp.float32),
            jnp.ones((8,), bool),
        )

    if jax.default_backend() != "cpu":
        with jax.default_device(jax.devices("cpu")[0]):
            variables = _init()
        variables = jax.tree.map(np.asarray, variables)
    else:
        variables = _init()
    kp = GatedAttentionParams.from_model_params(variables["params"])
    fd, ad = model.feature_dropout, model.attention_dropout

    if quantized:
        from montecarlo_gated_mil_tpu.ops.quantized import (
            quantize_backbone_static,
            quantized_embed_static,
        )

        qp = quantize_backbone_static(variables["params"]["features"], backbone)

        def embed(p, m):
            return quantized_embed_static(qp, p, m, backbone=backbone)

    else:

        def embed(p, m):
            return model.apply(variables, p, m, method="embed")

    if use_pallas:

        def mcdo_bag(p, m, seed):
            return mc_gated_attention_fused(
                embed(p, m), m, kp, num_samples, seed, fd, ad
            )

    else:
        from montecarlo_gated_mil_tpu.mcdo.sampling import mc_head

        def mcdo_bag(p, m, seed):
            out = mc_head(
                model, variables, embed(p, m), m, num_samples,
                jax.random.key(seed),
            )
            return out.predictions, out.attention

    # Chained-iteration slope with a scalar readback: robust against async
    # dispatch AND against runtimes whose block_until_ready doesn't wait for
    # compute (observed with the tunneled TPU plugin in this image); the
    # k2-k1 slope cancels dispatch/transfer latency, leaving pure device
    # time per bag.
    def chain(p, m, k):
        def body(carry, i):
            y, _ = mcdo_bag(p + carry * 1e-6, m, i)
            return jnp.sum(y), None

        c, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(k))
        return c

    # Three chain lengths; median pairwise slope rejects tunnel-RTT outliers
    # in any single endpoint measurement.
    ks = (2, max(4, repeats // 3), max(8, (2 * repeats) // 3))
    totals = {}
    for k in ks:
        g = jax.jit(lambda p, m, k=k: chain(p, m, k))
        float(g(patches, mask))  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(g(patches, mask))  # readback forces completion
            best = min(best, time.perf_counter() - t0)
        totals[k] = best
    slopes = sorted(
        (totals[b] - totals[a]) / (b - a)
        for a, b in ((ks[0], ks[1]), (ks[1], ks[2]), (ks[0], ks[2]))
    )
    per_bag = slopes[1]  # median
    bags_per_s = 1.0 / per_bag

    baseline = load_baseline()
    vs = (
        bags_per_s / baseline["bags_per_second"]
        if baseline and baseline.get("bags_per_second")
        else None
    )
    return {
        "metric": (
            f"MCDO inference throughput, T={num_samples}, bag={bag_size}x"
            f"{patch}px, {backbone}, single chip"
            + (", int8 PTQ embed" if quantized else "")
        ),
        "value": round(bags_per_s, 3),
        "unit": "mammograms/sec/chip",
        "vs_baseline": round(vs, 1) if vs is not None else None,
    }


def measure_train_step_ms(
    *, bag_size: int = 256, patch: int = 224, use_pallas: bool = False
) -> float:
    """Device ms per full training step (embed + head fwd with dropout,
    CE+aux, backward, grad-accum add, Adam update) at the benchmark
    workload, slope method (same chains as the inference headline;
    breakdown in docs/PERFORMANCE.md §train-step audit)."""
    import optax

    from montecarlo_gated_mil_tpu.train.criteria import cross_entropy
    from montecarlo_gated_mil_tpu.train.state import TrainState, make_train_step

    model = MultiHeadGatedAttentionMIL(
        backbone="r18", dtype=jnp.bfloat16,
        feature_dropout=0.25, attention_dropout=0.25,
    )
    key = jax.random.key(0)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        jnp.zeros((8, 64, 64, 3), jnp.float32), jnp.ones((8,), bool),
    )
    opt = optax.adam(3e-5)
    state = TrainState.create(variables["params"], opt)
    step = make_train_step(
        model, cross_entropy, opt, accumulation_steps=1, use_pallas=use_pallas
    )
    patches = jax.random.normal(key, (bag_size, patch, patch, 3), jnp.bfloat16)
    mask = jnp.ones((bag_size,), bool)
    tidx = jnp.arange(bag_size, dtype=jnp.int32)
    label = jnp.asarray(1, jnp.int32)
    # One shared harness with tools/profile_train.py (the audit): a
    # methodology change there cannot silently diverge from the recorded
    # train_step_ms series.
    from montecarlo_gated_mil_tpu.utils.profiling import (
        slope_of_chain,
        train_step_chain,
    )

    build = train_step_chain(step, state, patches, mask, label, tidx, key)
    return slope_of_chain(build, ks=(2, 5, 10)) * 1e3


def run_bench_both(cfg: Config | None = None, **kw) -> dict:
    """Headline record carrying BOTH inference paths: ``value`` is the int8
    PTQ serving default (when it differs), ``value_exact_bf16`` the exact
    float path — so the recorded series stays unambiguous across rounds
    (r01 measured exact, r02 int8; from r03 every record carries both).
    ``train_step_ms`` (from r04) is the full training step at the same
    workload."""
    kw.pop("quantized", None)
    result = run_bench(cfg, **kw)
    if "int8" in result["metric"]:
        exact = run_bench(cfg, quantized=False, **kw)
        result["value_exact_bf16"] = exact["value"]
        result["vs_baseline_exact_bf16"] = exact["vs_baseline"]
    try:
        result["train_step_ms"] = round(measure_train_step_ms(), 2)
    except Exception:  # noqa: BLE001 — never let the audit sink the headline
        result["train_step_ms"] = None
    return result


if __name__ == "__main__":
    print(json.dumps(run_bench_both()))
