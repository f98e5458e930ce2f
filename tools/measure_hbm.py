#!/usr/bin/env python
"""HBM envelope per bucket: compile-time memory analysis of the production
programs (VERDICT r04 item 8).

For each bag bucket size this AOT-compiles (never executes — oversized
programs compile fine even when they could not allocate) the three
workloads a deployment runs and prints XLA's memory analysis:

  - int8 PTQ MC inference (quantized embed + fused Pallas T=30 head)
  - exact bf16 MC inference (float embed + fused head)
  - full training step (bf16 embed fwd+bwd, CE+aux, grad accum, Adam)

``temp`` is the transient activation arena (the number that OOMs first);
args/outputs are the resident params/optimizer/bag buffers.  The v5e chip
has 16 GB; docs/PERFORMANCE.md §HBM envelope records the resulting safe
limits, and ``data/pipeline.py`` raises an actionable error when an
extended bucket would exceed them on one chip.

Usage: python tools/measure_hbm.py [bucket ...]   (default sweep)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL  # noqa: E402
from montecarlo_gated_mil_tpu.ops.gated_attention import (  # noqa: E402
    GatedAttentionParams,
    mc_gated_attention_fused,
)

PATCH = 224
T = 30
HBM_GB = 16.0  # one v5e chip


def _params(model):
    key = jax.random.key(0)

    def _init():
        return jax.jit(model.init)(
            {"params": key, "dropout": key},
            jnp.zeros((8, 64, 64, 3), jnp.float32),
            jnp.ones((8,), bool),
        )

    if jax.default_backend() != "cpu":
        with jax.default_device(jax.devices("cpu")[0]):
            variables = _init()
        return jax.tree.map(np.asarray, variables)
    return _init()


def analyze(fn, *args) -> dict:
    """Compile + memory analysis; XLA:TPU REFUSES over-memory programs at
    compile time, in two distinct ways:

      - "Ran out of memory in memory space hbm ... Used X.XXG of 15.75G"
        — the whole program's arena exceeds the chip's HBM;
      - "Ran out of memory in memory space vmem ... Scoped allocation with
        size X and limit 16.00M" — a single Pallas kernel's VMEM working
        set exceeds the scoped-vmem stack (the fused MC head keeps the
        (N, 512) bag resident on-core; see docs/PERFORMANCE.md §HBM
        envelope for the resulting N ceiling).

    Both are reported as refused with the requirement XLA printed."""
    import re

    try:
        compiled = jax.jit(fn).lower(*args).compile()
    except Exception as e:  # noqa: BLE001 — jaxlib error type varies
        msg = str(e)
        if "Ran out of memory" not in msg:
            raise
        m = re.search(r"Used ([0-9.]+)G of ([0-9.]+)G hbm", msg)
        if m:
            return {"temp": None, "args": None, "out": None,
                    "total": int(float(m.group(1)) * 1024**3),
                    "refused": "hbm"}
        m = re.search(r"size ([0-9.]+)M and limit ([0-9.]+)M", msg)
        need = float(m.group(1)) if m else float("nan")
        return {"temp": None, "args": None, "out": None,
                "total": 0, "vmem_mb": need, "refused": "vmem"}
    m = compiled.memory_analysis()
    return {
        "temp": m.temp_size_in_bytes,
        "args": m.argument_size_in_bytes,
        "out": m.output_size_in_bytes,
        "total": m.temp_size_in_bytes
        + m.argument_size_in_bytes
        + m.output_size_in_bytes,
        "refused": False,
    }


def main(buckets):
    print(f"backend: {jax.default_backend()}, patch={PATCH}px, T={T}")
    model = MultiHeadGatedAttentionMIL(backbone="r18", dtype=jnp.bfloat16)
    variables = _params(model)
    kp = GatedAttentionParams.from_model_params(variables["params"])

    from montecarlo_gated_mil_tpu.ops.quantized import (
        quantize_backbone_static,
        quantized_embed_static,
    )

    qp = quantize_backbone_static(variables["params"]["features"], "r18")

    import optax

    from montecarlo_gated_mil_tpu.train.criteria import cross_entropy
    from montecarlo_gated_mil_tpu.train.state import TrainState, make_train_step

    tmodel = MultiHeadGatedAttentionMIL(
        backbone="r18", dtype=jnp.bfloat16,
        feature_dropout=0.25, attention_dropout=0.25,
    )
    tvars = _params(tmodel)
    opt = optax.adam(3e-5)
    state = TrainState.create(tvars["params"], opt)
    step = make_train_step(tmodel, cross_entropy, opt, accumulation_steps=1)

    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from montecarlo_gated_mil_tpu.mcdo.sampling import mc_head
        from montecarlo_gated_mil_tpu.ops.gated_attention import (
            FUSED_HEAD_MAX_N,
        )

        def _head(H, m, seed):
            # mirror production (loops/serving): jnp-head fallback past the
            # fused kernel's VMEM ceiling
            if H.shape[0] > FUSED_HEAD_MAX_N:
                return mc_head(
                    model, variables, H, m, T, jax.random.key(0)
                ).predictions
            return mc_gated_attention_fused(
                H, m, kp, T, seed, model.feature_dropout,
                model.attention_dropout,
            )

        def infer_i8(p, m, seed):
            return _head(quantized_embed_static(qp, p, m, backbone="r18"), m, seed)

        def infer_bf16(p, m, seed):
            return _head(model.apply(variables, p, m, method="embed"), m, seed)

    else:
        from montecarlo_gated_mil_tpu.mcdo.sampling import mc_inference

        def infer_i8(p, m, seed):  # CPU fallback: float head
            return mc_inference(
                model, variables, p, m, T, jax.random.key(seed)
            ).predictions

        infer_bf16 = infer_i8

    print(
        f"{'bucket':>7} | {'int8 eval temp':>14} | {'bf16 eval temp':>14} | "
        f"{'train temp':>11} {'train total':>12} | verdict @16G"
    )
    for b in buckets:
        patches = jax.ShapeDtypeStruct((b, PATCH, PATCH, 3), jnp.bfloat16)
        mask = jax.ShapeDtypeStruct((b,), jnp.bool_)
        seed = jnp.asarray(0, jnp.int32)
        r_i8 = analyze(infer_i8, patches, mask, seed)
        r_bf = analyze(infer_bf16, patches, mask, seed)

        from montecarlo_gated_mil_tpu.core.bag import Bag

        bag = Bag(
            patches=patches,
            mask=mask,
            label=jnp.asarray(1, jnp.int32),
            tile_indices=jax.ShapeDtypeStruct((b,), jnp.int32),
        )
        r_tr = analyze(step, state, bag, jax.random.key(0), jnp.asarray(True))
        gb = 1 / (1024**3)

        def fmt(r, field="temp"):
            if r["refused"] == "hbm":
                return f"REFUSED>={r['total'] * gb:.1f}"
            if r["refused"] == "vmem":
                return f"VMEM-REF {r['vmem_mb']:.0f}M"
            return f"{r[field] * gb:.2f} GB"

        worst = max(r_i8["total"], r_bf["total"], r_tr["total"]) * gb
        print(
            f"{b:>7} | {fmt(r_i8):>14} | {fmt(r_bf):>14} | "
            f"{fmt(r_tr):>11} {fmt(r_tr, 'total') if not r_tr['refused'] else '':>12} | "
            f"{'OK' if worst < HBM_GB * 0.95 else 'OVER'}",
            flush=True,
        )


if __name__ == "__main__":
    bks = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 2048, 3072, 4096, 6144]
    main(bks)
