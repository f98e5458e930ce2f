#!/usr/bin/env python
"""Round-5 int8 attribution: where the 2x MXU peak ratio becomes ~1.44x.

``BENCH_r04`` showed int8/bf16 = 1.41x end-to-end while the v5e MXU peak
ratio is 2x (394 int8 TOPs vs 197 bf16 TFLOPs).  This harness decomposes
both embeds stage by stage on the real chip so the gap is attributed, not
asserted (VERDICT r04 Weak #3):

  1. totals        — bf16 embed, int8 embed, fused MC head (T=30), so the
                     stage table reconciles with the bench headline;
  2. stages        — the REAL per-stage pipelines (stem epilogue included)
                     in both paths, using the production param trees;
  3. conv-only     — the same conv geometry with no BN/quant epilogues, in
                     bf16 and int8: the per-stage MXU speed-of-light, with
                     utilization vs the nominal peaks.

Usage: python tools/profile_int8_attrib.py   (quiet host; ~5 min)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL  # noqa: E402
from montecarlo_gated_mil_tpu.models.resnet import BasicBlock  # noqa: E402
from montecarlo_gated_mil_tpu.ops.gated_attention import (  # noqa: E402
    GatedAttentionParams,
    mc_gated_attention_fused,
)
from montecarlo_gated_mil_tpu.ops.quantized import (  # noqa: E402
    _bn_affine,
    _load_t,
    _qconv_stored,
    quantize_backbone_static,
)
from montecarlo_gated_mil_tpu.utils.profiling import slope_time  # noqa: E402

N = 256
T = 30

# bf16 / int8 MXU peaks, one v5e chip.
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


def _params():
    model = MultiHeadGatedAttentionMIL(backbone="r18", dtype=jnp.bfloat16)
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
        variables = jax.tree.map(np.asarray, variables)
    else:
        variables = _init()
    return model, variables


def report(name, t, extra=""):
    print(f"  {name:42s}: {t * 1e3:7.3f} ms  {extra}", flush=True)


# ------------------------------------------------------------- real stages


def int8_stage(qp, mask, stage):
    """The production int8 stage loop (ops/quantized.py:504-551), one stage."""
    store = qp.get("conv_store", "bf16")

    def norm_relu_quant(tl, bn, scale):
        se, be = _bn_affine(tl, bn, mask)
        a = jnp.maximum(tl * (se / scale) + be / scale, 0.0)
        return jnp.clip(jnp.round(a), -127, 127).astype(jnp.int8)

    def fn(x_q):
        x_scale = qp[f"layer{stage}_0"]["in_scale"]
        out = None
        xq = x_q
        for blk_i in range(2):
            q = qp[f"layer{stage}_{blk_i}"]
            stride = 2 if stage > 1 and blk_i == 0 else 1
            t1 = _qconv_stored(xq, q["conv1"], stride, 1, store)
            m1 = norm_relu_quant(
                _load_t(t1, q["conv1"], store), q["bn1"], q["mid_scale"]
            )
            tf = _load_t(
                _qconv_stored(m1, q["conv2"], 1, 1, store), q["conv2"], store
            )
            sef, bef = _bn_affine(tf, q["bn2"], mask)
            last = stage == 4 and blk_i == 1
            inv = 1.0 if last else 1.0 / q["out_scale"]
            if "downsample_conv" in q:
                d = _load_t(
                    _qconv_stored(xq, q["downsample_conv"], stride, 0, store),
                    q["downsample_conv"],
                    store,
                )
                sed, bed = _bn_affine(d, q["downsample_bn"], mask)
                identity = d * (sed * inv) + bed * inv
            else:
                identity = xq.astype(jnp.float32) * (x_scale * inv)
            xr = jnp.maximum(tf * (sef * inv) + bef * inv + identity, 0.0)
            if last:
                out = jnp.mean(xr, axis=(1, 2))
            else:
                xq = jnp.clip(jnp.round(xr), -127, 127).astype(jnp.int8)
                x_scale = q["out_scale"]
        return out if out is not None else xq

    return fn


def int8_stem(qp, mask):
    """The production int8-path stem (bf16 7x7 conv + folded epilogue +
    f32 pool + quantize; ops/quantized.py:463-493)."""

    def fn(patches):
        t = jax.lax.conv_general_dilated(
            patches.astype(jnp.bfloat16),
            qp["conv1"],
            window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        se, be = _bn_affine(t, qp["bn1"], mask)
        b1 = qp["layer1_0"]["in_scale"]
        a0 = jnp.maximum(t.astype(jnp.float32) * (se / b1) + be / b1, 0.0)
        pooled = jax.lax.reduce_window(
            a0, -jnp.inf, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        return jnp.clip(jnp.round(pooled), -127, 127).astype(jnp.int8)

    return fn


def bf16_stem(params, mask):
    """The float stem as ResNetFeatures runs it (conv + masked batch-stats
    BN + relu + maxpool), with the BN affine computed exactly as the model's
    MaskedBatchStatsNorm does."""
    bn = params["features"]["bn1"]

    def fn(patches):
        t = jax.lax.conv_general_dilated(
            patches.astype(jnp.bfloat16),
            params["features"]["conv1"]["kernel"].astype(jnp.bfloat16),
            window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        se, be = _bn_affine(t, bn, mask)
        a = jnp.maximum(t.astype(jnp.float32) * se + be, 0.0).astype(jnp.bfloat16)
        return jax.lax.reduce_window(
            a, jnp.asarray(-jnp.inf, jnp.bfloat16), jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    return fn


def bf16_stage(params, mask, stage):
    def fn(x):
        for blk_i in range(2):
            stride = 2 if stage > 1 and blk_i == 0 else 1
            blk = BasicBlock(
                features=64 * 2 ** (stage - 1), stride=stride, dtype=jnp.bfloat16
            )
            x = blk.apply(
                {"params": params["features"][f"layer{stage}_{blk_i}"]}, x, mask
            )
        if stage == 4:
            return jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return x

    return fn


# ---------------------------------------------------------------- conv-only


def stage_convs(stage):
    """(cin, cout, k, stride, pad) per conv of an r18 stage (both blocks +
    the stage-entry downsample), plus the stage input (h, cin)."""
    c = 64 * 2 ** (stage - 1)
    if stage == 1:
        h, cin, s0 = 56, 64, 1
        convs = [(64, 64, 3, 1, 1)] * 4
    else:
        h, cin, s0 = 56 // 2 ** (stage - 2), c // 2, 2
        convs = [(cin, c, 3, 2, 1), (c, c, 3, 1, 1), (cin, c, 1, 2, 0),
                 (c, c, 3, 1, 1), (c, c, 3, 1, 1)]
    return h, cin, s0, convs


def conv_flops(h_in, convs):
    """Total MAC*2 for a stage's convs at batch N."""
    fl = 0
    h = h_in
    for i, (cin, cout, k, s, _p) in enumerate(convs):
        # the downsample (i == 2) branches off the STAGE input, not the
        # strided main path
        h_out = (h_in if i == 2 else h) // s
        fl += 2 * N * h_out * h_out * cout * k * k * cin
        if i == 0:
            h = h_out  # main path continues at the strided resolution
    return fl


def conv_only(stage, dtype):
    h, cin, s0, convs = stage_convs(stage)
    key = jax.random.key(stage)
    if dtype == "i8":
        x = jax.random.randint(key, (N, h, h, cin), -127, 128, jnp.int8)
        ws = [
            jax.random.randint(jax.random.fold_in(key, i), (k, k, ci, co),
                               -127, 128, jnp.int8)
            for i, (ci, co, k, _s, _p) in enumerate(convs)
        ]
    else:
        x = jax.random.normal(key, (N, h, h, cin), jnp.bfloat16)
        ws = [
            jax.random.normal(jax.random.fold_in(key, i), (k, k, ci, co),
                              jnp.bfloat16) * 0.05
            for i, (ci, co, k, _s, _p) in enumerate(convs)
        ]

    def conv(x, w, s, p):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32 if dtype == "i8" else jnp.bfloat16,
        )

    def cast(y):
        return y.astype(jnp.int8) if dtype == "i8" else y

    def fn(x):
        # Reduce with sum-of-SQUARES: a plain sum(conv(...)) is linear in
        # the kernel, and XLA's algebraic simplifier can collapse the
        # chain-final conv into a cheap windowed reduction (observed as
        # >100% "utilization" for layer4); squaring defeats the rewrite.
        acc = 0.0
        y = x
        for i, (ci, co, k, s, p) in enumerate(convs):
            if stage > 1 and i == 2:  # downsample: side branch off the input
                ds = conv(x, ws[i], s, p)
                acc = acc + jnp.sum(jnp.square(ds.astype(jnp.float32))) * 1e-9
                continue
            y = cast(conv(y, ws[i], s, p))
            acc = acc + jnp.sum(jnp.square(y.astype(jnp.float32))) * 1e-9
        return acc * jnp.ones((1,), jnp.float32)

    return fn, x, conv_flops(h, convs)


def main(rounds: int = 3):
    """Interleave every measurement ``rounds`` times in one process and
    report MEDIANS: stage-granularity slope times drift ±20% across process
    runs (tunnel + layout luck), far beyond the headline's ±5% band, so a
    single pass cannot rank stages honestly."""
    import statistics

    print(f"backend: {jax.default_backend()}, rounds={rounds}", flush=True)
    model, variables = _params()
    params = variables["params"]
    qp = quantize_backbone_static(params["features"], "r18")
    kp = GatedAttentionParams.from_model_params(params)
    key = jax.random.key(7)
    patches = jax.random.normal(key, (N, 224, 224, 3), jnp.bfloat16)
    mask = jnp.ones((N,), bool)

    from montecarlo_gated_mil_tpu.ops.quantized import quantized_embed_static

    w7 = params["features"]["conv1"]["kernel"].astype(jnp.bfloat16)

    def stem_conv(p):
        y = jax.lax.conv_general_dilated(
            p, w7, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        return jnp.sum(jnp.square(y.astype(jnp.float32))) * 1e-9

    emb = jax.random.normal(key, (N, 512), jnp.bfloat16)
    meas: dict[str, tuple] = {
        "total_i8": (
            lambda p: quantized_embed_static(qp, p, mask, backbone="r18"),
            patches,
        ),
        "total_bf16": (
            lambda p: model.apply(variables, p, mask, method="embed"),
            patches,
        ),
        "head": (
            lambda e: mc_gated_attention_fused(
                e, mask, kp, T, 0, model.feature_dropout,
                model.attention_dropout,
            ),
            emb,
        ),
        "stem_i8": (int8_stem(qp, mask), patches),
        "stem_bf16": (bf16_stem(params, mask), patches),
        "stem_conv": (stem_conv, patches),
    }
    for stage in (1, 2, 3, 4):
        h, cin, _s0, convs = stage_convs(stage)
        x_i8 = jax.random.randint(key, (N, h, h, cin), -127, 128, jnp.int8)
        x_bf = jax.random.normal(key, (N, h, h, cin), jnp.bfloat16)
        meas[f"L{stage}_i8"] = (int8_stage(qp, mask, stage), x_i8)
        meas[f"L{stage}_bf16"] = (bf16_stage(params, mask, stage), x_bf)
        fn_i, xc_i, fl = conv_only(stage, "i8")
        fn_b, xc_b, _ = conv_only(stage, "bf16")
        meas[f"L{stage}_conv_i8"] = (fn_i, xc_i)
        meas[f"L{stage}_conv_bf16"] = (fn_b, xc_b)

    samples: dict[str, list[float]] = {k: [] for k in meas}
    for r in range(rounds):
        for name, (fn, arg) in meas.items():
            samples[name].append(slope_time(fn, arg))
        print(f"  round {r + 1}/{rounds} done", flush=True)
    med = {k: statistics.median(v) for k, v in samples.items()}
    spread = {
        k: (max(v) - min(v)) / med[k] * 100 if med[k] else 0.0
        for k, v in samples.items()
    }

    print("\n== totals (medians; reconcile with bench) ==")
    report("int8 embed (production)", med["total_i8"],
           f"spread {spread['total_i8']:.0f}%")
    report("bf16 embed (production)", med["total_bf16"],
           f"ratio {med['total_bf16'] / med['total_i8']:.2f}x, "
           f"spread {spread['total_bf16']:.0f}%")
    report(f"fused MC head (T={T})", med["head"])
    print(
        f"  predicted bench: int8 "
        f"{1.0 / (med['total_i8'] + med['head']):6.1f} bags/s, bf16 "
        f"{1.0 / (med['total_bf16'] + med['head']):6.1f} bags/s"
    )

    print("\n== real per-stage pipelines (medians) ==")
    stem_fl = 2 * N * 112 * 112 * 64 * 7 * 7 * 3
    rows = [("stem(+pool+quant)", med["stem_bf16"], med["stem_i8"], stem_fl)]
    for stage in (1, 2, 3, 4):
        h, _cin, _s0, convs = stage_convs(stage)
        rows.append((
            f"layer{stage}", med[f"L{stage}_bf16"], med[f"L{stage}_i8"],
            conv_flops(h, convs),
        ))
    for name, tb, ti, _fl in rows:
        report(name, ti, f"(bf16 {tb * 1e3:6.3f} ms, ratio {tb / ti:.2f}x)")
    sum_b = sum(r[1] for r in rows)
    sum_i = sum(r[2] for r in rows)
    print(
        f"  stage sums: int8 {sum_i * 1e3:.3f} ms vs total "
        f"{med['total_i8'] * 1e3:.3f}; bf16 {sum_b * 1e3:.3f} ms vs total "
        f"{med['total_bf16'] * 1e3:.3f}"
    )

    print("\n== conv-only speed-of-light (medians, no epilogues) ==")
    report("stem conv (bf16 in both paths)", med["stem_conv"],
           f"(util bf16 {stem_fl / med['stem_conv'] / PEAK_BF16 * 100:4.1f}%)")
    for stage in (1, 2, 3, 4):
        h, _cin, _s0, convs = stage_convs(stage)
        fl = conv_flops(h, convs)
        ti, tb = med[f"L{stage}_conv_i8"], med[f"L{stage}_conv_bf16"]
        report(
            f"layer{stage} convs",
            ti,
            f"(bf16 {tb * 1e3:6.3f} ms, ratio {tb / ti:.2f}x; util "
            f"i8 {fl / ti / PEAK_INT8 * 100:4.1f}% bf16 "
            f"{fl / tb / PEAK_BF16 * 100:4.1f}%; spread i8 "
            f"{spread[f'L{stage}_conv_i8']:.0f}%)",
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
