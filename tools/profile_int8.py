#!/usr/bin/env python
"""int8-embed traffic experiments (round 2c).

The int8 PTQ embed (ops/quantized.py) is HBM-bound in its early stages; the
remaining avoidable traffic is (a) the stem's normalize->maxpool pair, which
materializes a full 112^2 int8 tensor between two sweeps, and (b) every
pre-BN conv output ``t`` being written + re-read in bf16.  This harness
measures, on the real TPU with the chained-scan slope method:

  1. the current quantized stem vs pool-fused variants,
  2. layer1/layer2 blocks with ``t`` stored bf16 (current) vs float8_e4m3fn
     vs int8-with-static-scale,
  3. whether the BN stats reduction fuses into the producing conv.

Usage: python tools/profile_int8.py [stem|blocks|full|all]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from montecarlo_gated_mil_tpu.ops.quantized import (  # noqa: E402
    _bn_affine,
    _qconv_static,
    quantize_backbone_static,
    quantize_kernel,
    quantized_embed_static,
)
from montecarlo_gated_mil_tpu.utils.profiling import slope_time  # noqa: E402

N = 256


def report(name, t, extra=""):
    print(f"  {name:38s}: {t * 1e3:7.3f} ms  {extra}", flush=True)


# ---------------------------------------------------------------- stem


def run_stem():
    print("\n== stem epilogue variants (conv bf16 -> stats -> norm+relu+"
          "quant -> 3x3 s2 maxpool -> int8) ==")
    key = jax.random.key(0)
    patches = jax.random.normal(key, (N, 224, 224, 3), jnp.bfloat16)
    w = jax.random.normal(key, (7, 7, 3, 64), jnp.bfloat16) * 0.05
    bn = {"scale": jnp.ones((64,), jnp.float32),
          "bias": jnp.zeros((64,), jnp.float32)}
    mask = jnp.ones((N,), bool)
    b1 = jnp.full((64,), 0.05, jnp.float32)

    def conv1(p):
        return jax.lax.conv_general_dilated(
            p, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    def conv_only(p):
        return conv1(p)

    def conv_stats(p):
        t = conv1(p)
        se, be = _bn_affine(t, bn, mask)
        return t, jnp.stack([se, be])

    def stem_now(p):
        t = conv1(p)
        se, be = _bn_affine(t, bn, mask)
        a0 = jnp.clip(
            jnp.round(jnp.maximum(t.astype(jnp.float32) * se + be, 0.0) / b1),
            -127, 127,
        ).astype(jnp.int8)
        return jax.lax.reduce_window(
            a0, jnp.int8(-128), jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    def stem_poolfirst(p):
        # maxpool the (lazy) f32 normalized values, quantize after: the
        # elementwise chain may fuse into reduce_window's input.
        t = conv1(p)
        se, be = _bn_affine(t, bn, mask)
        a = jnp.maximum(t.astype(jnp.float32) * se + be, 0.0)
        pooled = jax.lax.reduce_window(
            a, -jnp.inf, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        return jnp.clip(jnp.round(pooled / b1), -127, 127).astype(jnp.int8)

    def stem_pairmax(p):
        # reshape-decomposed maxpool: out[y,x] = max over {2y-1,2y,2y+1} x
        # {2x-1,2x,2x+1}; post-relu values are >= 0 so zero-padding == -inf
        # padding.  Pure elementwise/reshape ops give XLA full fusion
        # freedom (no reduce_window).
        t = conv1(p)
        se, be = _bn_affine(t, bn, mask)
        a = jnp.maximum(t.astype(jnp.float32) * se + be, 0.0)
        n, h, wd, c = a.shape

        def pool1d(x, axis):
            # x even-length along axis; window 3, stride 2, pad 1.
            m = x.shape[axis] // 2
            xr = x.reshape(x.shape[:axis] + (m, 2) + x.shape[axis + 1:])
            ev = xr[(slice(None),) * axis + (slice(None), 0)]
            od = xr[(slice(None),) * axis + (slice(None), 1)]
            pair = jnp.maximum(ev, od)  # max(a[2y], a[2y+1])
            prev_od = jnp.concatenate(
                [jnp.zeros_like(od[(slice(None),) * axis + (slice(0, 1),)]),
                 od[(slice(None),) * axis + (slice(0, m - 1),)]],
                axis=axis,
            )  # a[2y-1]
            return jnp.maximum(pair, prev_od)

        a = pool1d(a, 1)
        a = pool1d(a, 2)
        return jnp.clip(jnp.round(a / b1), -127, 127).astype(jnp.int8)

    report("conv only", slope_time(conv_only, patches))
    report("conv + stats", slope_time(conv_stats, patches))
    t0 = slope_time(stem_now, patches)
    report("stem current (quant -> int8 pool)", t0)
    t1 = slope_time(stem_poolfirst, patches)
    report("stem pool-first (f32 pool -> quant)", t1, f"{t0 / t1:.2f}x")
    t2 = slope_time(stem_pairmax, patches)
    report("stem pairmax (reshape pool)", t2, f"{t0 / t2:.2f}x")
    # numeric agreement
    r0 = jax.jit(stem_now)(patches)
    r2 = jax.jit(stem_pairmax)(patches)
    r1 = jax.jit(stem_poolfirst)(patches)
    print(f"  agreement now-vs-poolfirst: {float(jnp.mean(r0 == r1)):.6f}, "
          f"now-vs-pairmax: {float(jnp.mean(r0 == r2)):.6f}")


# ---------------------------------------------------------------- blocks


def _block_variant(x_q, q, mask, stride, t_store):
    """Basic block with a configurable storage dtype for pre-BN conv outs."""

    def store(t):
        if t_store == "bf16":
            return t  # _qconv_static already returns bf16
        if t_store == "f8":
            return t.astype(jnp.float8_e4m3fn)
        if t_store == "i8":
            # static t-scale: harness uses a generous fixed bound; the
            # production version derives it from layer moments.
            return jnp.clip(jnp.round(t.astype(jnp.float32) / 0.25),
                            -127, 127).astype(jnp.int8)
        raise ValueError(t_store)

    def load(t):
        if t_store == "i8":
            return t.astype(jnp.float32) * 0.25
        return t.astype(jnp.float32)

    t1 = store(_qconv_static(x_q, q["conv1"], stride, 1))
    se1, be1 = _bn_affine(t1, q["bn1"], mask)
    m1 = jnp.clip(
        jnp.round(jnp.maximum(load(t1) * se1 + be1, 0.0) / q["mid_scale"]),
        -127, 127,
    ).astype(jnp.int8)
    tf = store(_qconv_static(m1, q["conv2"], 1, 1))
    sef, bef = _bn_affine(tf, q["bn2"], mask)
    if "downsample_conv" in q:
        d = store(_qconv_static(x_q, q["downsample_conv"], stride, 0))
        sed, bed = _bn_affine(d, q["downsample_bn"], mask)
        identity = load(d) * sed + bed
    else:
        identity = x_q.astype(jnp.float32) * q["in_scale"]
    xr = jnp.maximum(load(tf) * sef + bef + identity, 0.0)
    return jnp.clip(jnp.round(xr / q["out_scale"]), -127, 127).astype(jnp.int8)


def run_blocks():
    print("\n== layer1/layer2 with pre-BN conv outputs stored bf16 / f8 / "
          "int8 ==")
    key = jax.random.key(1)
    mask = jnp.ones((N,), bool)
    from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL

    model = MultiHeadGatedAttentionMIL(backbone="r18", dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        jnp.zeros((8, 64, 64, 3), jnp.float32), jnp.ones((8,), bool),
    )
    qp = quantize_backbone_static(variables["params"]["features"], "r18")

    for stage, h, c in ((1, 56, 64), (2, 56, 64)):
        blocks = [qp[f"layer{stage}_{i}"] for i in range(2)]
        x_q = jax.random.randint(key, (N, h, h, c), -127, 128, jnp.int8)

        def run(x_q, t_store, blocks=blocks, stage=stage):
            for i, q in enumerate(blocks):
                stride = 2 if stage > 1 and i == 0 else 1
                x_q = _block_variant(x_q, q, mask, stride, t_store)
            return x_q

        tb = slope_time(functools.partial(run, t_store="bf16"), x_q)
        report(f"layer{stage} t=bf16 (current)", tb)
        for variant in ("f8", "i8"):
            tv = slope_time(functools.partial(run, t_store=variant), x_q)
            report(f"layer{stage} t={variant}", tv, f"{tb / tv:.2f}x")


def run_full():
    print("\n== full int8 embed by conv_store (pool-first stem) ==")
    key = jax.random.key(2)
    from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL

    model = MultiHeadGatedAttentionMIL(backbone="r18", dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        jnp.zeros((8, 64, 64, 3), jnp.float32), jnp.ones((8,), bool),
    )
    patches = jax.random.normal(key, (N, 224, 224, 3), jnp.bfloat16)
    mask = jnp.ones((N,), bool)
    for store in ("bf16", "f8", "i8"):
        qp = quantize_backbone_static(
            variables["params"]["features"], "r18", conv_store=store
        )
        t = slope_time(
            lambda p, qp=qp: quantized_embed_static(qp, p, mask, backbone="r18"),
            patches,
        )
        report(f"quantized_embed_static conv_store={store}", t)


def run_stem_s2d():
    """Round-3 experiment: int8 stem via the space-to-depth layout.

    The direct int8 stem measured slower than bf16 (Cin=3 pads terribly in
    int8's (32, 128) tiling).  The exact s2d transform of the 7x7-s2 stem
    (models/resnet.py::SpaceToDepthStem) regroups the same arithmetic into
    a 4x4-s1 conv over (112, 112, 12) input — Cin 12 quadruples the lane
    utilization, and the int8 input read is half the bf16 bytes.  The
    input's int8 scale is static and exact: patches are ImageNet-normalized
    from [0, 1] pixels, so each channel lies in [(0-mu)/sd, (1-mu)/sd].
    """
    print("\n== stem conv variants: bf16 7x7 vs s2d bf16 vs s2d int8 ==")
    key = jax.random.key(4)
    patches = jax.random.normal(key, (N, 224, 224, 3), jnp.bfloat16)
    w7 = jax.random.normal(key, (7, 7, 3, 64), jnp.float32) * 0.05

    from montecarlo_gated_mil_tpu.models.resnet import (
        s2d_input,
        s2d_stem_kernel as s2d_kernel,
    )

    def conv7(p):
        return jax.lax.conv_general_dilated(
            p, w7.astype(jnp.bfloat16), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    wk = s2d_kernel(w7)

    def conv_s2d_bf16(p):
        return jax.lax.conv_general_dilated(
            s2d_input(p).astype(jnp.bfloat16), wk.astype(jnp.bfloat16),
            (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )

    # static input scale: ImageNet-normalized [0,1] pixels per channel
    in_bound = jnp.full((12,), 2.7, jnp.float32)
    in_scale = in_bound / 127.0
    qw = quantize_kernel(wk * jnp.tile(in_scale, 1)[None, None, :, None])

    def conv_s2d_i8(p):
        ai = jnp.clip(
            jnp.round(s2d_input(p).astype(jnp.float32) / in_scale), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            ai, qw["w"], (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * qw["s"]).astype(jnp.bfloat16)

    def conv_i8_direct(p):
        s3 = in_scale[:3]
        q3 = quantize_kernel(w7 * s3[None, None, :, None])
        ai = jnp.clip(
            jnp.round(p.astype(jnp.float32) / s3), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            ai, q3["w"], (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * q3["s"]).astype(jnp.bfloat16)

    t0 = slope_time(conv7, patches)
    report("stem conv bf16 7x7 s2 (current)", t0)
    t1 = slope_time(conv_s2d_bf16, patches)
    report("stem conv s2d bf16 4x4 s1", t1, f"{t0 / t1:.2f}x")
    t2 = slope_time(conv_s2d_i8, patches)
    report("stem conv s2d int8 (quant fused)", t2, f"{t0 / t2:.2f}x")
    t3 = slope_time(conv_i8_direct, patches)
    report("stem conv direct int8 7x7 (known bad)", t3, f"{t0 / t3:.2f}x")
    # numeric agreement of the s2d int8 form vs the exact bf16 conv
    r_ref = jax.jit(conv7)(patches).astype(jnp.float32)
    r_i8 = jax.jit(conv_s2d_i8)(patches).astype(jnp.float32)
    cos = float(
        jnp.sum(r_ref * r_i8)
        / jnp.maximum(
            jnp.linalg.norm(r_ref.ravel()) * jnp.linalg.norm(r_i8.ravel()), 1e-9
        )
    )
    print(f"  s2d-int8 vs bf16 cosine: {cos:.5f}")


def run_batch():
    """Bag-batching on one chip, int8 path (the bf16 path measured negative
    in round 1: 7.26 ms at B=1 vs 9.0 ms/bag at B=2-4)."""
    print("\n== vmapped multi-bag int8 embed (per-bag time) ==")
    key = jax.random.key(3)
    from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL

    model = MultiHeadGatedAttentionMIL(backbone="r18", dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        jnp.zeros((8, 64, 64, 3), jnp.float32), jnp.ones((8,), bool),
    )
    qp = quantize_backbone_static(variables["params"]["features"], "r18")
    for bsz in (1, 2, 4):
        patches = jax.random.normal(key, (bsz, N, 224, 224, 3), jnp.bfloat16)
        mask = jnp.ones((bsz, N), bool)
        fn = jax.vmap(
            lambda p, m: quantized_embed_static(qp, p, m, backbone="r18")
        )
        t = slope_time(lambda p: fn(p, mask), patches)
        report(f"B={bsz}", t / bsz, f"({t * 1e3:.3f} ms total)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend: {jax.default_backend()}")
    if which in ("stem", "all"):
        run_stem()
    if which in ("blocks", "all"):
        run_blocks()
    if which in ("full", "all"):
        run_full()
    if which in ("s2d", "all"):
        run_stem_s2d()
    if which == "batch":
        run_batch()
