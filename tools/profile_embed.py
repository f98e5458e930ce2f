#!/usr/bin/env python
"""Embed-pipeline profiler: the round-2 measurement harness.

Reproduces the measurements behind docs/PERFORMANCE.md §"Round 2: the embed
ceiling" on the real TPU — per-stage times with *correct* FLOP accounting
(2·MACs), isolated conv-pass throughput, and the stem's cost decomposition.
All timings use the chained-scan slope method (tunnel-safe; see
docs/PERFORMANCE.md §Measurement methodology).

Usage: python tools/profile_embed.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from montecarlo_gated_mil_tpu.utils.profiling import slope_time  # noqa: E402

N = 256  # bag size (patches)


def stage_flops(h: int, cin: int, cout: int, n_convs: int, stride_first=False):
    """GFLOP (2·MACs) of a stage's 3x3 convs at output spatial h x h."""
    return 2 * N * h * h * 9 * cin * cout * n_convs / 1e9


def main():
    import flax.linen as nn

    from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL
    from montecarlo_gated_mil_tpu.models.resnet import (
        BasicBlock,
        MaskedBatchStatsNorm,
    )

    print(f"backend: {jax.default_backend()}")
    model = MultiHeadGatedAttentionMIL(backbone="r18", dtype=jnp.bfloat16)
    key = jax.random.key(0)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        jnp.zeros((8, 64, 64, 3), jnp.float32),
        jnp.ones((8,), bool),
    )
    feats = variables["params"]["features"]
    mask = jnp.ones((N,), bool)
    patches = jax.random.normal(key, (N, 224, 224, 3), jnp.float32)

    def stem(p):
        m = nn.Conv(
            64, (7, 7), (2, 2), ((3, 3), (3, 3)), use_bias=False,
            dtype=jnp.bfloat16,
        )
        y = m.apply({"params": feats["conv1"]}, p.astype(jnp.bfloat16))
        y = MaskedBatchStatsNorm().apply({"params": feats["bn1"]}, y, mask)
        return nn.max_pool(nn.relu(y), (3, 3), (2, 2), ((1, 1), (1, 1)))

    def stage(x, stage_i, feat):
        for b in range(2):
            stride = 2 if stage_i > 1 and b == 0 else 1
            x = BasicBlock(features=feat, stride=stride, dtype=jnp.bfloat16).apply(
                {"params": feats[f"layer{stage_i}_{b}"]}, x, mask
            )
        return x

    x0 = jax.jit(stem)(patches)
    xs = [x0]
    for i, f in ((1, 64), (2, 128), (3, 256)):
        xs.append(jax.jit(lambda x, i=i, f=f: stage(x, i, f))(xs[-1]))

    # stage FLOPs (r18, 2 basic blocks each; first block of l2+ has a
    # stride-2 conv1 at half FLOPs plus a 1x1 downsample)
    gf = {
        "stem": 2 * N * 112 * 112 * 7 * 7 * 3 * 64 / 1e9,
        "l1": stage_flops(56, 64, 64, 4),
        "l2": stage_flops(28, 64, 128, 1) + stage_flops(28, 128, 128, 3)
        + 2 * N * 28 * 28 * 64 * 128 / 1e9,
        "l3": stage_flops(14, 128, 256, 1) + stage_flops(14, 256, 256, 3)
        + 2 * N * 14 * 14 * 128 * 256 / 1e9,
        "l4": stage_flops(7, 256, 512, 1) + stage_flops(7, 512, 512, 3)
        + 2 * N * 7 * 7 * 256 * 512 / 1e9,
    }
    times = {"stem": slope_time(stem, patches)}
    for i, f in ((1, 64), (2, 128), (3, 256), (4, 512)):
        times[f"l{i}"] = slope_time(
            lambda x, i=i, f=f: stage(x, i, f), xs[i - 1]
        )
    total_gf = sum(gf.values())
    print("\nper-stage (256-patch bag, bf16):")
    for k in gf:
        print(
            f"  {k:4s}: {times[k]*1e3:6.2f} ms  {gf[k]:6.1f} GFLOP"
            f"  {gf[k]/times[k]/1e3:5.0f} TF/s"
        )
    t_embed = slope_time(
        lambda p: model.apply(variables, p, mask, method="embed"), patches
    )
    print(
        f"  full embed: {t_embed*1e3:.2f} ms, {total_gf:.0f} GFLOP"
        f" -> {total_gf/t_embed/1e3:.0f} TF/s"
        f" ({total_gf/t_embed/1e3/197*100:.0f}% of bf16 peak)"
    )
    t_embed_b = slope_time(
        lambda p: model.apply(variables, p, mask, method="embed"),
        patches.astype(jnp.bfloat16),
    )
    print(f"  full embed, bf16-fed patches: {t_embed_b*1e3:.2f} ms")

    # isolated fused conv pass (norm+relu -> conv -> stats), the per-conv
    # practical ceiling XLA reaches when nothing else is in the program
    for h, c in ((56, 64), (28, 128), (14, 256)):
        xd = jax.random.normal(key, (N, h, h, c), jnp.bfloat16)
        wgt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.05
        se = jnp.ones((c,), jnp.float32)
        be = jnp.zeros((c,), jnp.float32)

        def xla_pass(xd):
            a = jnp.maximum(xd.astype(jnp.float32) * se + be, 0.0)
            y = jax.lax.conv_general_dilated(
                a.astype(jnp.bfloat16), wgt, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return y.astype(jnp.bfloat16), jnp.stack(
                [jnp.sum(y, (0, 1, 2)), jnp.sum(y * y, (0, 1, 2))]
            )

        t = slope_time(xla_pass, xd)
        g = 2 * N * h * h * 9 * c * c / 1e9
        print(
            f"  isolated conv+stats pass {h}x{h}x{c}: {t*1e3:.3f} ms"
            f" ({g/t/1e3:.0f} TF/s)"
        )


if __name__ == "__main__":
    main()
