#!/usr/bin/env python
"""Full-production-scale measurement: raw mammogram -> MCDO predictions.

Reproduces the docs/PERFORMANCE.md §"Full production scale" number: one
7036x2800 mammogram (the reference's real data shape, config.yml:21-22),
75%-overlap tile grid (5,781 candidates), on-device tiling + fill-ranked
selection into a 1024-instance bucket, ResNet-18 embed, T=30 fused MC
gated attention — all inside one XLA program, timed with the chained-scan
slope method (docs/PERFORMANCE.md §Measurement methodology).

Usage: python tools/measure_fullscale.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from montecarlo_gated_mil_tpu.data.pipeline import (  # noqa: E402
    PipelineConfig,
    image_to_bag,
)
from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL  # noqa: E402
from montecarlo_gated_mil_tpu.ops.gated_attention import (  # noqa: E402
    GatedAttentionParams,
    mc_gated_attention_fused,
)

from montecarlo_gated_mil_tpu.utils.profiling import slope_time as _slope  # noqa: E402

H, W = 7036, 2800  # reference config.yml data.img_size
T = 30

# fewer, shorter chains: one full-scale mammogram pass is ~30-70 ms
slope_time = functools.partial(_slope, ks=(1, 3, 6))


def main():
    print(f"backend: {jax.default_backend()}")
    cfg = PipelineConfig(
        height=H, width=W, patch_size=224, overlap=0.75,
        empty_threshold=0.25, bucket=1024, dtype="bfloat16",
    )
    grid = cfg.grid()
    starts = jnp.asarray(grid.tiles_array()[:, :2])
    print(f"grid: {grid.num_tiles} candidate tiles -> bucket {cfg.bucket}")

    model = MultiHeadGatedAttentionMIL(backbone="r18", dtype=jnp.bfloat16)
    key = jax.random.key(0)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        jnp.zeros((8, 64, 64, 3), jnp.float32), jnp.ones((8,), bool),
    )
    kp = GatedAttentionParams.from_model_params(variables["params"])
    fd, ad = model.feature_dropout, model.attention_dropout

    # synthetic mammogram: breast-like filled blob on black background
    yy, xx = jnp.meshgrid(
        jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W), indexing="ij"
    )
    image = jnp.clip(
        (1.0 - (yy**2 + 2.0 * (xx + 0.45) ** 2))
        + 0.08 * jax.random.normal(key, (H, W)),
        0.0, 1.0,
    ).astype(jnp.float32)

    from montecarlo_gated_mil_tpu.ops.quantized import (
        quantize_backbone_static,
        quantized_embed_static,
    )

    def full(img, embed):
        bag = image_to_bag(
            img, jnp.asarray(False), jnp.asarray(0), jax.random.key(1),
            starts, cfg,
        )
        h = embed(bag.patches, bag.mask)
        y, _ = mc_gated_attention_fused(h, bag.mask, kp, T, 7, fd, ad)
        return y

    def embed_f(p, m):
        return model.apply(variables, p, m, method="embed")

    t_float = slope_time(functools.partial(full, embed=embed_f), image)
    print(f"float bf16 : {t_float * 1e3:6.1f} ms/mammogram"
          f" = {1.0 / t_float:5.1f}/s/chip")

    for store in ("bf16", "f8"):
        qp = quantize_backbone_static(
            variables["params"]["features"], "r18", conv_store=store
        )

        def embed_q(p, m, qp=qp):
            return quantized_embed_static(qp, p, m, backbone="r18").astype(
                jnp.float32
            )

        t_q = slope_time(functools.partial(full, embed=embed_q), image)
        print(f"int8 PTQ embed (conv_store={store:4s}): {t_q * 1e3:6.1f} "
              f"ms/mammogram = {1.0 / t_q:5.1f}/s/chip")


if __name__ == "__main__":
    main()
