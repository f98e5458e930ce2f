"""int8 MXU serving path: post-training-quantized ResNet embedding.

The v5e's int8 matmul peak is 2x bf16 (394 vs 197 TOPS), and measured int8
convolutions run 1.6-4.9x faster than bf16 at this model's shapes
(docs/PERFORMANCE.md §Round 2).  With the bf16 embed at its practical XLA
ceiling, quantization is the remaining integer-factor lever for inference.

Scheme (symmetric PTQ with **static activation scales** — no calibration
data and no runtime reductions):

- **Weights**: per-output-channel symmetric int8, with the input tensor's
  per-channel activation scales folded into the kernel before quantization
  (``conv(a/s_in, q(w*s_in)) * s_w == conv(a, w)``), built once.
- **Activations**: static per-channel k-sigma scales.  This is the part
  batch-stats BN makes possible: the normalized output of every BN has
  *exactly* mean beta and std |gamma| over the bag's valid pixels (by
  construction — there are no running stats to drift), so
  ``beta + k*|gamma|`` bounds the post-ReLU activation at build time.
  Quantization is then a pure elementwise epilogue fused into the
  producing normalize pass (int8 writes, int8 conv reads); clipping the
  k-sigma tail is benign.  Static scales also mean padded patches cannot
  perturb valid ones.
- **Convolutions**: int8 x int8 -> int32 on the MXU, dequantized with the
  per-output-channel folded scale.  The **stem stays bf16**: it is
  HBM-bound and int8's (32, 128) tiling pads Cin=3 terribly (measured
  slower).  The maxpool commutes with the positive per-channel scales and
  runs directly on int8.
- **Everything else is exact**: BatchNorm statistics, normalization,
  residual adds, ReLU and the global average pool run in f32 with the same
  masked batch-stats semantics as the float path (``models/resnet.py``;
  reference BN deactivation, ``/root/reference/main.py:16-20``), and the
  gated-attention head is untouched (it is ~2% of the time).

Measured (docs/PERFORMANCE.md §Round 2): embed 7.57 -> 5.75 ms (1.30x),
feature cosine vs the bf16 path 0.995, MC predictions agree.  A dynamic
per-patch-scale variant was also built and measured: more accurate (cosine
0.9988) but 1.00x — the runtime max-abs + quantize sweeps exactly cancel
the MXU gain; static scales are the design that wins.

This is an **opt-in inference path** (``MCDOPredictor(..., quantized=True)``
/ ``tpu.quantized_inference``): training and the default eval path stay
bf16/f32-exact.  Accuracy is asserted in tests (feature agreement + MCDO
prediction agreement vs the float path on synthetic bags).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array

BN_EPS = 1e-5
# backbone -> (stage sizes, bottleneck?)
_STAGES = {
    "r18": ((2, 2, 2, 2), False),
    "r34": ((3, 4, 6, 3), False),
    "r50": ((3, 4, 6, 3), True),
}


def quantize_kernel(w: Array) -> dict:
    """(kh, kw, cin, cout) float kernel -> int8 weights + per-cout scales."""
    w = jnp.asarray(w, jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    wi = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"w": wi, "s": s}


def _fold_quantize(w: Array, s_in: Array) -> dict:
    """Fold per-input-channel activation scales into a conv kernel, then
    quantize per-output-channel: conv(a/s_in, q(w*s_in)) * s_w == conv(a, w)."""
    return quantize_kernel(jnp.asarray(w, jnp.float32) * s_in[None, None, :, None])


def _relu_bound(bn: dict, k: float) -> Array:
    """Static per-channel bound of relu(BN(x)): batch-stats BN guarantees
    post-norm mean beta and std |gamma| over the bag's valid pixels, so
    beta + k*|gamma| covers all but the k-sigma tail (clipping the tail is
    benign for int8)."""
    g = jnp.abs(bn["scale"].astype(jnp.float32))
    b = bn["bias"].astype(jnp.float32)
    return jnp.maximum(b + k * g, 1e-3)


def _signed_bound(bn: dict, k: float) -> Array:
    g = jnp.abs(bn["scale"].astype(jnp.float32))
    b = jnp.abs(bn["bias"].astype(jnp.float32))
    return jnp.maximum(b + k * g, 1e-3)


def quantize_backbone_static(
    params: dict, backbone: str = "r18", k: float = 6.0
) -> dict:
    """Static-scale quantization plan: every activation's int8 scale is
    known at build time (from the BN affines), so runtime quantization is a
    pure elementwise epilogue — no dynamic reductions, no extra HBM sweeps.

    Returns a pytree holding folded int8 kernels, per-cout dequant scales,
    BN affines, and the per-tensor activation scales (``bound/127``).
    """
    if backbone not in _STAGES:
        raise ValueError(f"quantized path supports {sorted(_STAGES)}, got {backbone!r}")
    # Stem stays bf16: it is HBM-bound, and an int8 conv at Cin=3 is slower
    # than bf16 (int8's (32, 128) tiling pads 3 channels terribly — measured
    # stem 1.78 -> 2.48 ms when quantized).  Quantization starts at layer1,
    # fused into the stem's normalize epilogue.
    stages, bottleneck = _STAGES[backbone]
    out: dict = {
        "conv1": jnp.asarray(params["conv1"]["kernel"], jnp.bfloat16),
        "bn1": jax.tree.map(jnp.asarray, params["bn1"]),
    }
    b = _relu_bound(params["bn1"], k)  # bound of the pooled stem activation
    for stage, blocks in enumerate(stages, start=1):
        for blk_i in range(blocks):
            blk = params[f"layer{stage}_{blk_i}"]
            q: dict = {"in_scale": b / 127.0}
            q["conv1"] = _fold_quantize(blk["conv1"]["kernel"], q["in_scale"])
            q["bn1"] = jax.tree.map(jnp.asarray, blk["bn1"])
            q["mid_scale"] = _relu_bound(blk["bn1"], k) / 127.0
            q["conv2"] = _fold_quantize(blk["conv2"]["kernel"], q["mid_scale"])
            q["bn2"] = jax.tree.map(jnp.asarray, blk["bn2"])
            if bottleneck:  # 1x1 -> 3x3 -> 1x1 (models/resnet.py::Bottleneck)
                q["mid2_scale"] = _relu_bound(blk["bn2"], k) / 127.0
                q["conv3"] = _fold_quantize(blk["conv3"]["kernel"], q["mid2_scale"])
                q["bn3"] = jax.tree.map(jnp.asarray, blk["bn3"])
                final_bn = blk["bn3"]
            else:
                final_bn = blk["bn2"]
            if "downsample_conv" in blk:
                q["downsample_conv"] = _fold_quantize(
                    blk["downsample_conv"]["kernel"], q["in_scale"]
                )
                q["downsample_bn"] = jax.tree.map(jnp.asarray, blk["downsample_bn"])
                id_bound = _signed_bound(blk["downsample_bn"], k)
            else:
                id_bound = b
            # relu(norm(t_final) + identity): bound is the sum of bounds
            b = _signed_bound(final_bn, k) + id_bound
            q["out_scale"] = b / 127.0
            out[f"layer{stage}_{blk_i}"] = q
    return out


def _qconv_static(ai: Array, qw: dict, stride: int, pad: int) -> Array:
    """int8 activations (already scaled) x folded int8 weights -> f32."""
    y = jax.lax.conv_general_dilated(
        ai,
        qw["w"],
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * qw["s"]).astype(jnp.bfloat16)


def _quantize_act(a: Array, scale: Array) -> Array:
    return jnp.clip(jnp.round(a.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )


def _bn_affine(y: Array, bn: dict, mask: Array) -> tuple[Array, Array]:
    """Masked batch stats of y -> the effective (scale, bias) f32 affine."""
    m = mask.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    s_p = jnp.sum(yf, axis=(1, 2))
    sq_p = jnp.sum(jnp.square(yf), axis=(1, 2))
    n_valid = jnp.sum(m)
    count = jnp.maximum(n_valid * (y.shape[1] * y.shape[2]), 1.0)
    mean = (m @ s_p) / count
    var = (m @ sq_p) / count - jnp.square(mean)
    inv = jax.lax.rsqrt(var + BN_EPS)
    se = bn["scale"].astype(jnp.float32) * inv * jnp.minimum(n_valid, 1.0)
    be = bn["bias"].astype(jnp.float32) - mean * bn["scale"].astype(
        jnp.float32
    ) * inv * jnp.minimum(n_valid, 1.0)
    return se, be


def quantized_embed_static(
    qparams: dict,
    patches: Array,
    mask: Array | None = None,
    *,
    backbone: str = "r18",
) -> Array:
    """int8 embed with static activation scales: the fast quantized path.

    Per conv the only HBM sweeps are: int8 activation read (conv), bf16 raw
    conv output write, one read of it for the fused stats + normalize +
    re-quantize epilogue, int8 activation write — strictly less traffic
    than the bf16 float path, with 2x MXU int8 throughput on every conv.
    """
    n = patches.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    t = jax.lax.conv_general_dilated(
        patches.astype(jnp.bfloat16),
        qparams["conv1"],
        window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )
    se, be = _bn_affine(t, qparams["bn1"], mask)
    # normalize + relu + static re-quantize, one fused elementwise pass;
    # maxpool commutes with the positive per-channel scale, so it runs on
    # int8 directly.
    b1 = qparams["layer1_0"]["in_scale"]
    a0 = jnp.clip(
        jnp.round(
            jnp.maximum(t.astype(jnp.float32) * se + be, 0.0) / b1
        ),
        -127,
        127,
    ).astype(jnp.int8)
    x_q = jax.lax.reduce_window(
        a0,
        jnp.int8(-128),
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    x_scale = b1  # dequant scale of x_q

    def norm_relu_quant(t, bn, scale):
        se, be = _bn_affine(t, bn, mask)
        a = jnp.maximum(t.astype(jnp.float32) * se + be, 0.0)
        return jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)

    stages, bottleneck = _STAGES[backbone]
    for stage, blocks in enumerate(stages, start=1):
        for blk_i in range(blocks):
            q = qparams[f"layer{stage}_{blk_i}"]
            stride = 2 if stage > 1 and blk_i == 0 else 1
            if bottleneck:
                t1 = _qconv_static(x_q, q["conv1"], 1, 0)  # 1x1
                m1 = norm_relu_quant(t1, q["bn1"], q["mid_scale"])
                t2 = _qconv_static(m1, q["conv2"], stride, 1)  # 3x3
                m2 = norm_relu_quant(t2, q["bn2"], q["mid2_scale"])
                tf = _qconv_static(m2, q["conv3"], 1, 0)  # 1x1
                sef, bef = _bn_affine(tf, q["bn3"], mask)
            else:
                t1 = _qconv_static(x_q, q["conv1"], stride, 1)
                m1 = norm_relu_quant(t1, q["bn1"], q["mid_scale"])
                tf = _qconv_static(m1, q["conv2"], 1, 1)
                sef, bef = _bn_affine(tf, q["bn2"], mask)
            if "downsample_conv" in q:
                d = _qconv_static(x_q, q["downsample_conv"], stride, 0)
                sed, bed = _bn_affine(d, q["downsample_bn"], mask)
                identity = d.astype(jnp.float32) * sed + bed
            else:
                identity = x_q.astype(jnp.float32) * x_scale
            xr = jnp.maximum(
                tf.astype(jnp.float32) * sef + bef + identity, 0.0
            )
            last = stage == len(stages) and blk_i == blocks - 1
            if last:
                return jnp.mean(xr, axis=(1, 2))
            x_q = jnp.clip(jnp.round(xr / q["out_scale"]), -127, 127).astype(
                jnp.int8
            )
            x_scale = q["out_scale"]
    raise AssertionError("unreachable")
