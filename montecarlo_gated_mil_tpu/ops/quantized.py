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
  slower).  The stem maxpool runs on the *lazy* normalized f32 values and
  quantizes the pooled result — quantization is monotone, so it commutes
  with max, and the full-resolution 112^2 activation is never
  materialized (measured 2.19 -> 1.58 ms for the stem epilogue).
- **Raw conv outputs** stay bf16 by default; optional f8/int8 storage
  (``conv_store``, gated per conv on channel dim >= 128 by ``_store_for``)
  halves their write+2-read traffic but measured equal-or-slower on a
  quiet v5e — the conversion cost eats the bandwidth saving.  Kept as
  tested options for other TPU generations.
- **Everything else is exact**: BatchNorm statistics, normalization,
  residual adds, ReLU and the global average pool run in f32 with the same
  masked batch-stats semantics as the float path (``models/resnet.py``;
  reference BN deactivation, ``/root/reference/main.py:16-20``), and the
  gated-attention head is untouched (it is ~2% of the time).

Measured (docs/PERFORMANCE.md §Round 2b/2c): embed 7.57 -> 5.75 ms (1.30x)
for the int8 convs, -> 5.43 ms with the pool-first stem; feature cosine vs
the bf16 path 0.985-0.995, MC predictions agree.  A dynamic
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
from jax.scipy.stats import norm

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


# --------------------------------------------------------------------------
# Static moments for pre-BN conv outputs (the ``conv_store="i8"`` path).
#
# The BN guarantee gives every *post-norm* activation exact per-channel
# moments (mean beta, std |gamma|) at build time.  Pushing those through
# relu (closed-form Gaussian relu moments) and then through a conv under a
# pixel-independence approximation yields per-output-channel moments of the
# *raw* conv output t — enough for a static int8 storage scale
# ``(|mean| + k*rho*std)/127``.  ``rho`` inflates the independent-pixel
# variance to cover spatial correlation (neighboring feature-map pixels are
# correlated, which the independence sum underestimates); the k-sigma tail
# plus rho headroom makes clipping benign, and the BN statistics are
# computed from the *stored* tensor, so downstream activation-scale
# guarantees stay exact.


def _relu_moments(mu: Array, sigma: Array) -> tuple[Array, Array]:
    """E and Var of relu(X), X ~ N(mu, sigma^2), per channel."""
    sigma = jnp.maximum(sigma, 1e-12)
    a = mu / sigma
    e1 = mu * norm.cdf(a) + sigma * norm.pdf(a)
    e2 = (jnp.square(mu) + jnp.square(sigma)) * norm.cdf(a) + mu * sigma * norm.pdf(a)
    return e1, jnp.maximum(e2 - jnp.square(e1), 0.0)


def _bn_relu_moments(bn: dict) -> tuple[Array, Array]:
    """Moments of relu(BN(x)) — exact at build time via the BN affine."""
    return _relu_moments(
        bn["bias"].astype(jnp.float32), jnp.abs(bn["scale"].astype(jnp.float32))
    )


def _conv_t_scale(
    w: Array, mu_in: Array, var_in: Array, k: float, rho: float
) -> Array:
    """int8 storage scale for t = conv(a, w) given input-channel moments."""
    w = jnp.asarray(w, jnp.float32)
    mean_t = jnp.einsum("hwio,i->o", w, mu_in)
    var_t = jnp.einsum("hwio,i->o", jnp.square(w), var_in)
    bound = jnp.abs(mean_t) + k * rho * jnp.sqrt(var_t)
    return jnp.maximum(bound, 1e-3) / 127.0


# Exact per-channel bounds of ImageNet-normalized [0, 1] pixels:
# max(|(0-mean)/std|, |(1-mean)/std|) per channel — the stem input's int8
# scale is static and clips NOTHING for real pixel data (synthetic test
# inputs outside this range saturate benignly).
_IMAGENET_INPUT_BOUND = (2.249, 2.429, 2.640)


def quantize_backbone_static(
    params: dict,
    backbone: str = "r18",
    k: float = 6.0,
    *,
    conv_store: str = "bf16",
    rho: float = 2.0,
    stem: str = "bf16",
) -> dict:
    """Static-scale quantization plan: every activation's int8 scale is
    known at build time (from the BN affines), so runtime quantization is a
    pure elementwise epilogue — no dynamic reductions, no extra HBM sweeps.

    ``conv_store`` picks the storage dtype of the *raw pre-BN conv outputs*
    (the tensor written by every conv and re-read twice, for stats and for
    the normalize epilogue — the dominant remaining HBM traffic):

    - ``"bf16"``: exact storage — the default, and the fastest measured on
      a quiet v5e (full r18 embed 5.43 ms vs 5.89 f8 / 5.51 i8,
      tools/profile_int8.py; the 1-byte stores only looked faster under
      host contention — docs/PERFORMANCE.md §methodology item 3).
    - ``"i8"``: int8 with static per-channel scales from propagated
      activation moments (see ``_conv_t_scale``).
    - ``"f8"``: float8_e4m3fn — no bound machinery (values clamp at the
      e4m3fn max; overflow would otherwise convert to NaN).

    Accuracy (feature cosine vs float): 0.991 bf16, 0.985 f8/i8; MC
    predictions agree for all three (tests/test_quantized.py).

    BN statistics are always computed from the tensor *as stored*, so the
    k-sigma activation-scale guarantees remain exact for every
    ``conv_store``.

    Returns a pytree holding folded int8 kernels, per-cout dequant scales,
    BN affines, and the per-tensor activation scales (``bound/127``).

    Outside a trace on a non-CPU backend, when the parameters are already
    HOST-RESIDENT (numpy or committed to the CPU backend — how
    ``server.build_predictor`` hands them over), the plan is built eagerly
    on the in-process CPU and shipped down in one ``device_put``: built
    op-by-op on the tunneled TPU backend it costs ~70 s of tiny
    compiles+dispatches (measured, tools/probe_build_phases.py) vs <1 s on
    the CPU — the dominant term of serving cold start.  Device-resident
    parameters deliberately do NOT take this path: pulling them back would
    be a device->host read on a build path, which on the tunneled runtime
    hits the first-fetch stall (1-4 min; CLAUDE.md invariant) — they build
    eagerly on their own device instead.  Inside jit (the train-time
    ``make_embed_fn`` path) it traces as before.
    """

    def _host_resident(x) -> bool:
        if isinstance(x, jax.core.Tracer):
            return False
        devs = getattr(x, "devices", None)
        if devs is None:
            return True  # numpy / python scalar
        try:
            return all(d.platform == "cpu" for d in x.devices())
        except Exception:  # noqa: BLE001 — unknown array type: stay safe
            return False

    leaves = jax.tree.leaves(params)
    if (
        jax.default_backend() != "cpu"
        and leaves
        and all(_host_resident(x) for x in leaves)
    ):
        host_params = jax.device_get(params)
        with jax.default_device(jax.devices("cpu")[0]):
            plan = _build_static_plan(
                host_params, backbone, k,
                conv_store=conv_store, rho=rho, stem=stem,
            )
        dev = jax.devices()[0]
        # The plan carries non-array leaves (mode strings); ship only arrays.
        return jax.tree.map(
            lambda x: jax.device_put(x, dev) if hasattr(x, "dtype") else x,
            plan,
        )
    return _build_static_plan(
        params, backbone, k, conv_store=conv_store, rho=rho, stem=stem
    )


def _build_static_plan(
    params: dict,
    backbone: str,
    k: float,
    *,
    conv_store: str,
    rho: float,
    stem: str,
) -> dict:
    if backbone not in _STAGES:
        raise ValueError(f"quantized path supports {sorted(_STAGES)}, got {backbone!r}")
    if conv_store not in ("bf16", "f8", "i8"):
        raise ValueError(f"conv_store must be bf16|f8|i8, got {conv_store!r}")
    if stem not in ("s2d_i8", "bf16"):
        raise ValueError(f"stem must be s2d_i8|bf16, got {stem!r}")
    # Stem options (a DIRECT int8 7x7 conv at Cin=3 measured 0.75x — int8's
    # (32, 128) tiling pads 3 channels terribly):
    # - "bf16" (default): the exact stem, fastest IN CONTEXT.
    # - "s2d_i8": the exact space-to-depth transform of the 7x7-s2 stem
    #   (4x4-s1 conv over (112, 112, 12) input; same parameter, rearranged
    #   at build time — models/resnet.py::SpaceToDepthStem derivation)
    #   quantized int8 with the exact ImageNet-normalized-[0,1] input
    #   bound (zero clipping on real pixels; cosine 0.9998).  The isolated
    #   conv measures 1.14x bf16 (0.746 -> 0.653 ms) — but in the full
    #   embed it is a NET REGRESSION (5.6 -> 6.6 ms; bench 185 -> 155/s):
    #   the fused quantize + space-to-depth transpose of the (N, 224, 224,
    #   3) input is a relayout sweep XLA cannot hide, costing far more
    #   than the int8 conv saves (measured round 3, tools/profile_int8.py
    #   s2d + full).  Kept as a tested option for pipelines that can emit
    #   s2d-int8 patches directly.
    # The stem epilogue (stats, normalize, pool-first maxpool) is identical
    # for both; quantization of the pooled activation starts layer1 either
    # way.
    stages, bottleneck = _STAGES[backbone]
    out: dict = {
        "conv1": jnp.asarray(params["conv1"]["kernel"], jnp.bfloat16),
        "bn1": jax.tree.map(jnp.asarray, params["bn1"]),
        "conv_store": conv_store,
    }
    if stem == "s2d_i8":
        from montecarlo_gated_mil_tpu.models.resnet import s2d_stem_kernel

        w7 = jnp.asarray(params["conv1"]["kernel"], jnp.float32)  # (7,7,3,64)
        wk = s2d_stem_kernel(w7)
        in_bound = jnp.tile(jnp.asarray(_IMAGENET_INPUT_BOUND, jnp.float32), 4)
        out["stem_in_scale"] = in_bound / 127.0
        out["conv1_q"] = _fold_quantize(wk, out["stem_in_scale"])
    b = _relu_bound(params["bn1"], k)  # bound of the pooled stem activation
    # input-activation moments for conv_store="i8": stem output is
    # relu(BN)-distributed; maxpool shifts the mean up (max of 9 values) —
    # bump by one std, the k*rho headroom covers the rest.
    mu_in, var_in = _bn_relu_moments(params["bn1"])
    mu_in = mu_in + jnp.sqrt(var_in)

    def tq(w, mu, var):
        return _conv_t_scale(w, mu, var, k, rho) if conv_store == "i8" else None

    for stage, blocks in enumerate(stages, start=1):
        for blk_i in range(blocks):
            blk = params[f"layer{stage}_{blk_i}"]
            q: dict = {"in_scale": b / 127.0}
            q["conv1"] = _fold_quantize(blk["conv1"]["kernel"], q["in_scale"])
            q["conv1"]["t"] = tq(blk["conv1"]["kernel"], mu_in, var_in)
            q["bn1"] = jax.tree.map(jnp.asarray, blk["bn1"])
            q["mid_scale"] = _relu_bound(blk["bn1"], k) / 127.0
            mu_mid, var_mid = _bn_relu_moments(blk["bn1"])
            q["conv2"] = _fold_quantize(blk["conv2"]["kernel"], q["mid_scale"])
            q["conv2"]["t"] = tq(blk["conv2"]["kernel"], mu_mid, var_mid)
            q["bn2"] = jax.tree.map(jnp.asarray, blk["bn2"])
            if bottleneck:  # 1x1 -> 3x3 -> 1x1 (models/resnet.py::Bottleneck)
                q["mid2_scale"] = _relu_bound(blk["bn2"], k) / 127.0
                mu_mid2, var_mid2 = _bn_relu_moments(blk["bn2"])
                q["conv3"] = _fold_quantize(blk["conv3"]["kernel"], q["mid2_scale"])
                q["conv3"]["t"] = tq(blk["conv3"]["kernel"], mu_mid2, var_mid2)
                q["bn3"] = jax.tree.map(jnp.asarray, blk["bn3"])
                final_bn = blk["bn3"]
            else:
                final_bn = blk["bn2"]
            if "downsample_conv" in blk:
                q["downsample_conv"] = _fold_quantize(
                    blk["downsample_conv"]["kernel"], q["in_scale"]
                )
                q["downsample_conv"]["t"] = tq(
                    blk["downsample_conv"]["kernel"], mu_in, var_in
                )
                q["downsample_bn"] = jax.tree.map(jnp.asarray, blk["downsample_bn"])
                id_bound = _signed_bound(blk["downsample_bn"], k)
                mu_id = blk["downsample_bn"]["bias"].astype(jnp.float32)
                var_id = jnp.square(
                    blk["downsample_bn"]["scale"].astype(jnp.float32)
                )
            else:
                id_bound = b
                mu_id, var_id = mu_in, var_in
            # relu(norm(t_final) + identity): bound is the sum of bounds
            b = _signed_bound(final_bn, k) + id_bound
            q["out_scale"] = b / 127.0
            # out = relu(N(beta_f, gamma_f^2) + identity): Gaussian-sum
            # approximation for the next block's input moments.
            mu_in, var_in = _relu_moments(
                final_bn["bias"].astype(jnp.float32) + mu_id,
                jnp.sqrt(
                    jnp.square(final_bn["scale"].astype(jnp.float32)) + var_id
                ),
            )
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


def _store_for(qw: dict, store: str) -> str:
    """Narrow (1-byte) storage is gated off C<128 stages, where the (32,128)
    1-byte tiling pads lanes (measured 0.83-0.91x of bf16 on quiet v5e,
    tools/profile_int8.py).  Note the quiet-host verdict: even at C>=128,
    f8/i8 storage measures equal-or-slower than bf16 on v5e — ``conv_store``
    defaults to bf16 and the narrow stores exist for other generations."""
    if store != "bf16" and qw["w"].shape[-1] >= 128:
        return store
    return "bf16"


def _qconv_stored(ai: Array, qw: dict, stride: int, pad: int, store: str) -> Array:
    """int8 conv whose raw output is *stored* in ``store`` dtype.  The
    dequant (and for i8 the static t-scale requant) fuses into the conv
    epilogue; callers read the result back through ``_load_t``."""
    store = _store_for(qw, store)
    y = jax.lax.conv_general_dilated(
        ai,
        qw["w"],
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    if store == "i8":
        return jnp.clip(
            jnp.round(y.astype(jnp.float32) * (qw["s"] / qw["t"])), -127, 127
        ).astype(jnp.int8)
    yf = y.astype(jnp.float32) * qw["s"]
    if store == "f8":
        # e4m3fn is finite-only: clamp explicitly so a rare out-of-range
        # conv output saturates instead of converting to NaN.
        return jnp.clip(yf, -448.0, 448.0).astype(jnp.float8_e4m3fn)
    return yf.astype(jnp.bfloat16)


def _load_t(t: Array, qw: dict, store: str) -> Array:
    """Dequantized f32 view of a stored conv output (lazy; fuses into
    whatever consumes it — BN stats and the normalize epilogue)."""
    if _store_for(qw, store) == "i8":
        return t.astype(jnp.float32) * qw["t"]
    return t.astype(jnp.float32)


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
    if "conv1_q" in qparams and patches.shape[1] % 2 == 0 and patches.shape[2] % 2 == 0:
        # s2d int8 stem: quantize the space-to-depth input with the static
        # ImageNet bound (fused with the rearrange into one pass) and run
        # the exact 4x4-s1 transform of the 7x7-s2 conv on the MXU in int8.
        from montecarlo_gated_mil_tpu.models.resnet import s2d_input

        x2 = s2d_input(patches.astype(jnp.float32))
        ai = jnp.clip(
            jnp.round(x2 / qparams["stem_in_scale"]), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            ai,
            qparams["conv1_q"]["w"],
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        t = (y.astype(jnp.float32) * qparams["conv1_q"]["s"]).astype(jnp.bfloat16)
    else:
        t = jax.lax.conv_general_dilated(
            patches.astype(jnp.bfloat16),
            qparams["conv1"],
            window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
    se, be = _bn_affine(t, qparams["bn1"], mask)
    # Pool FIRST on the (lazy) f32 normalized values, quantize the pooled
    # result: the normalize+relu chain fuses into reduce_window's input, so
    # the full-resolution 112^2 activation is never materialized (measured
    # 2.19 -> 1.58 ms for the stem epilogue, bit-identical output —
    # quantization is monotone, so it commutes with max;
    # tools/profile_int8.py).  The requant reciprocal folds INTO the BN
    # affine (positive per-channel scaling commutes with relu and max), so
    # the epilogue is one fused multiply-add per element — no post-pool
    # divide (round-5 epilogue-thinning pass, tools/profile_int8.py).
    b1 = qparams["layer1_0"]["in_scale"]
    a0 = jnp.maximum(t.astype(jnp.float32) * (se / b1) + be / b1, 0.0)
    pooled = jax.lax.reduce_window(
        a0,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    x_q = jnp.clip(jnp.round(pooled), -127, 127).astype(jnp.int8)
    x_scale = b1  # dequant scale of x_q

    store = qparams.get("conv_store", "bf16")

    def norm_relu_quant(tl, bn, scale):
        # Same folding: relu(t*se+be)/scale == relu(t*(se/scale)+be/scale)
        # for positive per-channel scale — one multiply-add per element.
        se, be = _bn_affine(tl, bn, mask)
        a = jnp.maximum(tl * (se / scale) + be / scale, 0.0)
        return jnp.clip(jnp.round(a), -127, 127).astype(jnp.int8)

    stages, bottleneck = _STAGES[backbone]
    for stage, blocks in enumerate(stages, start=1):
        for blk_i in range(blocks):
            q = qparams[f"layer{stage}_{blk_i}"]
            stride = 2 if stage > 1 and blk_i == 0 else 1
            if bottleneck:
                t1 = _qconv_stored(x_q, q["conv1"], 1, 0, store)  # 1x1
                m1 = norm_relu_quant(
                    _load_t(t1, q["conv1"], store), q["bn1"], q["mid_scale"]
                )
                t2 = _qconv_stored(m1, q["conv2"], stride, 1, store)  # 3x3
                m2 = norm_relu_quant(
                    _load_t(t2, q["conv2"], store), q["bn2"], q["mid2_scale"]
                )
                tf = _load_t(
                    _qconv_stored(m2, q["conv3"], 1, 0, store), q["conv3"], store
                )  # 1x1
                sef, bef = _bn_affine(tf, q["bn3"], mask)
            else:
                t1 = _qconv_stored(x_q, q["conv1"], stride, 1, store)
                m1 = norm_relu_quant(
                    _load_t(t1, q["conv1"], store), q["bn1"], q["mid_scale"]
                )
                tf = _load_t(
                    _qconv_stored(m1, q["conv2"], 1, 1, store), q["conv2"], store
                )
                sef, bef = _bn_affine(tf, q["bn2"], mask)
            last = stage == len(stages) and blk_i == blocks - 1
            # Fold the requant reciprocal into every affine feeding the
            # residual sum (relu commutes with the positive scaling); the
            # last block returns unscaled features, so it keeps inv=1.
            inv = 1.0 if last else 1.0 / q["out_scale"]
            if "downsample_conv" in q:
                d = _load_t(
                    _qconv_stored(x_q, q["downsample_conv"], stride, 0, store),
                    q["downsample_conv"],
                    store,
                )
                sed, bed = _bn_affine(d, q["downsample_bn"], mask)
                identity = d * (sed * inv) + bed * inv
            else:
                identity = x_q.astype(jnp.float32) * (x_scale * inv)
            xr = jnp.maximum(tf * (sef * inv) + bef * inv + identity, 0.0)
            if last:
                return jnp.mean(xr, axis=(1, 2))
            x_q = jnp.clip(jnp.round(xr), -127, 127).astype(jnp.int8)
            x_scale = q["out_scale"]
    raise AssertionError("unreachable")
