"""Monte-Carlo dropout inference: T vmapped head passes over one feature pass.

Capability spec: the reference amortizes the expensive backbone over T
stochastic passes of the cheap attention+classifier stage, either serially
(``/root/reference/model.py:330-401``) or via an expand-to-(T,...) batching
trick (``model.py:256-328``).  Both are replaced here by the idiomatic JAX
form: compute features once, then ``jax.vmap`` the model's ``head`` over T
PRNG keys — one compiled program, T independent dropout masks, no Python
loop, no host round-trips.

The uncertainty reductions the reference computes on host with numpy/torch
(``/root/reference/infer.py:47-74,212-219``; ``net_utils.py:207-210``) are
first-class on-device ops here.

Divergence note: the reference's ``mc_inference`` returns 2 values while its
callers unpack 3 (``net_utils.py:126,205``; ``infer.py:191`` vs
``model.py:328`` where ``, losses`` is commented out) — a latent crash.  This
rebuild implements the *intended* contract: predictions, attention, and
(when targets are given) per-sample auxiliary losses.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.models.gamil import auxiliary_loss

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MCOutputs:
    """Raw Monte-Carlo outputs for one bag (or a leading batch of bags).

    predictions: ``(T, C)`` raw logits (reference ``model.py:316``).
    attention: ``(T, C, N)`` post-softmax attention (zero on padded slots).
    aux_losses: ``(T,)`` scaled auxiliary losses, or None when no targets.
    """

    predictions: Array
    attention: Array
    aux_losses: Array | None = None


def make_embed_fn(model, quantized: bool = False):
    """Feature-extractor dispatch shared by the eval/serving paths: the
    model's float backbone, or the int8 PTQ path (``ops/quantized.py``)
    when ``quantized``.  Weight quantization happens inside the jitted
    consumer — a few million cheap fused elementwise ops, negligible next
    to the embed itself."""
    if quantized:
        from montecarlo_gated_mil_tpu.ops.quantized import (
            quantize_backbone_static,
            quantized_embed_static,
        )

        def embed(params, patches, mask):
            qp = quantize_backbone_static(params["features"], model.backbone)
            return quantized_embed_static(
                qp, patches, mask, backbone=model.backbone
            ).astype(jnp.float32)

        return embed

    def embed(params, patches, mask):
        return model.apply({"params": params}, patches, mask, method="embed")

    return embed


def mc_head(
    model,
    variables,
    H: Array,
    mask: Array | None,
    num_samples: int,
    key: Array,
    targets: Array | None = None,
) -> MCOutputs:
    """T stochastic head passes over precomputed features ``H (N, L)``.

    Each sample gets an independent PRNG key; dropout masks across the
    feature- and attention-dropout layers are independent per sample (the
    reference's per-pass ``nn.Dropout`` calls, ``model.py:281,291``).
    """
    keys = jax.random.split(key, num_samples)

    def one_pass(k):
        return model.apply(
            variables, H, mask, mc_dropout=True, method="head", rngs={"dropout": k}
        )

    Y, A = jax.vmap(one_pass)(keys)  # (T, C), (T, C, N)
    aux = None
    if targets is not None:
        _check_aux_classes(A)
        aux = model.aux_scale * auxiliary_loss(
            A[:, 1, :],
            A[:, 0, :],
            targets == 1,
            loss_type=model.aux_loss_type,
            margin=model.aux_margin,
        )
    return MCOutputs(predictions=Y, attention=A, aux_losses=aux)


def _check_aux_classes(A: Array) -> None:
    """The auxiliary separation loss contrasts the positive head (class 1)
    against the negative head (class 0); on a model with any other head
    count, indexing ``A[:, 1, :]`` would silently compute garbage (or grab
    the wrong head), so reject targets outright."""
    if A.shape[-2] != 2:
        raise ValueError(
            "aux loss (targets=...) requires exactly 2 class heads "
            f"(pos/neg attention contrast); model produced {A.shape[-2]}"
        )


def mc_inference(
    model,
    variables,
    patches: Array,
    mask: Array | None,
    num_samples: int,
    key: Array,
    targets: Array | None = None,
) -> MCOutputs:
    """Features once, then T vmapped head passes (spec: ``model.py:256-328``).

    ``patches``: one bag ``(N, h, w, 3)``.  Batch over bags with ``jax.vmap``
    of this function (per-bag BN statistics are preserved by construction).
    """
    H = model.apply(variables, patches, mask, method="embed")
    return mc_head(model, variables, H, mask, num_samples, key, targets)


def mc_inference_serial(
    model,
    variables,
    patches: Array,
    mask: Array | None,
    num_samples: int,
    key: Array,
    targets: Array | None = None,
) -> MCOutputs:
    """Sequential-memory variant: identical math to :func:`mc_inference` but
    the T passes run as a ``lax.scan`` so only one sample's intermediates are
    live at a time (reference counterpart: ``mc_inference_serial``,
    ``/root/reference/model.py:330-401``, a Python loop with manual
    ``empty_cache``; here the scan stays on device and compiles once).
    Useful for very large T or very large buckets where the vmapped variant's
    (T, N, D) intermediates would pressure HBM."""
    H = model.apply(variables, patches, mask, method="embed")

    def one_pass(_, k):
        y, a = model.apply(
            variables, H, mask, mc_dropout=True, method="head", rngs={"dropout": k}
        )
        return None, (y, a)

    _, (Y, A) = jax.lax.scan(one_pass, None, jax.random.split(key, num_samples))
    aux = None
    if targets is not None:
        _check_aux_classes(A)
        aux = model.aux_scale * auxiliary_loss(
            A[:, 1, :],
            A[:, 0, :],
            targets == 1,
            loss_type=model.aux_loss_type,
            margin=model.aux_margin,
        )
    return MCOutputs(predictions=Y, attention=A, aux_losses=aux)


def mc_inference_single_head(
    model,
    variables,
    patches: Array,
    mask: Array | None,
    num_samples: int,
    key: Array,
) -> MCOutputs:
    """Single-head GA-MIL MC inference with the reference's own contract
    (``/root/reference/model.py:87-130``): features once, then T stochastic
    passes of the attention+classifier stage with **sigmoid applied inside**
    — ``predictions`` are probabilities in [0, 1], unlike the multi-head
    paths which return raw logits.  The reference's serial loop with manual
    ``empty_cache`` becomes a ``lax.scan`` (one sample's intermediates live
    at a time, on device, compiled once); there is no auxiliary loss on the
    single-head model, so ``aux_losses`` is always None.

    Returns ``predictions (T, num_classes)`` sigmoid probabilities and
    ``attention (T, K, N)``.
    """
    H = model.apply(variables, patches, mask, method="embed")

    def one_pass(_, k):
        y, a = model.apply(
            variables, H, mask, mc_dropout=True, method="head", rngs={"dropout": k}
        )
        return None, (jax.nn.sigmoid(y), a)

    _, (Y, A) = jax.lax.scan(one_pass, None, jax.random.split(key, num_samples))
    return MCOutputs(predictions=Y, attention=A, aux_losses=None)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PredictiveStats:
    """Per-bag predictive-uncertainty summary over T MC samples.

    Formula parity with ``/root/reference/infer.py:47-74`` (probabilities via
    class softmax; std is population/ddof=0 as numpy; entropy uses the
    reference's 1e-10 floor) and ``net_utils.py:207-210`` (prediction =
    argmax of the MC-mean probabilities).
    """

    mean_probs: Array  # (C,) mean softmax probability per class
    prediction: Array  # () argmax of mean_probs
    mean: Array  # () mean P(positive)
    std: Array  # () std (ddof=0) of P(positive)
    median: Array  # () median P(positive)
    iqr: Array  # () 75th - 25th percentile of P(positive)
    low: Array  # () min P(positive)
    high: Array  # () max P(positive)
    mean_entropy: Array  # () mean over T of -sum_c p_c log p_c


def predictive_stats(predictions: Array, positive_class: int = 1) -> PredictiveStats:
    """On-device reduction of ``(T, C)`` MC logits to uncertainty stats."""
    probs = jax.nn.softmax(predictions, axis=-1)  # (T, C)
    p = probs[..., positive_class]  # (T,)
    q25, q75 = jnp.percentile(p, jnp.array([25.0, 75.0]))
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-10), axis=-1)
    mean_probs = jnp.mean(probs, axis=0)
    return PredictiveStats(
        mean_probs=mean_probs,
        prediction=jnp.argmax(mean_probs, axis=-1),
        mean=jnp.mean(p),
        std=jnp.std(p),
        median=jnp.median(p),
        iqr=q75 - q25,
        low=jnp.min(p),
        high=jnp.max(p),
        mean_entropy=jnp.mean(entropy),
    )


def interpret_entropy(mean_entropy: float) -> str:
    """Verbal uncertainty bucket (``/root/reference/infer.py:58-66``)."""
    h = float(mean_entropy)
    if h < 0.2:
        return "very low"
    if h < 0.4:
        return "low"
    if h < 0.6:
        return "moderate"
    return "high"


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AttentionStats:
    """Mean and spread of attention weights over T MC samples.

    ``std`` uses ddof=1 for parity with torch ``Tensor.std`` used on the
    reconstructed maps (``/root/reference/infer.py:217,219``).
    """

    mean: Array  # (C, N)
    std: Array  # (C, N)
    var: Array  # (C, N)


def attention_stats(attention: Array, mask: Array | None = None) -> AttentionStats:
    """Reduce ``(T, C, N)`` attention over the sample axis.

    Padded slots carry exactly-zero attention in every sample, so their mean
    and variance are exactly zero without extra masking; ``mask`` re-zeroes
    them anyway to keep the invariant explicit under low precision.
    """
    t = attention.shape[0]
    mean = jnp.mean(attention, axis=0)
    var = jnp.var(attention, axis=0, ddof=1) if t > 1 else jnp.zeros_like(mean)
    if mask is not None:
        mean = jnp.where(mask, mean, 0.0)
        var = jnp.where(mask, var, 0.0)
    return AttentionStats(mean=mean, std=jnp.sqrt(var), var=var)
