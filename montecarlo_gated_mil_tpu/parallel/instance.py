"""Instance (intra-bag) sharding: gated attention over chips via collectives.

The MIL analogue of sequence parallelism (SURVEY.md §5): when one bag's
instance count exceeds what a single chip should hold (giant mammograms at
high overlap -> thousands of patches), shard the instance axis across the
``inst`` mesh axis and compute the gated-attention pooling with a two-pass
numerically-stable masked softmax:

    pass 1: local max of masked logits        -> pmax over 'inst'
    pass 2: local sum of exp(logit - max)     -> psum over 'inst'
    pooled: partial A @ H per shard           -> psum over 'inst'

All collectives are XLA ``pmax``/``psum`` over ICI; each chip only ever
holds its slice of H.  The reference has no counterpart (single GPU, dynamic
N, SURVEY.md §2 'Parallelism strategies: none').
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from montecarlo_gated_mil_tpu.ops.gated_attention import GatedAttentionParams

Array = jax.Array

_MASK_FILL = -1e30


def sharded_embed(
    model,
    params,
    patches: Array,
    mask: Array,
    mesh: Mesh,
    axis: str = "inst",
) -> Array:
    """ResNet patch embedding with the instance axis sharded over ``axis``.

    The oversized-bag path (SURVEY.md §5 long-context): when one bag's
    instance count exceeds the largest bucket a single chip should embed
    (the embed is ~98% of the FLOPs and the thing that overflows HBM),
    shard the patches across chips.  Convolutions are per-instance, so each
    shard embeds its slice independently; the one cross-instance coupling —
    the reference's per-bag BatchNorm statistics
    (``/root/reference/main.py:16-20``; masked over padding here) — reduces
    across shards with a per-layer ``psum`` of (sum, sum-of-squares, valid
    count) via ``MaskedBatchStatsNorm(axis_name=...)``, so every shard
    normalizes with the whole bag's moments: features match the
    single-device embed to float tolerance.

    Args:
      patches: ``(N, h, w, 3)``, N divisible by the ``axis`` size.
      mask: ``(N,)`` validity.
    Returns ``H (N, L)``, sharded on N.
    """
    from montecarlo_gated_mil_tpu.models.resnet import make_backbone

    n = patches.shape[0]
    size = mesh.shape[axis]
    if n % size:
        raise ValueError(f"instance count {n} not divisible by {axis}={size}")
    backbone = make_backbone(
        model.backbone,
        dtype=model.dtype,
        space_to_depth=getattr(model, "space_to_depth", False),
        bn_axis_name=axis,
    )

    def block(p_blk: Array, m_blk: Array) -> Array:
        return backbone.apply({"params": params["features"]}, p_blk, m_blk)

    f = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(axis, None, None, None), P(axis)),
        out_specs=P(axis, None),
    )
    return f(patches, mask)


def sharded_embed_grad(
    model,
    feat_params,
    patches: Array,
    mask: Array,
    mesh: Mesh,
    axis: str = "inst",
) -> Array:
    """Differentiable twin of :func:`sharded_embed` for the TRAINING path.

    The parameters enter the ``shard_map`` as an explicit replicated
    argument (``P()``) instead of a closure capture, so reverse-mode AD has
    a transpose: each shard backpropagates its instance slice and the
    parameter cotangents ``psum`` across ``axis`` — the gradient equals the
    single-device embed's up to float reduction order (pinned by
    tests/test_train.py::test_sharded_train_step_matches_sequential).

    Args:
      feat_params: the backbone subtree (``params["features"]``).
      patches: ``(N, h, w, 3)``, N divisible by the ``axis`` size.
    Returns ``H (N, L)``, sharded on N.
    """
    from montecarlo_gated_mil_tpu.models.resnet import make_backbone

    n = patches.shape[0]
    size = mesh.shape[axis]
    if n % size:
        raise ValueError(f"instance count {n} not divisible by {axis}={size}")
    backbone = make_backbone(
        model.backbone,
        dtype=model.dtype,
        space_to_depth=getattr(model, "space_to_depth", False),
        bn_axis_name=axis,
    )

    def block(fp, p_blk: Array, m_blk: Array) -> Array:
        return backbone.apply({"params": fp}, p_blk, m_blk)

    f = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(), P(axis, None, None, None), P(axis)),
        out_specs=P(axis, None),
    )
    return f(feat_params, patches, mask)


def mc_inference_sharded(
    model,
    params,
    patches: Array,
    mask: Array,
    num_samples: int,
    key: Array,
    mesh: Mesh,
    axis: str = "inst",
) -> tuple[Array, Array]:
    """Full oversized-bag MC inference: instance-sharded embed + instance-
    sharded MC gated attention, one jittable composition.  Returns
    ``(Y (T, C), A (T, C, N))``; dropout keys fold per shard (statistically
    equivalent to the single-chip head, pinned by
    tests/test_parallel.py::test_sharded_mc_statistically_equivalent...)."""
    H = sharded_embed(model, params, patches, mask, mesh, axis)
    return sharded_mc_gated_attention(
        H,
        mask,
        GatedAttentionParams.from_model_params(params),
        num_samples,
        key,
        mesh,
        feature_dropout=model.feature_dropout,
        attention_dropout=model.attention_dropout,
        axis=axis,
    )


def sharded_gated_attention(
    H: Array,
    mask: Array,
    params: GatedAttentionParams,
    mesh: Mesh,
    axis: str = "inst",
) -> tuple[Array, Array]:
    """Deterministic multi-head gated-attention pooling with the instance
    axis sharded over ``axis``.

    Args:
      H: ``(N, L)`` features, N divisible by the ``axis`` size.
      mask: ``(N,)`` validity.
    Returns ``(Y (C,) replicated, A (C, N) sharded on N)`` — identical math
    to the single-chip head (``models/gamil.py``) up to float reordering.
    """
    n = H.shape[0]
    size = mesh.shape[axis]
    if n % size:
        raise ValueError(f"instance count {n} not divisible by {axis}={size}")

    def block(h_blk: Array, m_blk: Array):
        h32 = h_blk.astype(jnp.float32)
        V = jnp.tanh(h32 @ params.w_V + params.b_V)
        U = jax.nn.sigmoid(h32 @ params.w_U + params.b_U)
        logits = ((V * U) @ params.w_att + params.b_att).T  # (C, n_blk)
        filled = jnp.where(m_blk[None, :], logits, _MASK_FILL)
        local_max = jnp.max(filled, axis=-1)
        gmax = jax.lax.pmax(local_max, axis)  # (C,)
        gmax = jnp.where(gmax <= _MASK_FILL, 0.0, gmax)
        e = jnp.where(m_blk[None, :], jnp.exp(filled - gmax[:, None]), 0.0)
        denom = jax.lax.psum(jnp.sum(e, axis=-1), axis)  # (C,)
        A_blk = e / jnp.where(denom > 0, denom, 1.0)[:, None]
        M = jax.lax.psum(jnp.einsum("cn,nl->cl", A_blk, h32), axis)  # (C, L)
        Y = jnp.sum(M * params.w_cls, axis=-1)
        return Y, A_blk

    f = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(), P(None, axis)),
    )
    return f(H, mask)


def sharded_mc_gated_attention(
    H: Array,
    mask: Array,
    params: GatedAttentionParams,
    num_samples: int,
    key: Array,
    mesh: Mesh,
    *,
    feature_dropout: float = 0.1,
    attention_dropout: float = 0.1,
    axis: str = "inst",
) -> tuple[Array, Array]:
    """T MC-dropout samples of the instance-sharded head.

    Dropout masks are drawn per shard from a key folded with the shard index
    (independent across chips and samples, reproducible from one key).
    Returns ``(Y (T, C) replicated, A (T, C, N) sharded on N)``.
    """
    n = H.shape[0]
    size = mesh.shape[axis]
    if n % size:
        raise ValueError(f"instance count {n} not divisible by {axis}={size}")

    def block(h_blk: Array, m_blk: Array, base_key: Array):
        idx = jax.lax.axis_index(axis)
        shard_key = jax.random.fold_in(base_key[0], idx)

        def one(k):
            kf, ka = jax.random.split(k)
            h32 = h_blk.astype(jnp.float32)
            if feature_dropout > 0.0:
                keep = jax.random.bernoulli(kf, 1.0 - feature_dropout, h32.shape)
                h32 = jnp.where(keep, h32 / (1.0 - feature_dropout), 0.0)
            V = jnp.tanh(h32 @ params.w_V + params.b_V)
            U = jax.nn.sigmoid(h32 @ params.w_U + params.b_U)
            logits = ((V * U) @ params.w_att + params.b_att).T
            if attention_dropout > 0.0:
                keep = jax.random.bernoulli(
                    ka, 1.0 - attention_dropout, logits.shape
                )
                logits = jnp.where(keep, logits / (1.0 - attention_dropout), 0.0)
            filled = jnp.where(m_blk[None, :], logits, _MASK_FILL)
            gmax = jax.lax.pmax(jnp.max(filled, axis=-1), axis)
            gmax = jnp.where(gmax <= _MASK_FILL, 0.0, gmax)
            e = jnp.where(m_blk[None, :], jnp.exp(filled - gmax[:, None]), 0.0)
            denom = jax.lax.psum(jnp.sum(e, axis=-1), axis)
            A_blk = e / jnp.where(denom > 0, denom, 1.0)[:, None]
            M = jax.lax.psum(jnp.einsum("cn,nl->cl", A_blk, h32), axis)
            return jnp.sum(M * params.w_cls, axis=-1), A_blk

        return jax.vmap(one)(jax.random.split(shard_key, num_samples))

    f = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None)),
        out_specs=(P(), P(None, None, axis)),
    )
    return f(H, mask, key[None])
