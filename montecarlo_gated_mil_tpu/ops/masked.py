"""Masked reductions: the primitives that make padded buckets exact.

The reference computes plain softmax/mean over a ragged instance axis
(``/root/reference/model.py:233-235``).  With padded fixed-size buckets every
reduction must ignore padding; these helpers guarantee padded slots get
exactly-zero attention and contribute nothing to means/variances, so results
match the reference's ragged math on the valid prefix.
"""

from __future__ import annotations

import jax.numpy as jnp

# Large-negative fill for masked logits.  Chosen so that exp(x - max) == 0.0
# in float32 for any realistic valid logit while staying finite (a true -inf
# produces NaNs when an all-masked row is normalized).
_MASK_FILL = -1e30


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically-stable softmax that assigns exactly 0 to masked slots.

    mask broadcasts against logits; True = valid.  All-masked rows return all
    zeros rather than NaN.
    """
    mask = jnp.broadcast_to(mask, logits.shape)
    filled = jnp.where(mask, logits, _MASK_FILL)
    m = jnp.max(filled, axis=axis, keepdims=True)
    # Guard all-masked rows: max would be _MASK_FILL, making exp overflow-safe
    # anyway, but keep the subtraction finite.
    m = jnp.where(m <= _MASK_FILL, 0.0, m)
    e = jnp.where(mask, jnp.exp(filled - m), 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return jnp.where(denom > 0, e / jnp.where(denom > 0, denom, 1.0), 0.0)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, keepdims: bool = False):
    """Mean over valid slots only."""
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1.0)


def masked_var(x: jnp.ndarray, mask: jnp.ndarray, axis=None, keepdims: bool = False):
    """Biased (1/n) variance over valid slots, matching torch BN semantics."""
    mask_f = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    mean = masked_mean(x, mask, axis=axis, keepdims=True)
    sq = (x - mean) ** 2 * mask_f
    count = jnp.sum(mask_f, axis=axis, keepdims=keepdims)
    return jnp.sum(sq, axis=axis, keepdims=keepdims) / jnp.maximum(count, 1.0)
