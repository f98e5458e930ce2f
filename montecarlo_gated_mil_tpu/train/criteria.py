"""Loss criteria: cross-entropy and BCE with reference semantics.

``/root/reference/main.py:65-70``: 'ce' -> ``CrossEntropyLoss`` on raw
(bs, C) logits vs integer targets; 'bce' -> ``BCELoss`` on sigmoid outputs
(used by the single-head path at ``net_utils.py:16-17``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy(logits: Array, target: Array) -> Array:
    """Softmax CE over the last axis; target is an integer class index.
    Matches torch ``CrossEntropyLoss`` (mean over any batch axes)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(picked)


def bce_on_probs(probs: Array, target: Array) -> Array:
    """torch ``BCELoss`` on already-sigmoided probabilities (clamped log)."""
    p = jnp.clip(probs, 1e-12, 1.0 - 1e-12)
    t = target.astype(p.dtype)
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def make_criterion(name: str):
    name = name.lower()
    if name == "ce":
        return cross_entropy
    if name == "bce":
        return lambda logits, target: bce_on_probs(jax.nn.sigmoid(logits), target)
    raise ValueError(f"criterion must be 'ce' or 'bce', got {name!r}")
