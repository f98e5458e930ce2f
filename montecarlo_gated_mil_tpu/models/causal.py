"""Causal counterfactual dropout (experimental model variant).

Capability spec (``/root/reference/model_dev.py:24-204``): at eval time,
compute the gradient of the summed class logits with respect to the
post-softmax attention weights, convert it to per-instance "importance"
``sigmoid(dY/dA)``, then draw T Bernoulli masks that *drop* instances with
probability equal to their importance, re-pool and re-classify each
counterfactual bag, and report realized drop rates per class head.

TPU-native design: the reference builds a taped graph and calls
``torch.autograd.grad`` inside a Python loop of T re-classifications.  Here
the gradient is one ``jax.grad`` of a closed-over linear function (exact, no
tape management) and the T counterfactuals are one ``vmap`` over PRNG keys.
Not wired into any entry point, mirroring the reference (SURVEY.md §2:
spec-optional experimental component).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CounterfactualOutputs:
    """counterfactual_predictions: (T, C); counterfactual_attention:
    (T, C, N); importance: (C, N); drop_rates: (C,) mean realized drop
    fraction per class head."""

    counterfactual_predictions: Array
    counterfactual_attention: Array
    importance: Array
    drop_rates: Array


def causal_counterfactual_dropout(
    model,
    variables,
    patches: Array,
    mask: Array | None,
    num_samples: int,
    key: Array,
) -> CounterfactualOutputs:
    """Run the experimental counterfactual-dropout eval forward.

    ``model`` is a ``MultiHeadGatedAttentionMIL``; the deterministic forward
    supplies H and A, then counterfactuals perturb only the pooling stage.
    """
    H = model.apply(variables, patches, mask, method="embed")
    _, A = model.apply(variables, H, mask, method="head")  # (C, N) post-softmax
    H32 = H.astype(jnp.float32)
    w_cls = variables["params"]["w_cls"]  # (C, L, 1)

    def total_logit(attention):
        m = jnp.einsum("cn,nl->cl", attention, H32)
        y = jnp.einsum("cl,clk->ck", m, w_cls)[:, 0]
        return jnp.sum(y), y

    grads, _ = jax.grad(total_logit, has_aux=True)(A)  # dY/dA, (C, N)
    importance = jax.nn.sigmoid(grads)
    valid = (
        mask.astype(jnp.float32)
        if mask is not None
        else jnp.ones(A.shape[-1], jnp.float32)
    )

    def one(k):
        keep = jax.random.bernoulli(k, 1.0 - importance)  # drop w.p. importance
        a_cf = A * keep
        _, y_cf = total_logit(a_cf)
        drop_rate = jnp.sum((1 - keep) * valid, axis=-1) / A.shape[-1]
        return y_cf, a_cf, drop_rate

    y_cf, a_cf, rates = jax.vmap(one)(jax.random.split(key, num_samples))
    return CounterfactualOutputs(
        counterfactual_predictions=y_cf,
        counterfactual_attention=a_cf,
        importance=importance,
        drop_rates=jnp.mean(rates, axis=0),
    )
