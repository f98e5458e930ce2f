"""Fused Pallas MC gated-attention kernel vs its jnp reference twin.

On CPU the kernel runs in interpreter mode and only the deterministic
(zero-dropout) path is exercised (the TPU hardware PRNG has no CPU lowering);
the stochastic statistics are asserted in the TPU-only test below and by
bench.py on real hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.ops.gated_attention import (
    GatedAttentionParams,
    mc_gated_attention_fused,
    mc_head_reference,
)
from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL
from montecarlo_gated_mil_tpu.mcdo import mc_head

ON_TPU = jax.default_backend() == "tpu"


def _params(key, L=128, D=32, C=2):
    ks = jax.random.split(key, 7)
    return GatedAttentionParams(
        w_V=jax.random.normal(ks[0], (L, D)) * 0.05,
        b_V=jax.random.normal(ks[1], (D,)) * 0.05,
        w_U=jax.random.normal(ks[2], (L, D)) * 0.05,
        b_U=jax.random.normal(ks[3], (D,)) * 0.05,
        w_att=jax.random.normal(ks[4], (D, C)) * 0.05,
        b_att=jax.random.normal(ks[5], (C,)) * 0.05,
        w_cls=jax.random.normal(ks[6], (C, L)) * 0.05,
    )


def test_kernel_matches_reference_no_dropout():
    key = jax.random.key(0)
    N, L = 64, 128
    params = _params(key, L=L)
    H = jax.random.normal(jax.random.key(1), (N, L))
    mask = jnp.arange(N) < 50
    y_ref, a_ref = mc_head_reference(H, mask, params, 3, key, 0.0, 0.0)
    y_k, a_k = mc_gated_attention_fused(
        H, mask, params, 3, jnp.asarray(1, jnp.int32), 0.0, 0.0, interpret=not ON_TPU
    )
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_ref), atol=1e-6)
    assert np.all(np.asarray(a_k)[:, :, 50:] == 0)


@pytest.mark.slow
def test_kernel_matches_model_head_no_dropout():
    """Kernel path == flax model head at dropout 0 (same weights via
    GatedAttentionParams.from_model_params)."""
    key = jax.random.key(2)
    model = MultiHeadGatedAttentionMIL(feature_dropout=0.0, attention_dropout=0.0)
    N, L = 16, 512
    H = jax.random.normal(key, (N, L))
    mask = jnp.arange(N) < 12
    # init head-only params via a tiny dummy bag
    patches = jax.random.normal(key, (N, 16, 16, 3))
    variables = model.init({"params": key, "dropout": key}, patches, mask)
    out = mc_head(model, variables, H, mask, 2, jax.random.key(3))
    params = GatedAttentionParams.from_model_params(variables["params"])
    y_k, a_k = mc_gated_attention_fused(
        H, mask, params, 2, jnp.asarray(0, jnp.int32), 0.0, 0.0, interpret=not ON_TPU
    )
    np.testing.assert_allclose(
        np.asarray(y_k), np.asarray(out.predictions), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(out.attention), atol=1e-6)


def test_kernel_rejects_unaligned_bucket():
    key = jax.random.key(0)
    params = _params(key)
    H = jax.random.normal(key, (60, 128))  # not a multiple of 8
    with pytest.raises(ValueError, match="multiple of 8"):
        mc_gated_attention_fused(
            H, jnp.ones(60, bool), params, 2, jnp.asarray(0, jnp.int32), 0.0, 0.0,
            interpret=not ON_TPU,
        )


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires a TPU")
def test_kernel_dropout_statistics_tpu():
    key = jax.random.key(0)
    N, L, T = 64, 128, 2048
    params = _params(key, L=L)
    H = jax.random.normal(jax.random.key(1), (N, L))
    mask = jnp.arange(N) < 50
    y_ref, a_ref = mc_head_reference(H, mask, params, T, key, 0.1, 0.1)
    y_k, a_k = mc_gated_attention_fused(
        H, mask, params, T, jnp.asarray(7, jnp.int32), 0.1, 0.1
    )
    tol = 4.0 * float(jnp.max(y_ref.std(0))) / np.sqrt(T)
    np.testing.assert_allclose(
        np.asarray(y_k.mean(0)), np.asarray(y_ref.mean(0)), atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(y_k.std(0)), np.asarray(y_ref.std(0)), rtol=0.15
    )
    # per-seed determinism
    y2, _ = mc_gated_attention_fused(
        H, mask, params, 8, jnp.asarray(7, jnp.int32), 0.1, 0.1
    )
    y3, _ = mc_gated_attention_fused(
        H, mask, params, 8, jnp.asarray(7, jnp.int32), 0.1, 0.1
    )
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y3))
