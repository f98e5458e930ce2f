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


def _params(key, L=128, D=32, C=2, separate=False):
    ks = jax.random.split(key, 7)
    if separate:
        # per-class gates: the reference's shipped config (config.yml:8)
        return GatedAttentionParams(
            w_V=jax.random.normal(ks[0], (C, L, D)) * 0.05,
            b_V=jax.random.normal(ks[1], (C, D)) * 0.05,
            w_U=jax.random.normal(ks[2], (C, L, D)) * 0.05,
            b_U=jax.random.normal(ks[3], (C, D)) * 0.05,
            w_att=jax.random.normal(ks[4], (C, D)) * 0.05,
            b_att=jax.random.normal(ks[5], (C,)) * 0.05,
            w_cls=jax.random.normal(ks[6], (C, L)) * 0.05,
        )
    return GatedAttentionParams(
        w_V=jax.random.normal(ks[0], (L, D)) * 0.05,
        b_V=jax.random.normal(ks[1], (D,)) * 0.05,
        w_U=jax.random.normal(ks[2], (L, D)) * 0.05,
        b_U=jax.random.normal(ks[3], (D,)) * 0.05,
        w_att=jax.random.normal(ks[4], (D, C)) * 0.05,
        b_att=jax.random.normal(ks[5], (C,)) * 0.05,
        w_cls=jax.random.normal(ks[6], (C, L)) * 0.05,
    )


@pytest.mark.parametrize("separate", [False, True])
def test_kernel_matches_reference_no_dropout(separate):
    key = jax.random.key(0)
    N, L = 64, 128
    params = _params(key, L=L, separate=separate)
    H = jax.random.normal(jax.random.key(1), (N, L))
    mask = jnp.arange(N) < 50
    y_ref, a_ref = mc_head_reference(H, mask, params, 3, key, 0.0, 0.0)
    y_k, a_k = mc_gated_attention_fused(
        H, mask, params, 3, jnp.asarray(1, jnp.int32), 0.0, 0.0, interpret=not ON_TPU
    )
    # Interpret mode (CPU) is exact f32 — strict.  On hardware, kernel and
    # twin take different MXU f32 matmul decompositions; measured gap is
    # ~2e-5 on logits / ~7e-6 on attention (still inside the 1e-5
    # attention-parity north star, BASELINE.json:5).
    y_tol, a_tol = (1e-4, 1e-5) if ON_TPU else (1e-5, 1e-6)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref), atol=y_tol)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_ref), atol=a_tol)
    assert np.all(np.asarray(a_k)[:, :, 50:] == 0)


@pytest.mark.slow
@pytest.mark.parametrize("shared", [True, False])
def test_kernel_matches_model_head_no_dropout(shared):
    """Kernel path == flax model head at dropout 0 (same weights via
    GatedAttentionParams.from_model_params), both gate modes."""
    key = jax.random.key(2)
    model = MultiHeadGatedAttentionMIL(
        feature_dropout=0.0, attention_dropout=0.0, shared_attention=shared
    )
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
    # On hardware the flax head's einsums run at TPU default (bf16-input)
    # matmul precision while the kernel is exact f32; at L=512 that puts
    # ~7e-5 absolute (~8e-4 relative) noise on the flax side.  CPU is exact.
    y_tol, a_tol = (1e-4, 1e-4) if ON_TPU else (1e-5, 1e-6)
    np.testing.assert_allclose(
        np.asarray(y_k), np.asarray(out.predictions), atol=y_tol
    )
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(out.attention), atol=a_tol)


def test_kernel_rejects_unaligned_bucket():
    key = jax.random.key(0)
    params = _params(key)
    H = jax.random.normal(key, (60, 128))  # not a multiple of 8
    with pytest.raises(ValueError, match="multiple of 8"):
        mc_gated_attention_fused(
            H, jnp.ones(60, bool), params, 2, jnp.asarray(0, jnp.int32), 0.0, 0.0,
            interpret=not ON_TPU,
        )


def test_kernel_rejects_bucket_over_vmem_ceiling():
    """Past FUSED_HEAD_MAX_N the kernel's VMEM-resident bag exceeds the
    scoped-vmem stack and XLA would refuse the compile with a 50-line dump
    (measured at N=6144: 18.33M vs the 16M limit); the wrapper raises the
    short, actionable version instead."""
    from montecarlo_gated_mil_tpu.ops.gated_attention import FUSED_HEAD_MAX_N

    key = jax.random.key(0)
    params = _params(key)
    n = FUSED_HEAD_MAX_N + 8
    H = jax.random.normal(key, (n, 128))
    with pytest.raises(ValueError, match="VMEM ceiling"):
        mc_gated_attention_fused(
            H, jnp.ones(n, bool), params, 2, jnp.asarray(0, jnp.int32), 0.0, 0.0,
            interpret=not ON_TPU,
        )


@pytest.mark.slow
def test_mc_val_step_falls_back_above_vmem_ceiling():
    """The fused mc-validate step builder must route buckets above the
    kernel's VMEM ceiling through the jnp head (numerically identical to the
    use_pallas=False builder: mc_inference = embed + mc_head, same key)."""
    from montecarlo_gated_mil_tpu.ops.gated_attention import FUSED_HEAD_MAX_N
    from montecarlo_gated_mil_tpu.train.criteria import cross_entropy
    from montecarlo_gated_mil_tpu.train.loops import _mc_val_step

    model = MultiHeadGatedAttentionMIL(
        backbone="r18", feature_dropout=0.25, attention_dropout=0.25
    )
    key = jax.random.key(0)
    n = FUSED_HEAD_MAX_N + 8
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((8, 16, 16, 3), jnp.float32),
        jnp.ones((8,), bool),
    )
    patches = jax.random.uniform(jax.random.key(1), (n, 16, 16, 3))
    mask = jnp.arange(n) < n - 3
    label = jnp.asarray(1, jnp.int32)
    f_pallas = _mc_val_step(model, cross_entropy, 2, use_pallas=True)
    f_jnp = _mc_val_step(model, cross_entropy, 2, use_pallas=False)
    out_p = f_pallas(variables["params"], patches, mask, label, key)
    out_j = f_jnp(variables["params"], patches, mask, label, key)
    for a, b in zip(out_p, out_j):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.parametrize("separate", [False, True])
def test_kernel_gradient_parity_no_dropout(separate):
    """Custom VJP == autodiff of the jnp twin at dropout 0, for gradients
    w.r.t. features AND every head parameter (the path mc_validate/training
    takes with use_pallas), both gate modes."""
    key = jax.random.key(0)
    N, L, T = 64, 128, 3
    params = _params(key, L=L, separate=separate)
    H = jax.random.normal(jax.random.key(1), (N, L))
    mask = jnp.arange(N) < 50
    dy = jax.random.normal(jax.random.key(2), (T, 2))
    da = jax.random.normal(jax.random.key(3), (T, 2, N))

    def loss_kernel(H, params):
        y, a = mc_gated_attention_fused(
            H, mask, params, T, jnp.asarray(1, jnp.int32), 0.0, 0.0,
            interpret=not ON_TPU,
        )
        return jnp.sum(y * dy) + jnp.sum(a * da)

    def loss_ref(H, params):
        y, a = mc_head_reference(H, mask, params, T, key, 0.0, 0.0)
        return jnp.sum(y * dy) + jnp.sum(a * da)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(H, params)
    gr = jax.grad(loss_ref, argnums=(0, 1))(H, params)

    def tol(ref):
        # On TPU both paths run MXU matmuls with bf16 inputs; measured
        # default-vs-highest precision noise of the *reference alone* is the
        # same order as the kernel/reference gap, so scale tolerance by the
        # gradient magnitude there.  CPU is exact f32.
        if not ON_TPU:
            return 2e-5
        return max(1e-5, 1e-2 * float(np.abs(ref).max()))

    r = np.asarray(gr[0])
    np.testing.assert_allclose(np.asarray(gk[0]), r, atol=tol(r))
    for field in ("w_V", "b_V", "w_U", "b_U", "w_att", "b_att", "w_cls"):
        r = np.asarray(getattr(gr[1], field))
        np.testing.assert_allclose(
            np.asarray(getattr(gk[1], field)), r, atol=tol(r), err_msg=field
        )


@pytest.mark.slow
@pytest.mark.parametrize("shared", [True, False])
def test_mc_validate_use_pallas_matches_jnp_at_zero_dropout(shared):
    """mc_validate can take the fused-kernel path; at dropout 0 its losses
    equal the jnp path exactly (same math, no PRNG involved)."""
    from montecarlo_gated_mil_tpu.core.bag import pad_to_bucket
    from montecarlo_gated_mil_tpu.train import cross_entropy
    from montecarlo_gated_mil_tpu.train.loops import mc_validate
    from montecarlo_gated_mil_tpu.utils.metrics import MemorySink, Metrics

    model = MultiHeadGatedAttentionMIL(
        feature_dropout=0.0, attention_dropout=0.0, shared_attention=shared
    )
    rng = np.random.default_rng(0)
    items = [
        (
            pad_to_bucket(
                rng.normal(size=(5, 64, 64, 3)).astype(np.float32),
                np.arange(5, dtype=np.int32),
                int(i % 2),
                8,
            ),
            None,
        )
        for i in range(3)
    ]
    key = jax.random.key(0)
    variables = model.init(
        {"params": key, "dropout": key}, items[0][0].patches, items[0][0].mask
    )
    kw = dict(epoch=0, num_samples=2, key=jax.random.key(5),
              metrics=Metrics([MemorySink()]))
    loss_jnp = mc_validate(
        model, variables["params"], items, cross_entropy, **kw
    )
    loss_pallas = mc_validate(
        model, variables["params"], items, cross_entropy, use_pallas=True, **kw
    )
    # On hardware the two paths take different MXU f32 matmul
    # decompositions (see test_kernel_matches_reference_no_dropout).
    assert loss_pallas == pytest.approx(loss_jnp, abs=1e-4 if ON_TPU else 1e-5)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires a TPU")
@pytest.mark.parametrize("separate", [False, True])
def test_kernel_gradient_with_dropout_tpu(separate):
    """With dropout active, the backward kernel replays the forward's
    hardware-PRNG masks by re-seeding: the VJP must match a finite-difference
    directional derivative (masks are fixed by the seed, so the fused op is
    smooth in H) and be deterministic across calls."""
    key = jax.random.key(0)
    N, L, T = 64, 128, 4
    params = _params(key, L=L, separate=separate)
    H = jax.random.normal(jax.random.key(1), (N, L))
    mask = jnp.arange(N) < 50
    v = jax.random.normal(jax.random.key(4), H.shape)

    def loss(H):
        y, a = mc_gated_attention_fused(
            H, mask, params, T, jnp.asarray(3, jnp.int32), 0.1, 0.1
        )
        return jnp.sum(y * y) + jnp.sum(a * a)

    g = jax.grad(loss)(H)
    # eps large enough that the FD difference clears the MXU's bf16-input
    # matmul noise on the loss (~1e-3 relative); smaller eps drowns in it.
    eps = 1e-1
    fd = (loss(H + eps * v) - loss(H - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=0.15)
    g2 = jax.grad(loss)(H)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g2))


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires a TPU")
@pytest.mark.parametrize("separate", [False, True])
def test_kernel_dropout_statistics_tpu(separate):
    key = jax.random.key(0)
    N, L, T = 64, 128, 2048
    params = _params(key, L=L, separate=separate)
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
