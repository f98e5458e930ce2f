"""MCDO sampling behavior: determinism, independence, statistics formulas."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.mcdo import (
    attention_stats,
    interpret_entropy,
    mc_head,
    mc_inference,
    predictive_stats,
)
from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL


def _tiny_setup(n=8, hw=32, n_valid=6, seed=0):
    key = jax.random.key(seed)
    model = MultiHeadGatedAttentionMIL()
    patches = jax.random.normal(key, (n, hw, hw, 3))
    mask = jnp.arange(n) < n_valid
    variables = model.init({"params": key, "dropout": key}, patches, mask)
    return model, variables, patches, mask


def test_mc_inference_deterministic_per_key():
    model, variables, patches, mask = _tiny_setup()
    a = mc_inference(model, variables, patches, mask, 4, jax.random.key(7))
    b = mc_inference(model, variables, patches, mask, 4, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a.predictions), np.asarray(b.predictions))
    c = mc_inference(model, variables, patches, mask, 4, jax.random.key(8))
    assert not np.allclose(np.asarray(a.predictions), np.asarray(c.predictions))


def test_mc_samples_are_distinct():
    model, variables, patches, mask = _tiny_setup()
    out = mc_inference(model, variables, patches, mask, 6, jax.random.key(1))
    preds = np.asarray(out.predictions)
    # dropout active => each MC sample differs
    assert len({tuple(row) for row in preds.round(6)}) == 6
    # every sample's attention rows sum to 1 over valid slots, 0 on padding
    att = np.asarray(out.attention)
    np.testing.assert_allclose(att.sum(-1), 1.0, atol=1e-5)
    assert np.all(att[:, :, 6:] == 0)


def test_mc_zero_dropout_collapses():
    """With both dropout rates at 0 every MC sample equals the deterministic
    forward."""
    key = jax.random.key(0)
    model = MultiHeadGatedAttentionMIL(feature_dropout=0.0, attention_dropout=0.0)
    patches = jax.random.normal(key, (8, 32, 32, 3))
    mask = jnp.ones(8, bool)
    variables = model.init({"params": key, "dropout": key}, patches, mask)
    out = mc_inference(model, variables, patches, mask, 3, jax.random.key(2))
    y_det, _, _ = model.apply(variables, patches, mask)
    for t in range(3):
        np.testing.assert_allclose(
            np.asarray(out.predictions[t]), np.asarray(y_det), atol=1e-6
        )


def test_mc_head_matches_mc_inference():
    model, variables, patches, mask = _tiny_setup()
    H = model.apply(variables, patches, mask, method="embed")
    a = mc_head(model, variables, H, mask, 4, jax.random.key(3))
    b = mc_inference(model, variables, patches, mask, 4, jax.random.key(3))
    np.testing.assert_allclose(
        np.asarray(a.predictions), np.asarray(b.predictions), atol=1e-6
    )


def test_mc_head_rejects_targets_on_non_binary_model():
    """The aux branch indexes A[:, 1, :] (pos head); anything but a 2-class
    model must be rejected instead of silently contrasting wrong heads."""
    from montecarlo_gated_mil_tpu.mcdo import mc_inference_serial

    key = jax.random.key(0)
    model = MultiHeadGatedAttentionMIL(num_classes=3)
    patches = jax.random.normal(key, (8, 32, 32, 3))
    mask = jnp.ones(8, bool)
    variables = model.init({"params": key, "dropout": key}, patches, mask)
    H = model.apply(variables, patches, mask, method="embed")
    with pytest.raises(ValueError, match="2 class heads"):
        mc_head(model, variables, H, mask, 2, key, targets=jnp.asarray(1))
    with pytest.raises(ValueError, match="2 class heads"):
        mc_inference_serial(
            model, variables, patches, mask, 2, key, targets=jnp.asarray(1)
        )


def test_mc_inference_single_head_stochastic():
    """With dropout active the single-head MC samples are distinct sigmoid
    probabilities, deterministic per key."""
    from montecarlo_gated_mil_tpu.mcdo import mc_inference_single_head
    from montecarlo_gated_mil_tpu.models import GatedAttentionMIL

    key = jax.random.key(0)
    model = GatedAttentionMIL()
    patches = jax.random.normal(key, (8, 32, 32, 3))
    mask = jnp.arange(8) < 6
    variables = model.init({"params": key, "dropout": key}, patches, mask)
    a = mc_inference_single_head(model, variables, patches, mask, 5, jax.random.key(3))
    b = mc_inference_single_head(model, variables, patches, mask, 5, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(a.predictions), np.asarray(b.predictions))
    preds = np.asarray(a.predictions)
    assert preds.shape == (5, 1)
    assert np.all((preds >= 0.0) & (preds <= 1.0))  # sigmoid inside
    assert len({float(p) for p in preds[:, 0]}) == 5  # samples distinct
    att = np.asarray(a.attention)
    np.testing.assert_allclose(att.sum(-1), 1.0, atol=1e-5)
    assert np.all(att[:, :, 6:] == 0)


def test_predictive_stats_formulas():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(30, 2)).astype(np.float32)
    s = predictive_stats(jnp.asarray(logits))
    # reference formulas (infer.py:47-57) in numpy
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    p = probs[:, 1]
    np.testing.assert_allclose(float(s.mean), p.mean(), atol=1e-6)
    np.testing.assert_allclose(float(s.std), p.std(), atol=1e-6)  # ddof=0
    np.testing.assert_allclose(float(s.median), np.median(p), atol=1e-6)
    np.testing.assert_allclose(
        float(s.iqr), np.percentile(p, 75) - np.percentile(p, 25), atol=1e-6
    )
    np.testing.assert_allclose(float(s.low), p.min(), atol=1e-6)
    np.testing.assert_allclose(float(s.high), p.max(), atol=1e-6)
    ent = -(probs * np.log(probs + 1e-10)).sum(-1)
    np.testing.assert_allclose(float(s.mean_entropy), ent.mean(), atol=1e-6)
    assert int(s.prediction) == int(probs.mean(0).argmax())


def test_attention_stats_ddof1():
    rng = np.random.default_rng(1)
    att = rng.random((5, 2, 8)).astype(np.float32)
    s = attention_stats(jnp.asarray(att))
    np.testing.assert_allclose(np.asarray(s.mean), att.mean(0), atol=1e-6)
    # torch Tensor.std default is unbiased (infer.py:217)
    np.testing.assert_allclose(np.asarray(s.std), att.std(0, ddof=1), atol=1e-6)


def test_interpret_entropy_buckets():
    assert interpret_entropy(0.1) == "very low"
    assert interpret_entropy(0.3) == "low"
    assert interpret_entropy(0.5) == "moderate"
    assert interpret_entropy(0.9) == "high"


@pytest.mark.slow
def test_mc_inference_batched_over_bags():
    """vmap over bags keeps per-bag independence."""
    model, variables, patches, mask = _tiny_setup()
    bags = jnp.stack([patches, patches * 0.5])
    masks = jnp.stack([mask, mask])
    keys = jax.random.split(jax.random.key(4), 2)

    def per_bag(p, m, k):
        out = mc_inference(model, variables, p, m, 3, k)
        return out.predictions, out.attention

    preds, atts = jax.vmap(per_bag)(bags, masks, keys)
    assert preds.shape == (2, 3, 2) and atts.shape == (2, 3, 2, 8)
    assert not np.allclose(np.asarray(preds[0]), np.asarray(preds[1]))


# ------------------------------------------------------------- fold ensemble


def test_ensemble_mc_inference_pools_members():
    """Pooled ensemble output == the concatenation of each member's own
    mc_inference under fold_in(key, member); stats drop in unchanged."""
    from montecarlo_gated_mil_tpu.mcdo import (
        ensemble_mc_inference,
        stack_params,
    )

    model, v0, patches, mask = _tiny_setup(seed=0)
    _, v1, _, _ = _tiny_setup(seed=1)
    stacked = stack_params([v0["params"], v1["params"]])
    key = jax.random.key(9)
    out = ensemble_mc_inference(model, stacked, patches, mask, 3, key)
    assert out.predictions.shape == (6, 2)
    assert out.attention.shape == (6, 2, 8)
    assert out.aux_losses is None
    for m, v in enumerate((v0, v1)):
        solo = mc_inference(
            model, v, patches, mask, 3, jax.random.fold_in(key, m)
        )
        np.testing.assert_allclose(
            np.asarray(out.predictions[m * 3 : (m + 1) * 3]),
            np.asarray(solo.predictions),
            atol=1e-5,
        )
    # different members -> genuinely different samples in the pool
    assert not np.allclose(
        np.asarray(out.predictions[:3]), np.asarray(out.predictions[3:])
    )
    stats = predictive_stats(out.predictions)
    assert 0.0 <= float(stats.mean) <= 1.0
    att = attention_stats(out.attention, mask)
    assert att.mean.shape == (2, 8)

    with pytest.raises(ValueError, match="at least one"):
        stack_params([])


def test_load_fold_ensemble_from_manifest(tmp_path):
    """Fold checkpoints restore against an init template and stack in fold
    order regardless of manifest order."""
    from montecarlo_gated_mil_tpu.core.config import config_from_dict
    from montecarlo_gated_mil_tpu.mcdo import load_fold_ensemble
    from montecarlo_gated_mil_tpu.train.state import Checkpointer

    model, v0, _, _ = _tiny_setup(seed=3)
    _, v1, _, _ = _tiny_setup(seed=4)
    ckpt = Checkpointer(str(tmp_path))
    p1 = ckpt.save_params("fold_1_x", v0["params"])
    p2 = ckpt.save_params("fold_2_x", v1["params"])
    # shared_att must match the fixture model (config default is the
    # reference's separate-gates mode; _tiny_setup uses the shared gate)
    cfg = config_from_dict(
        {"seed": 0, "model_path": str(tmp_path), "model": "r18",
         "shared_att": True, "data": {"H": 64, "W": 64, "patch_size": 32}}
    )
    manifest = {"folds": [
        {"fold": 2, "checkpoint": p2, "accuracy": 0.5},
        {"fold": 1, "checkpoint": p1, "accuracy": 0.5},
    ]}
    stacked = load_fold_ensemble(cfg, manifest)
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[0] == 2
    w0 = jax.tree_util.tree_leaves(v0["params"])[0]
    np.testing.assert_allclose(
        np.asarray(leaf[0]), np.asarray(w0), atol=1e-6
    )
