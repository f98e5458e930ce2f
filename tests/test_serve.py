"""Serving predictor: end-to-end raw image -> prediction with maps."""

import numpy as np
import pytest
import jax

from montecarlo_gated_mil_tpu.data.pipeline import PipelineConfig
from montecarlo_gated_mil_tpu.data.synthetic import synthetic_image
from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL
from montecarlo_gated_mil_tpu.serve import MCDOPredictor


def _predictor(num_samples=4, quantized=False):
    model = MultiHeadGatedAttentionMIL()
    key = jax.random.key(0)
    import jax.numpy as jnp

    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((4, 64, 64, 3)),
        jnp.ones(4, bool),
    )
    pipeline = PipelineConfig(
        height=128, width=128, patch_size=64, overlap=0.0,
        empty_threshold=0.05, bucket=8,
    )
    return MCDOPredictor(
        model, variables["params"], pipeline, num_samples=num_samples,
        use_pallas=False, quantized=quantized,
    )


def test_estimate_valid_tiles_tracks_exact_count():
    """The host-side subsampled fill estimate (the serving bucket picker —
    replaces the round-2 device count + blocking readback) overshoots the
    exact device count via its margin, and returns None on off-size images
    (the resize path, where its geometry no longer maps)."""
    import jax.numpy as jnp

    from montecarlo_gated_mil_tpu.data.pipeline import (
        count_valid_tiles,
        estimate_valid_tiles,
    )

    cfg = PipelineConfig(
        height=256, width=256, patch_size=64, overlap=0.5,
        empty_threshold=0.5, bucket=64,
    )
    starts_np = cfg.grid().tiles_array()[:, :2]
    starts = jnp.asarray(starts_np)
    for seed in range(4):
        for flip in (False, True):
            img = np.asarray(
                synthetic_image(256, 256, positive=bool(seed % 2), seed=seed)
            )
            exact = int(
                count_valid_tiles(jnp.asarray(img), jnp.asarray(flip), starts, cfg)
            )
            est = estimate_valid_tiles(img, flip, starts_np, cfg)
            assert est >= exact, (seed, flip, est, exact)
            assert est <= cfg.grid().num_tiles
    assert estimate_valid_tiles(np.zeros((100, 256)), False, starts_np, cfg) is None
    # bag_size caps the estimate like the exact count
    from dataclasses import replace

    capped = replace(cfg, bag_size=2)
    img = np.ones((256, 256), np.float32)
    assert estimate_valid_tiles(img, False, starts_np, capped) == 2


@pytest.mark.slow
def test_predict_end_to_end():
    p = _predictor()
    img = synthetic_image(128, 128, positive=True, seed=1)
    r = p.predict(img, "L", return_maps=True)
    assert r.prediction in (0, 1)
    assert 0.0 <= float(r.stats.mean) <= 1.0
    assert r.num_instances > 0
    assert r.attention.mean.shape == (2, 8)
    assert r.attention_mean_maps.shape == (2, 128, 128)
    assert r.attention_std_maps.shape == (2, 128, 128)
    # attention map peaks normalized to <= 1
    assert r.attention_mean_maps.max() <= 1.0 + 1e-5


@pytest.mark.slow
def test_predict_degenerate_inputs_degrade_gracefully():
    """Degenerate requests never crash or emit NaN: an all-zero (or all-NaN)
    image has zero valid tiles — the all-masked softmax pools a zero
    embedding, the bias-free classifiers emit zero logits, and the result is
    uniform class probabilities with ``num_instances == 0`` as the caller's
    emptiness signal.  Off-size images resize to the pipeline geometry
    (reference dataset.py:43-45 behavior) and predict normally."""
    p = _predictor()
    for img in (
        np.zeros((128, 128), np.float32),
        np.full((128, 128), np.nan, np.float32),
    ):
        r = p.predict(img, "L")
        assert r.num_instances == 0
        assert r.prediction == 0
        assert float(r.stats.mean) == pytest.approx(0.5)
        assert np.isfinite(float(r.stats.mean_entropy))
        assert np.all(np.isfinite(np.asarray(r.attention.mean)))
    r = p.predict(np.full((200, 90), 0.5, np.float32), "L")
    assert r.num_instances > 0
    assert 0.0 <= float(r.stats.mean) <= 1.0


@pytest.mark.slow
def test_predict_downsampled_maps_are_exact_box_means():
    """map_downsample=k ships the exact k-fold box mean of the
    full-resolution maps (device-side, so the fetch shrinks k^2-fold);
    a non-divisible k exercises the partial edge windows."""
    p = _predictor()
    img = synthetic_image(128, 128, positive=True, seed=3)
    full = p.predict(img, "L", return_maps=True)
    for k in (4, 48):  # 128 % 48 != 0 -> partial edge windows
        small = p.predict(img, "L", return_maps=True, map_downsample=k)
        out = -(-128 // k)
        assert small.attention_mean_maps.shape == (2, out, out)
        for name in ("attention_mean_maps", "attention_std_maps"):
            f, s = getattr(full, name), getattr(small, name)
            for y in range(out):
                for x in range(out):
                    block = f[:, y * k : (y + 1) * k, x * k : (x + 1) * k]
                    np.testing.assert_allclose(
                        s[:, y, x], block.mean(axis=(1, 2)), rtol=0, atol=1e-5,
                        err_msg=f"{name} k={k} ({y},{x})",
                    )


@pytest.mark.slow
def test_predict_deterministic_per_seed_and_laterality_matters():
    p = _predictor()
    img = synthetic_image(128, 128, positive=False, seed=2)
    a = p.predict(img, "L", seed=7)
    b = p.predict(img, "L", seed=7)
    assert float(a.stats.mean) == float(b.stats.mean)
    c = p.predict(img, "R", seed=7)  # mirrored input -> different bag
    assert float(a.stats.mean) != float(c.stats.mean) or a.num_instances != c.num_instances


@pytest.mark.slow
def test_predict_integer_pixels_match_float():
    """Raw integer pixels (the DICOM wire format) normalize on device by
    pixel_max and agree with the pre-normalized float path; dtype max is
    the default scale (``/root/reference/dataset.py:176-180``)."""
    p = _predictor()
    img = np.asarray(synthetic_image(128, 128, positive=True, seed=4))
    raw12 = np.round(img * 4095).astype(np.uint16)  # 12-bit DICOM pixels
    a = p.predict(raw12 / np.float32(4095.0), "L", seed=3)
    b = p.predict(raw12, "L", seed=3, pixel_max=4095)
    assert a.prediction == b.prediction
    np.testing.assert_allclose(
        np.asarray(a.stats.mean), np.asarray(b.stats.mean), atol=1e-5
    )
    raw8 = np.round(img * 255).astype(np.uint8)
    c = p.predict(raw8, "L", seed=3)  # dtype-max default scale
    d = p.predict(raw8 / np.float32(255.0), "L", seed=3)
    assert c.prediction == d.prediction
    # predict_many carries per-request pixel_max through both code paths
    rs = p.predict_many([raw12, raw8], seeds=[3, 3], pixel_maxes=[4095, None])
    assert rs[0].prediction == a.prediction
    assert rs[1].prediction == c.prediction


@pytest.mark.slow
def test_adaptive_bucket_predictor_matches_fixed():
    """With a BucketSpec, sparse requests embed at a smaller bucket and
    predictions match the fixed-bucket predictor (padded slots contribute
    exactly zero everywhere)."""
    from montecarlo_gated_mil_tpu.core.bag import BucketSpec

    # dropout 0: mask draws are bucket-shaped, so only the deterministic
    # path is bucket-invariant (stochastic paths are statistically
    # equivalent but not comparable pointwise)
    model = MultiHeadGatedAttentionMIL(feature_dropout=0.0, attention_dropout=0.0)
    key = jax.random.key(0)
    import jax.numpy as jnp

    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((4, 64, 64, 3)), jnp.ones(4, bool),
    )
    pipeline = PipelineConfig(
        height=128, width=128, patch_size=64, overlap=0.0,
        empty_threshold=0.05, bucket=8,
    )
    fixed = MCDOPredictor(
        model, variables["params"], pipeline, num_samples=3, use_pallas=False
    )
    adaptive = MCDOPredictor(
        model, variables["params"], pipeline, num_samples=3,
        use_pallas=False, bucket_spec=BucketSpec((2, 4, 8)),
    )
    # sparse: one bright patch -> few valid tiles -> small bucket
    sparse = np.zeros((128, 128), np.float32)
    sparse[:64, :64] = 0.8
    a = adaptive.predict(sparse, seed=5)
    b = fixed.predict(sparse, seed=5)
    assert a.attention.mean.shape[1] < b.attention.mean.shape[1]
    assert a.prediction == b.prediction
    assert a.num_instances == b.num_instances
    np.testing.assert_allclose(
        np.asarray(a.stats.mean), np.asarray(b.stats.mean), atol=1e-5
    )
    # dense: every tile filled -> the exact-fit bucket (4 tiles -> 4)
    dense = np.full((128, 128), 0.7, np.float32)
    c = adaptive.predict(dense, seed=5)
    d = fixed.predict(dense, seed=5)
    assert c.num_instances == d.num_instances == 4
    assert c.attention.mean.shape == (2, 4)  # vs fixed (2, 8)
    assert c.prediction == d.prediction
    np.testing.assert_allclose(
        np.asarray(c.stats.mean), np.asarray(d.stats.mean), atol=1e-5
    )
    adaptive.warmup()  # compiles every registry bucket <= cap


@pytest.mark.slow
def test_background_warmup_serves_at_compiled_bucket():
    """background=True returns after ONE cap-bucket compile; a request
    arriving while smaller buckets still warm runs at the smallest
    already-compiled bucket (identical prediction, more padding), and the
    thread eventually compiles the rest."""
    from montecarlo_gated_mil_tpu.core.bag import BucketSpec

    model = MultiHeadGatedAttentionMIL(feature_dropout=0.0, attention_dropout=0.0)
    key = jax.random.key(0)
    import jax.numpy as jnp

    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((4, 64, 64, 3)), jnp.ones(4, bool),
    )
    pipeline = PipelineConfig(
        height=128, width=128, patch_size=64, overlap=0.0,
        empty_threshold=0.05, bucket=8,
    )
    p = MCDOPredictor(
        model, variables["params"], pipeline, num_samples=2,
        use_pallas=False, bucket_spec=BucketSpec((2, 4, 8)),
    )
    t = p.warmup(dtypes=(np.float32,), background=True)
    assert 8 in p._infers  # cap bucket ready immediately
    # while warming, a sparse request (would pick bucket 2) must not stall
    # on a cold compile: it rounds up to a compiled bucket
    sparse = np.zeros((128, 128), np.float32)
    sparse[:64, :64] = 0.8
    r = p.predict(sparse, seed=5)
    assert r.prediction in (0, 1)
    t.join(timeout=600)
    assert not t.is_alive() and not p._warming
    assert {2, 4, 8} <= set(p._infers)  # everything warmed eventually
    # after warmup the same request uses its true small bucket
    r2 = p.predict(sparse, seed=5)
    assert r2.prediction == r.prediction
    assert r2.attention.mean.shape[1] == 2
    np.testing.assert_allclose(
        np.asarray(r2.stats.mean), np.asarray(r.stats.mean), atol=1e-5
    )


@pytest.mark.slow
def test_aot_warmup_roundtrips_executables(tmp_path):
    """aot_warmup compiles + serializes per-(bucket, dtype) executables on
    first launch and deserializes them on the next (the serving cold-start
    fix); predictions through the AOT path match the jitted path."""
    import jax.numpy as jnp

    from montecarlo_gated_mil_tpu.core.bag import BucketSpec

    model = MultiHeadGatedAttentionMIL(feature_dropout=0.0, attention_dropout=0.0)
    key = jax.random.key(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((4, 64, 64, 3)), jnp.ones(4, bool),
    )
    pipeline = PipelineConfig(
        height=128, width=128, patch_size=64, overlap=0.0,
        empty_threshold=0.05, bucket=8,
    )

    def make():
        return MCDOPredictor(
            model, variables["params"], pipeline, num_samples=2,
            use_pallas=False, bucket_spec=BucketSpec((4, 8)),
        )

    img = synthetic_image(128, 128, positive=True, seed=6)
    p_jit = make()
    ref = p_jit.predict(img, "L", seed=2)

    p1 = make()
    hits = p1.aot_warmup(str(tmp_path), dtypes=(np.float32,))
    assert hits == 0  # first launch: everything compiled + saved
    assert len(list(tmp_path.glob("*.jaxexec"))) == 2  # buckets 4 and 8
    a = p1.predict(img, "L", seed=2)
    np.testing.assert_allclose(
        np.asarray(a.stats.mean), np.asarray(ref.stats.mean), atol=1e-6
    )
    assert a.prediction == ref.prediction

    p2 = make()  # fresh predictor: everything loads from cache
    hits = p2.aot_warmup(str(tmp_path), dtypes=(np.float32,))
    assert hits == 2
    b = p2.predict(img, "L", seed=2)
    assert b.prediction == ref.prediction
    np.testing.assert_allclose(
        np.asarray(b.stats.mean), np.asarray(ref.stats.mean), atol=1e-6
    )
    # off-size images bypass the AOT executables (shape is baked in)
    small = np.zeros((100, 128), np.float32)
    r = p2.predict(small, "L", seed=1)
    assert r.prediction in (0, 1)

    # a stale/corrupt cache file must fall back to a fresh compile (and be
    # replaced on disk), not crash startup
    victim = sorted(tmp_path.glob("*.jaxexec"))[0]
    victim.write_bytes(b"not a pickled executable")
    p3 = make()
    hits = p3.aot_warmup(str(tmp_path), dtypes=(np.float32,))
    assert hits == 1  # the intact file; the corrupt one recompiled
    c = p3.predict(img, "L", seed=2)
    assert c.prediction == ref.prediction
    p4 = make()  # the rewritten file round-trips again
    assert p4.aot_warmup(str(tmp_path), dtypes=(np.float32,)) == 2


@pytest.mark.slow
def test_predict_many_and_warmup():
    p = _predictor(num_samples=2)
    p.warmup()
    imgs = [synthetic_image(128, 128, positive=bool(i % 2), seed=i) for i in range(3)]
    rs = p.predict_many(imgs)
    assert len(rs) == 3
    assert all(r.prediction in (0, 1) for r in rs)


@pytest.mark.slow
@pytest.mark.parametrize("quantized", [False, True])
def test_predict_many_dp_matches_sequential(quantized):
    """Sharded predict_many == sequential predict per request (same per-
    request keys, same embed path incl. int8), on the 8-device CPU mesh;
    partial group padding dropped.

    Float path: bitwise-tight.  Quantized path: statistically equivalent
    only — f32 reduction-order differences between the batched and
    unbatched compilations flip values sitting exactly on int8 rounding
    boundaries, and per-bag batch-stats BN cascades the flip; predictions
    must still agree and stats stay close.
    """
    p = _predictor(num_samples=3, quantized=quantized)
    imgs = [
        synthetic_image(128, 128, positive=bool(i % 2), seed=10 + i)
        for i in range(5)
    ]
    seq = p.predict_many(imgs, seed=3, dp=False)
    dp = p.predict_many(imgs, seed=3, dp=True)
    assert len(dp) == len(seq) == 5
    tol = 0.05 if quantized else 1e-5
    for a, b in zip(seq, dp):
        assert a.prediction == b.prediction
        assert a.num_instances == b.num_instances
        np.testing.assert_allclose(
            np.asarray(a.stats.mean), np.asarray(b.stats.mean), atol=tol
        )
        np.testing.assert_allclose(
            np.asarray(a.attention.mean), np.asarray(b.attention.mean), atol=tol
        )


@pytest.mark.slow
def test_from_config():
    from montecarlo_gated_mil_tpu.core.config import config_from_dict
    from montecarlo_gated_mil_tpu.runners import init_params

    cfg = config_from_dict(
        {
            "N": 3,
            "data": {
                "H": 128, "W": 128, "patch_size": 64,
                "overlap_train": 0.0, "overlap_val_test": 0.0,
                "empty_threshold": 0.05, "synthetic_count": 1,
            },
            "tpu": {"buckets": [8], "use_pallas_attention": False},
        }
    )
    from montecarlo_gated_mil_tpu.experiment import build_model

    params = init_params(build_model(cfg), jax.random.key(0))
    p = MCDOPredictor.from_config(cfg, params, use_pallas=False)
    assert p.num_samples == 3
    r = p.predict(synthetic_image(128, 128, positive=True, seed=0))
    assert r.prediction in (0, 1)
