"""Core layer: config schema, bag/bucket registry, PRNG streams."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.core.bag import Bag, BucketSpec, pad_to_bucket, stack_bags
from montecarlo_gated_mil_tpu.core.config import (
    Config,
    config_from_dict,
    config_to_dict,
    load_config,
)
from montecarlo_gated_mil_tpu.core.rng import (
    epoch_key,
    key_iter,
    mc_keys,
    named_key,
    root_key,
)


def test_reference_yaml_loads_verbatim():
    cfg = load_config("/root/reference/config.yml")
    assert cfg.model in ("r18", "r34", "r50")
    assert cfg.N == 50
    assert cfg.is_mcdo_test is True  # dash-key alias mapped
    assert cfg.data.patch_size == 224
    assert cfg.training_plan.optimizer in ("adam", "sgd")
    assert cfg.training_plan.scheduler.name  # scheduler block parsed


def test_config_roundtrip_and_defaults():
    cfg = config_from_dict({"seed": 9})
    assert cfg.seed == 9 and cfg.model == "r18"
    d = config_to_dict(cfg)
    assert d["seed"] == 9 and d["tpu"]["buckets"] == (64, 128, 256, 512, 1024)
    cfg2 = config_from_dict({k: v for k, v in d.items()})
    assert cfg2 == cfg


@pytest.mark.parametrize(
    "raw,msg",
    [
        ({"N": 0}, "MC samples"),
        ({"feature_dropout": 1.0}, "feature_dropout"),
        ({"data": {"empty_threshold": 2.0}}, "empty_threshold"),
        ({"data": {"bag_size_train": 0}}, "bag_size_train"),
        ({"data": {"cv_folds": 1}}, "cv_folds"),
        ({"training_plan": {"criterion": "mse"}}, "criterion"),
        ({"tpu": {"buckets": [64, 32]}}, "increasing"),
        ({"tpu": {"buckets": [50, 100]}}, "multiples of 8"),
    ],
)
def test_config_validation_errors(raw, msg):
    with pytest.raises(ValueError, match=msg):
        config_from_dict(raw)


def test_bucket_spec_selection():
    spec = BucketSpec((64, 128, 256))
    assert spec.bucket_for(1) == 64
    assert spec.bucket_for(64) == 64
    assert spec.bucket_for(65) == 128
    assert spec.bucket_for(9999) == 256  # largest bucket caps
    assert spec.max_size == 256
    with pytest.raises(ValueError):
        BucketSpec((128, 64))
    with pytest.raises(ValueError):
        BucketSpec(())


def test_pad_to_bucket_and_stack():
    patches = np.random.rand(5, 4, 4, 3).astype(np.float32)
    bag = pad_to_bucket(patches, np.arange(5), label=1, bucket=8)
    assert bag.bucket == 8 and int(bag.num_instances) == 5
    np.testing.assert_array_equal(np.asarray(bag.patches[:5]), patches)
    assert np.asarray(bag.patches[5:]).max() == 0
    # truncation keeps the first `bucket` (callers rank by fill first)
    big = pad_to_bucket(patches, np.arange(5), label=0, bucket=3)
    assert int(big.num_instances) == 3
    stacked = stack_bags([bag, bag])
    assert stacked.patches.shape == (2, 8, 4, 4, 3)
    with pytest.raises(ValueError):
        stack_bags([bag, big])


def test_bag_is_pytree():
    bag = pad_to_bucket(
        np.zeros((2, 4, 4, 3), np.float32), np.arange(2), label=0, bucket=4
    )
    doubled = jax.tree.map(lambda x: x, bag)  # map over leaves keeps type
    assert isinstance(doubled, Bag)


def test_rng_streams_independent_and_stable():
    k = root_key(42)
    a = named_key(k, "dropout")
    b = named_key(k, "data-order")
    assert not np.array_equal(jax.random.key_data(a), jax.random.key_data(b))
    # stable across calls/processes (FNV-1a hash, not Python hash())
    a2 = named_key(root_key(42), "dropout")
    np.testing.assert_array_equal(jax.random.key_data(a), jax.random.key_data(a2))
    ks = mc_keys(a, 5)
    assert ks.shape[0] == 5
    e1, e2 = epoch_key(a, 1), epoch_key(a, 2)
    assert not np.array_equal(jax.random.key_data(e1), jax.random.key_data(e2))
    it = key_iter(a)
    k1, k2 = next(it), next(it)
    assert not np.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))


def test_batch_size_must_be_one():
    """batch_size is parsed (reference config.yml:42) but any value != 1 is
    refused instead of silently ignored: per-bag training is the semantic
    (the reference's own loop breaks past 1, net_utils.py:20)."""
    import pytest

    from montecarlo_gated_mil_tpu.core.config import config_from_dict

    with pytest.raises(ValueError, match="batch_size must be 1"):
        config_from_dict({"training_plan": {"parameters": {"batch_size": 4}}})
