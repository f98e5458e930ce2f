"""SPMD data parallelism on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlo_gated_mil_tpu.core.bag import Bag
from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL
from montecarlo_gated_mil_tpu.parallel import (
    make_dp_mc_eval,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from montecarlo_gated_mil_tpu.train import TrainState, cross_entropy
import optax


def _batch(b, n=8, hw=32, seed=0):
    key = jax.random.key(seed)
    return Bag(
        patches=jax.random.normal(key, (b, n, hw, hw, 3)),
        mask=jnp.tile(jnp.arange(n) < 6, (b, 1)),
        label=jnp.arange(b, dtype=jnp.int32) % 2,
        tile_indices=jnp.zeros((b, n), jnp.int32),
    )


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == 8 and mesh.axis_names == ("data", "inst")
    mesh42 = make_mesh(data=4, inst=2)
    assert mesh42.shape["data"] == 4 and mesh42.shape["inst"] == 2
    with pytest.raises(ValueError):
        make_mesh(data=3)


@pytest.mark.slow
def test_dp_train_step_runs_and_matches_single_device():
    mesh = make_mesh()
    model = MultiHeadGatedAttentionMIL()
    key = jax.random.key(0)
    bags = _batch(8)
    variables = model.init(
        {"params": key, "dropout": key}, bags.patches[0], bags.mask[0]
    )
    opt = optax.sgd(0.01)
    state = TrainState.create(variables["params"], opt)
    step = make_dp_train_step(model, cross_entropy, opt, mesh)
    keys = jax.random.split(jax.random.key(1), 8)
    sharded = shard_batch(mesh, bags)
    # single-device reference BEFORE the step: the dp step donates its state
    # buffers, deleting the original params arrays.
    def loss_fn(params):
        def per_bag(bag, k):
            y, _, aux = model.apply(
                {"params": params}, bag.patches, bag.mask, bag.label,
                train=True, rngs={"dropout": k},
            )
            return cross_entropy(y[None], bag.label[None]) + aux
        return jnp.mean(jax.vmap(per_bag)(bags, keys))
    ref_loss = float(loss_fn(variables["params"]))
    new_state, out = step(state, sharded, keys)
    assert np.isfinite(float(out["loss"]))
    assert int(new_state.step) == 1
    assert float(out["loss"]) == pytest.approx(ref_loss, abs=1e-5)


def test_dp_mc_eval_sharded():
    mesh = make_mesh()
    model = MultiHeadGatedAttentionMIL()
    key = jax.random.key(0)
    bags = _batch(8)
    variables = model.init(
        {"params": key, "dropout": key}, bags.patches[0], bags.mask[0]
    )
    eval_step = make_dp_mc_eval(model, mesh, num_samples=3)
    keys = jax.random.split(jax.random.key(2), 8)
    preds, atts = eval_step(variables["params"], shard_batch(mesh, bags), keys)
    assert preds.shape == (8, 3, 2) and atts.shape == (8, 3, 2, 8)
    # each bag's attention rows sum to one over valid slots
    np.testing.assert_allclose(np.asarray(atts.sum(-1)), 1.0, atol=1e-5)
    # padded slots zero everywhere
    assert np.asarray(atts)[:, :, :, 6:].max() == 0.0


@pytest.mark.slow
def test_instance_sharded_attention_matches_single_chip():
    """Two-pass psum softmax over the inst axis == single-chip head math."""
    from montecarlo_gated_mil_tpu.ops.gated_attention import (
        GatedAttentionParams,
        mc_head_reference,
    )
    from montecarlo_gated_mil_tpu.parallel.instance import (
        sharded_gated_attention,
        sharded_mc_gated_attention,
    )

    mesh = make_mesh(data=1, inst=8)
    key = jax.random.key(0)
    N, L, D, C = 64, 128, 32, 2
    ks = jax.random.split(key, 8)
    params = GatedAttentionParams(
        w_V=jax.random.normal(ks[0], (L, D)) * 0.05,
        b_V=jax.random.normal(ks[1], (D,)) * 0.05,
        w_U=jax.random.normal(ks[2], (L, D)) * 0.05,
        b_U=jax.random.normal(ks[3], (D,)) * 0.05,
        w_att=jax.random.normal(ks[4], (D, C)) * 0.05,
        b_att=jax.random.normal(ks[5], (C,)) * 0.05,
        w_cls=jax.random.normal(ks[6], (C, L)) * 0.05,
    )
    H = jax.random.normal(ks[7], (N, L))
    mask = jnp.arange(N) < 50
    # deterministic: compare against the jnp reference at dropout 0
    y_ref, a_ref = mc_head_reference(H, mask, params, 1, key, 0.0, 0.0)
    y, a = sharded_gated_attention(H, mask, params, mesh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref[0]), atol=1e-6)

    # MC: shapes, row-normalization, per-key determinism
    ym, am = sharded_mc_gated_attention(
        H, mask, params, 4, jax.random.key(3), mesh,
        feature_dropout=0.1, attention_dropout=0.1,
    )
    assert ym.shape == (4, C) and am.shape == (4, C, N)
    np.testing.assert_allclose(np.asarray(am.sum(-1)), 1.0, atol=1e-5)
    assert np.asarray(am)[:, :, 50:].max() == 0.0
    ym2, _ = sharded_mc_gated_attention(
        H, mask, params, 4, jax.random.key(3), mesh,
        feature_dropout=0.1, attention_dropout=0.1,
    )
    np.testing.assert_array_equal(np.asarray(ym), np.asarray(ym2))

    with pytest.raises(ValueError, match="not divisible"):
        sharded_gated_attention(H[:60], mask[:60], params, mesh)


@pytest.mark.slow
def test_mc_test_dp_matches_sequential():
    """Sharded MC test == sequential mc_test, bag for bag (same keys)."""
    from montecarlo_gated_mil_tpu.data import (
        BagLoader,
        PipelineConfig,
        make_synthetic_reader,
        synthetic_records,
    )
    from montecarlo_gated_mil_tpu.evaluation.dp_eval import mc_test_dp
    from montecarlo_gated_mil_tpu.train.loops import mc_test
    from montecarlo_gated_mil_tpu.utils.metrics import MemorySink, Metrics

    model = MultiHeadGatedAttentionMIL()
    key = jax.random.key(0)
    cfg = PipelineConfig(height=128, width=128, patch_size=64, overlap=0.0,
                         empty_threshold=0.05, bucket=8)
    recs = synthetic_records(11, seed=4)  # 11 bags -> one partial group of 3
    loader = BagLoader(recs, make_synthetic_reader(128, 128), cfg)
    sample, _ = next(iter(loader.epoch(0)))
    variables = model.init(
        {"params": key, "dropout": key}, sample.patches, sample.mask
    )
    tkey = jax.random.key(9)
    acc_seq, rep_seq = mc_test(
        model, variables["params"], loader, num_samples=3, key=tkey,
        metrics=Metrics([MemorySink()]),
    )
    mesh = make_mesh()
    acc_dp, rep_dp = mc_test_dp(
        model, variables["params"], loader, num_samples=3, key=tkey,
        mesh=mesh, metrics=Metrics([MemorySink()]),
    )
    assert acc_dp == acc_seq
    assert rep_dp == rep_seq


def test_fold_assignment_partitions_all_folds():
    from montecarlo_gated_mil_tpu.parallel.distributed import fold_assignment

    for procs in (1, 2, 3, 5, 8):
        seen = []
        for p in range(procs):
            mine = fold_assignment(5, p, procs)
            assert mine == sorted(mine)
            seen.extend(mine)
        assert sorted(seen) == list(range(5))  # partition, no dup/loss
    assert fold_assignment(5, 0, 1) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        fold_assignment(5, 2, 2)
    with pytest.raises(ValueError):
        fold_assignment(5, 0, 0)


@pytest.mark.slow
def test_distributed_initialize_runs_before_backend_init():
    """Regression: initialize() must call jax.distributed.initialize BEFORE
    anything that initializes the XLA backends (a jax.process_count()
    pre-check used to make every configured init raise).  Verified in a
    fresh subprocess with a 1-process coordinator."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from montecarlo_gated_mil_tpu.parallel.distributed import initialize\n"
        f"ok = initialize('127.0.0.1:{port}', 1, 0)\n"
        "assert ok is False  # 1 process -> not multi-process, but init ran\n"
        "assert jax.process_count() == 1\n"
        "print('INIT-OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert "INIT-OK" in out.stdout, out.stderr[-2000:]


def test_distributed_single_process_passthrough():
    """In a single-process run, initialize is a no-op and the accuracy
    gather is the identity merge (no collective issued)."""
    from montecarlo_gated_mil_tpu.parallel.distributed import (
        allgather_fold_accuracies,
        initialize,
    )

    assert initialize() is False  # unconfigured -> stays single-process
    merged = allgather_fold_accuracies([0, 2], [0.5, 0.75], 3)
    assert merged == {0: 0.5, 2: 0.75}


@pytest.mark.slow
def test_mc_test_dp_mixed_buckets_matches_sequential():
    """Adaptive per-bag buckets compose with sharded eval: dp groups bags by
    bucket, flushes partial groups per bucket, and re-orders predictions to
    stream order — identical to the sequential path bag-for-bag."""
    from montecarlo_gated_mil_tpu.core.bag import pad_to_bucket
    from montecarlo_gated_mil_tpu.evaluation.dp_eval import mc_test_dp
    from montecarlo_gated_mil_tpu.train.loops import mc_test
    from montecarlo_gated_mil_tpu.utils.metrics import MemorySink, Metrics

    model = MultiHeadGatedAttentionMIL()
    rng = np.random.default_rng(0)
    items = []
    for i in range(11):  # buckets 8 and 16 interleaved, both groups partial
        n, bucket = (5, 8) if i % 2 else (12, 16)
        patches = rng.normal(size=(n, 64, 64, 3)).astype(np.float32)
        bag = pad_to_bucket(
            patches, np.arange(n, dtype=np.int32), int(i % 3 == 0), bucket
        )
        items.append((bag, None))
    key = jax.random.key(0)
    variables = model.init(
        {"params": key, "dropout": key}, items[0][0].patches, items[0][0].mask
    )
    tkey = jax.random.key(9)
    acc_seq, rep_seq = mc_test(
        model, variables["params"], items, num_samples=3, key=tkey,
        metrics=Metrics([MemorySink()]),
    )
    acc_dp, rep_dp = mc_test_dp(
        model, variables["params"], items, num_samples=3, key=tkey,
        mesh=make_mesh(), metrics=Metrics([MemorySink()]),
    )
    assert acc_dp == acc_seq
    assert rep_dp == rep_seq


@pytest.mark.slow
def test_mc_test_dp_pending_cap_flushes_early_and_matches_sequential():
    """With more registry buckets than the pending cap allows, partial
    groups flush early (bounding device-resident bags) and predictions
    still match the sequential path bag-for-bag."""
    from montecarlo_gated_mil_tpu.core.bag import pad_to_bucket
    from montecarlo_gated_mil_tpu.evaluation.dp_eval import mc_test_dp
    from montecarlo_gated_mil_tpu.train.loops import mc_test
    from montecarlo_gated_mil_tpu.utils.metrics import MemorySink, Metrics

    model = MultiHeadGatedAttentionMIL()
    rng = np.random.default_rng(1)
    items = []
    # three buckets, seven bags each -> 21 pending > 2*batch(8)=16 without
    # any group ever reaching the mesh batch size
    for i in range(21):
        n, bucket = [(4, 8), (10, 16), (18, 24)][i % 3]
        patches = rng.normal(size=(n, 32, 32, 3)).astype(np.float32)
        bag = pad_to_bucket(
            patches, np.arange(n, dtype=np.int32), int(i % 2), bucket
        )
        items.append((bag, None))
    key = jax.random.key(0)
    variables = model.init(
        {"params": key, "dropout": key}, items[0][0].patches, items[0][0].mask
    )
    tkey = jax.random.key(4)
    acc_seq, rep_seq = mc_test(
        model, variables["params"], items, num_samples=2, key=tkey,
        metrics=Metrics([MemorySink()]),
    )
    acc_dp, rep_dp = mc_test_dp(
        model, variables["params"], items, num_samples=2, key=tkey,
        mesh=make_mesh(), metrics=Metrics([MemorySink()]),
    )
    assert acc_dp == acc_seq
    assert rep_dp == rep_seq
