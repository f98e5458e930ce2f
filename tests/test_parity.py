"""Golden parity: JAX models with ported weights vs torch reference equations.

The BASELINE.json target demands attention mean/variance parity to 1e-5 vs
the PyTorch reference; these tests enforce it at the component level with a
hand-built torch fixture (tests/torch_ref.py) whose state_dict keys follow
the reference schema, so they also exercise models/port.py end to end.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.models import (
    GatedAttentionMIL,
    MultiHeadGatedAttentionMIL,
    auxiliary_loss,
    make_backbone,
)
from montecarlo_gated_mil_tpu.models.port import (
    port_backbone,
    port_multihead_gamil,
    port_singlehead_gamil,
)
from tests.torch_ref import (
    TorchMultiHeadGAMIL,
    TorchSingleHeadGAMIL,
    torch_pairwise_aux,
    torch_resnet,
)


def _state_dict_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_backbone_parity_r18():
    torch.manual_seed(0)
    tm = torch_resnet("r18").eval()
    n, hw = 4, 64
    x = torch.randn(n, 3, hw, hw)
    with torch.no_grad():
        ref = tm(x).numpy()

    jm = make_backbone("r18")
    params = {"params": port_backbone(_state_dict_np(tm), "r18")}
    got = jm.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)


def test_backbone_parity_r50_f64():
    """r50 in float64: an *untrained* 50-layer net with batch-stat BN at
    every layer amplifies fp noise ~1.4x per layer, so float32 comparison is
    meaningless (~1e-3 divergence between any two correct implementations);
    float64 pins the architecture to 1e-5."""
    torch.manual_seed(0)
    tm = torch_resnet("r50").double().eval()
    x = torch.randn(4, 3, 64, 64, dtype=torch.float64)
    with torch.no_grad():
        ref = tm(x).numpy()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    jax.config.update("jax_enable_x64", True)
    try:
        jm = make_backbone("r50", dtype=jnp.float64)
        params = jax.tree.map(
            lambda a: np.asarray(a, np.float64), {"params": port_backbone(sd, "r50")}
        )
        got = np.asarray(jm.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    finally:
        jax.config.update("jax_enable_x64", False)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_backbone_mask_equals_ragged():
    """Masked padded bucket == torch on the ragged valid prefix."""
    torch.manual_seed(1)
    tm = torch_resnet("r18").eval()
    n_valid, bucket, hw = 5, 8, 64
    x = torch.randn(n_valid, 3, hw, hw)
    with torch.no_grad():
        ref = tm(x).numpy()

    jm = make_backbone("r18")
    params = {"params": port_backbone(_state_dict_np(tm))}
    padded = np.zeros((bucket, hw, hw, 3), np.float32)
    padded[:n_valid] = x.numpy().transpose(0, 2, 3, 1)
    mask = np.arange(bucket) < n_valid
    got = jm.apply(params, jnp.asarray(padded), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got)[:n_valid], ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("shared", [True, False])
def test_multihead_forward_parity(shared):
    torch.manual_seed(2)
    tm = TorchMultiHeadGAMIL(shared_attention=shared).eval()
    n, hw = 6, 64
    bag = torch.randn(n, 3, hw, hw)
    with torch.no_grad():
        y_ref, a_ref = tm(bag)

    jm = MultiHeadGatedAttentionMIL(shared_attention=shared)
    variables = port_multihead_gamil(_state_dict_np(tm), shared_attention=shared)
    y, a, aux = jm.apply(
        variables, jnp.asarray(bag.numpy().transpose(0, 2, 3, 1)), None
    )
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), atol=1e-5, rtol=1e-4)
    assert aux is None


def test_multihead_padded_parity():
    """Attention parity to 1e-5 with padding + mask vs ragged torch."""
    torch.manual_seed(3)
    tm = TorchMultiHeadGAMIL().eval()
    n_valid, bucket, hw = 5, 8, 64
    bag = torch.randn(n_valid, 3, hw, hw)
    with torch.no_grad():
        y_ref, a_ref = tm(bag)

    jm = MultiHeadGatedAttentionMIL()
    variables = port_multihead_gamil(_state_dict_np(tm))
    padded = np.zeros((bucket, hw, hw, 3), np.float32)
    padded[:n_valid] = bag.numpy().transpose(0, 2, 3, 1)
    mask = jnp.asarray(np.arange(bucket) < n_valid)
    y, a, _ = jm.apply(variables, jnp.asarray(padded), mask)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(a)[:, :n_valid], a_ref.numpy(), atol=1e-5, rtol=1e-4
    )
    assert np.all(np.asarray(a)[:, n_valid:] == 0)


def test_singlehead_forward_parity():
    torch.manual_seed(4)
    tm = TorchSingleHeadGAMIL().eval()
    n, hw = 6, 64
    bag = torch.randn(n, 3, hw, hw)
    with torch.no_grad():
        y_ref, a_ref = tm(bag)

    jm = GatedAttentionMIL()
    variables = port_singlehead_gamil(_state_dict_np(tm))
    y, a = jm.apply(variables, jnp.asarray(bag.numpy().transpose(0, 2, 3, 1)), None)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), atol=1e-5, rtol=1e-4)


def test_singlehead_mc_inference_parity():
    """Single-head MC contract (``/root/reference/model.py:87-130``): sigmoid
    applied INSIDE mc_inference, so predictions are probabilities.  At zero
    dropout every MC sample must equal sigmoid of the torch reference's
    deterministic forward, and attention must match to 1e-5."""
    from montecarlo_gated_mil_tpu.mcdo import mc_inference_single_head

    torch.manual_seed(7)
    tm = TorchSingleHeadGAMIL(feature_dropout=0.0, attention_dropout=0.0).eval()
    n, hw = 6, 64
    bag = torch.randn(n, 3, hw, hw)
    with torch.no_grad():
        y_ref, a_ref = tm(bag)
    probs_ref = torch.sigmoid(y_ref).numpy()

    jm = GatedAttentionMIL(feature_dropout=0.0, attention_dropout=0.0)
    variables = port_singlehead_gamil(_state_dict_np(tm))
    out = mc_inference_single_head(
        jm, variables, jnp.asarray(bag.numpy().transpose(0, 2, 3, 1)), None,
        4, jax.random.key(0),
    )
    assert out.aux_losses is None  # no aux loss on the single-head model
    assert out.predictions.shape == (4, 1)
    for t in range(4):
        np.testing.assert_allclose(
            np.asarray(out.predictions[t]), probs_ref, atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.attention[t]), a_ref.numpy(), atol=1e-5, rtol=1e-4
        )


@pytest.mark.parametrize("is_positive", [True, False])
@pytest.mark.parametrize("loss_type", ["pairwise", "cosine"])
def test_auxiliary_loss_parity(is_positive, loss_type):
    rng = np.random.default_rng(5)
    pos = rng.random(64).astype(np.float32)
    neg = rng.random(64).astype(np.float32)
    pos /= pos.sum()
    neg /= neg.sum()
    got = auxiliary_loss(
        jnp.asarray(pos),
        jnp.asarray(neg),
        jnp.asarray(is_positive),
        loss_type=loss_type,
    )
    tp, tn = torch.tensor(pos), torch.tensor(neg)
    if loss_type == "pairwise":
        ref = torch_pairwise_aux(tp, tn, is_positive)
    else:
        c = torch.nn.functional.cosine_similarity(
            tp.unsqueeze(0), tn.unsqueeze(0), dim=1
        )
        ref = c.mean() if is_positive else (1 - c).mean()
    np.testing.assert_allclose(float(got), float(ref), atol=1e-6)


def test_aux_loss_padding_invariant():
    """Padded zero-attention slots must not change the auxiliary loss."""
    rng = np.random.default_rng(6)
    pos = rng.random(10).astype(np.float32)
    neg = rng.random(10).astype(np.float32)
    a = float(auxiliary_loss(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(True)))
    pos_p = np.concatenate([pos, np.zeros(6, np.float32)])
    neg_p = np.concatenate([neg, np.zeros(6, np.float32)])
    b = float(auxiliary_loss(jnp.asarray(pos_p), jnp.asarray(neg_p), jnp.asarray(True)))
    # torch's pairwise_distance eps (1e-6) enters per-element, so padding
    # shifts the distance by ~sqrt(6)*1e-6 at most.
    assert abs(a - b) < 1e-5


def test_mcdo_statistics_parity_with_torch():
    """Distribution-level parity: T torch serial MCDO passes vs our vmapped
    MC inference with ported weights — predictive means agree within
    sampling noise, stds within 20%.  (PRNG streams differ by construction;
    BASELINE.json's attention mean/var target is asserted at 3-sigma.)"""
    import jax

    from montecarlo_gated_mil_tpu.mcdo import mc_inference

    torch.manual_seed(11)
    tm = TorchMultiHeadGAMIL(feature_dropout=0.2, attention_dropout=0.2).eval()

    def enable_dropout(m):
        if isinstance(m, torch.nn.Dropout):
            m.train()

    tm.apply(enable_dropout)
    n, hw, T = 6, 64, 300
    bag = torch.randn(n, 3, hw, hw)
    with torch.no_grad():
        H = tm.feature_extractor(bag)
        t_preds, t_atts = [], []
        for _ in range(T):
            Hd = tm.feature_dropout(H)
            ys, ats = [], []
            for i in range(tm.num_classes):
                av, au = tm.attention_V(Hd), tm.attention_U(Hd)
                lg = tm.attention_weights[i](av * au).squeeze(-1)
                lg = tm.attention_dropouts[i](lg)
                a = torch.softmax(lg, dim=-1)
                ys.append(tm.classifiers[i](a @ Hd))
                ats.append(a)
            t_preds.append(torch.cat(ys, -1))
            t_atts.append(torch.stack(ats))
    t_preds = torch.stack(t_preds).numpy()  # (T, C)
    t_atts = torch.stack(t_atts).numpy()  # (T, C, N)

    jm = MultiHeadGatedAttentionMIL(feature_dropout=0.2, attention_dropout=0.2)
    variables = port_multihead_gamil(_state_dict_np(tm))
    out = mc_inference(
        jm,
        variables,
        jnp.asarray(bag.numpy().transpose(0, 2, 3, 1)),
        jnp.ones(n, bool),
        T,
        jax.random.key(0),
    )
    j_preds = np.asarray(out.predictions)
    j_atts = np.asarray(out.attention)

    sigma = t_preds.std(0) / np.sqrt(T)
    np.testing.assert_allclose(
        j_preds.mean(0), t_preds.mean(0), atol=float(3.5 * sigma.max())
    )
    np.testing.assert_allclose(j_preds.std(0), t_preds.std(0), rtol=0.2)
    att_sigma = t_atts.std(0) / np.sqrt(T)
    np.testing.assert_allclose(
        j_atts.mean(0), t_atts.mean(0), atol=float(4 * att_sigma.max())
    )


def test_space_to_depth_stem_exact():
    """The s2d stem is the SAME function as the 7x7-s2 conv: identical
    params (torchvision layout), outputs equal to fp tolerance."""
    from montecarlo_gated_mil_tpu.models.resnet import ResNetFeatures, BasicBlock

    key = jax.random.key(0)
    x = jax.random.normal(key, (4, 64, 64, 3))
    mask = jnp.ones(4, bool)
    plain = ResNetFeatures(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock)
    s2d = ResNetFeatures(
        stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, space_to_depth=True
    )
    vs = plain.init(key, x, mask)
    # identical parameter trees -> checkpoints/ported weights reusable
    vs2 = s2d.init(key, x, mask)
    assert jax.tree.structure(vs) == jax.tree.structure(vs2)
    out_plain = plain.apply(vs, x, mask)
    out_s2d = s2d.apply(vs, x, mask)
    np.testing.assert_allclose(
        np.asarray(out_s2d), np.asarray(out_plain), atol=2e-4, rtol=1e-4
    )


def test_space_to_depth_full_model_parity_vs_torch():
    """Full MH-GA-MIL with the s2d stem still matches the torch reference."""
    torch.manual_seed(2)
    tm = TorchMultiHeadGAMIL().eval()
    bag = torch.randn(6, 3, 64, 64)
    with torch.no_grad():
        y_ref, a_ref = tm(bag)
    jm = MultiHeadGatedAttentionMIL(space_to_depth=True)
    variables = port_multihead_gamil(_state_dict_np(tm))
    y, a, _ = jm.apply(variables, jnp.asarray(bag.numpy().transpose(0, 2, 3, 1)), None)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a), a_ref.numpy(), atol=1e-5, rtol=1e-3)


def test_space_to_depth_rejects_odd_sizes():
    from montecarlo_gated_mil_tpu.models.resnet import ResNetFeatures, BasicBlock

    key = jax.random.key(0)
    s2d = ResNetFeatures(
        stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, space_to_depth=True
    )
    with pytest.raises(ValueError, match="even"):
        s2d.init(key, jnp.zeros((2, 63, 64, 3)), jnp.ones(2, bool))


@pytest.mark.slow
@pytest.mark.parametrize("opt_name,lr,wd", [("adam", 1e-3, 1e-4), ("sgd", 5e-2, 1e-4)])
def test_training_trajectory_parity_vs_torch(opt_name, lr, wd):
    """k-epoch TRAJECTORY parity: the full train loop (grad accumulation,
    CE + scaled auxiliary loss, torch-semantics optimizer) run for 3 epochs
    from ported weights produces the same per-epoch train/val losses as a
    hand-written torch loop implementing the reference's
    ``net_utils.py:33-78`` (loss /= k, step every k batches AND at epoch
    end) + ``main.py:83-91``.  This pins loops+optimizer+criterion+aux
    together end to end — step-level parity alone could hide a cross-
    component loss-scaling bug.  float64 both sides: 3 epochs of backprop
    through an untrained batch-stats-BN r18 amplifies f32 noise past any
    useful tolerance.
    """
    import torch.nn.functional as tF

    from montecarlo_gated_mil_tpu.core.bag import Bag
    from montecarlo_gated_mil_tpu.core.config import (
        SchedulerConfig,
        TrainingParameters,
        TrainingPlan,
    )
    from montecarlo_gated_mil_tpu.train.criteria import cross_entropy
    from montecarlo_gated_mil_tpu.train.loops import train_epoch, validate
    from montecarlo_gated_mil_tpu.train.optim import make_optimizer
    from montecarlo_gated_mil_tpu.train.state import TrainState, make_train_step

    K_ACC, EPOCHS, N_INST, HW = 2, 3, 4, 32
    torch.manual_seed(7)
    tm = TorchMultiHeadGAMIL(
        backbone="r18", feature_dropout=0.0, attention_dropout=0.0
    ).double()
    # 5 train bags (odd: exercises the epoch-end partial flush) + 3 val bags
    train_bags = [
        (torch.randn(N_INST, 3, HW, HW, dtype=torch.float64), i % 2)
        for i in range(5)
    ]
    val_bags = [
        (torch.randn(N_INST, 3, HW, HW, dtype=torch.float64), (i + 1) % 2)
        for i in range(3)
    ]

    # ---- torch side: the reference's accumulation loop, verbatim semantics
    if opt_name == "adam":
        opt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd)
    else:
        opt = torch.optim.SGD(tm.parameters(), lr=lr, weight_decay=wd)

    def torch_loss(bag, label):
        y, a = tm(bag)
        ce = tF.cross_entropy(y.unsqueeze(0), torch.tensor([label]))
        aux = 0.5 * torch_pairwise_aux(a[1], a[0], label == 1)
        return ce + aux

    ref_train, ref_val = [], []
    for _epoch in range(EPOCHS):
        tm.train()
        losses = []
        opt.zero_grad()
        for i, (bag, label) in enumerate(train_bags):
            loss = torch_loss(bag, label)
            (loss / K_ACC).backward()
            if (i + 1) % K_ACC == 0 or i == len(train_bags) - 1:
                opt.step()
                opt.zero_grad()
            losses.append(float(loss))
        ref_train.append(sum(losses) / len(losses))
        tm.eval()
        with torch.no_grad():
            vls = [
                float(tF.cross_entropy(tm(b)[0].unsqueeze(0), torch.tensor([l])))
                for b, l in val_bags
            ]
        ref_val.append(sum(vls) / len(vls))

    # ---- jax side: the real loop functions with ported initial weights
    torch.manual_seed(7)  # fresh fixture at the SAME init as above
    tm0 = TorchMultiHeadGAMIL(
        backbone="r18", feature_dropout=0.0, attention_dropout=0.0
    ).double()
    sd = {k: v.detach().numpy() for k, v in tm0.state_dict().items()}
    jax.config.update("jax_enable_x64", True)
    try:
        jm = MultiHeadGatedAttentionMIL(
            backbone="r18",
            feature_dropout=0.0,
            attention_dropout=0.0,
            dtype=jnp.float64,
        )
        variables = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64), port_multihead_gamil(sd)
        )

        def to_bag(bag, label):
            n = bag.shape[0]
            return Bag(
                patches=jnp.asarray(bag.numpy().transpose(0, 2, 3, 1)),
                mask=jnp.ones((n,), bool),
                label=jnp.asarray(label, jnp.int32),
                tile_indices=jnp.arange(n, dtype=jnp.int32),
            )

        jtrain = [(to_bag(b, l), None) for b, l in train_bags]
        jval = [(to_bag(b, l), None) for b, l in val_bags]
        plan = TrainingPlan(
            parameters=TrainingParameters(lr=lr, wd=wd, grad_acc_steps=K_ACC),
            optimizer=opt_name,
            scheduler=SchedulerConfig(name="none"),
        )
        optimizer = make_optimizer(plan)
        step_fn = make_train_step(jm, cross_entropy, optimizer, K_ACC)
        state = TrainState.create(variables["params"], optimizer)

        from montecarlo_gated_mil_tpu.utils.metrics import Metrics, MemorySink

        sink = MemorySink()
        got_train, got_val = [], []
        for epoch in range(1, EPOCHS + 1):
            state = train_epoch(
                step_fn, state, jtrain, epoch=epoch,
                accumulation_steps=K_ACC, key=jax.random.key(0),
                metrics=Metrics([sink]),
            )
            got_train.append(
                [v for n, v, s in sink.records
                 if n == "train/epoch_loss" and s == epoch][0]
            )
            got_val.append(
                validate(jm, state.params, jval, cross_entropy, epoch=epoch)
            )
    finally:
        jax.config.update("jax_enable_x64", False)

    # Step-level f64 agreement is ~1e-13 relative (loss, grads; probed in
    # round 4), but torch and XLA convolutions reduce in different orders,
    # and an untrained batch-stats-BN net amplifies that rounding noise
    # chaotically across epochs (measured ~1e-6 relative by epoch 3).  1e-4
    # still catches every semantic bug this test exists for (a wrong /k, a
    # missing aux scale, optimizer drift are all >1e-2).
    np.testing.assert_allclose(got_train, ref_train, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got_val, ref_val, rtol=1e-4, atol=1e-6)
