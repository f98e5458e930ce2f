"""Training / validation / test loops.

Capability spec (``/root/reference/net_utils.py``):

- ``train_epoch`` == ``train_gacc`` (``net_utils.py:33-78``): CE(+scaled aux)
  loss, gradient accumulation with an optimizer step every k batches and at
  epoch end, epoch metrics ``train/epoch_loss|epoch_acc|aux_loss`` with
  optional fold prefix.
- ``validate`` (``net_utils.py:82-114``): deterministic forward without
  targets (no aux), CE loss, argmax accuracy; returns epoch loss for early
  stopping.
- ``mc_validate`` (``net_utils.py:116-158``): T MC samples with targets;
  loss = mean over T of (CE per sample + aux per sample); prediction =
  argmax of the mean **raw logits** over T.
- ``test`` / ``mc_test`` (``net_utils.py:160-230``): accuracy + sklearn
  classification report; MC prediction = argmax of mean **softmax** over T
  (note: deliberately different reduction than mc_validate, preserved).

All device work is jitted once per (model, criterion) pair via cached
builders; the host loop only feeds bags and accumulates Python floats.
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_gated_mil_tpu.mcdo.sampling import mc_inference
from montecarlo_gated_mil_tpu.train.state import TrainState
from montecarlo_gated_mil_tpu.utils.metrics import Metrics


@functools.lru_cache(maxsize=1)
def _instance_mesh():
    """Mesh with every local device on the ``inst`` axis, for routing
    oversized bags (bucket > ``shard_over``) through the instance-sharded
    path (``parallel/instance.py`` — the MIL analogue of sequence
    parallelism, SURVEY.md §5).  None on a single device or under
    multi-process fold fan-out (each process evaluates different folds, so
    a global mesh would issue mismatched SPMD programs)."""
    if jax.process_count() > 1 or jax.device_count() <= 1:
        return None
    from montecarlo_gated_mil_tpu.parallel.mesh import make_mesh

    return make_mesh(data=1, inst=jax.device_count())


def _shard_mesh_for(bucket: int, shard_over: int | None):
    """The instance mesh when this bag should shard, else None."""
    if shard_over is None or bucket <= shard_over:
        return None
    mesh = _instance_mesh()
    if mesh is None or bucket % mesh.shape["inst"]:
        return None
    return mesh


# Measured training-step HBM temp per input element (bf16 embed fwd+bwd
# with XLA's remat, CE+aux, Adam): 52.8 B/elem at bucket 1024x224px, linear
# in the bucket (tools/measure_hbm.py, r05) — rounded up to 56 for margin.
# The XLA:TPU compiler REFUSES programs over HBM at compile time with an
# opaque dump; this predicts that refusal and says what to do instead.
_TRAIN_TEMP_BYTES_PER_INPUT_ELEM = 56.0


def _check_unrouted_train_bag(bag, shard_over: int | None) -> None:
    """Fail fast (actionably) when an OVERSIZED training bag could not route
    to the instance-sharded step and would not fit one chip's HBM.

    Routing can fail on a single device, under multi-process fold fan-out,
    or when the extended bucket is not divisible by the device count
    (``_shard_mesh_for``).  Training an extended bucket whole on one chip is
    then the only remaining plan, and past ~1024 tiles at 224px it exceeds a
    16 GB v5e — the compiler would refuse with a 200-line allocation dump
    (docs/PERFORMANCE.md §HBM envelope); this raises the short version.
    """
    if shard_over is None or bag.bucket <= shard_over:
        return
    import os

    env = os.environ.get("MCGMIL_HBM_LIMIT_BYTES")
    if env is not None:
        limit = float(env)
    else:
        dev = jax.devices()[0]
        if dev.platform != "tpu":
            return  # CPU/GPU hosts page; the measured envelope is TPU's
        stats = (getattr(dev, "memory_stats", lambda: None)() or {})
        limit = float(stats.get("bytes_limit", 16 * 1024**3))
    est = (
        bag.patches.size * _TRAIN_TEMP_BYTES_PER_INPUT_ELEM
        + bag.patches.nbytes
        + (1 << 29)  # params + optimizer + accumulator headroom
    )
    if est > 0.95 * limit:
        raise ValueError(
            f"oversized training bag (bucket {bag.bucket}, patches "
            f"{tuple(bag.patches.shape)}) needs ~{est / 1024**3:.1f} GB HBM "
            f"for the training step but the device has "
            f"{limit / 1024**3:.1f} GB; it could not instance-shard "
            "(single device, multi-process fold fan-out, or bucket not "
            "divisible by the device count). Options: run on a multi-device "
            "mesh (oversized bags then train instance-sharded), reduce the "
            "tile count (lower overlap, raise empty_threshold), or accept "
            "truncation with tpu.oversized_bags='truncate'."
        )


def warn_float_shard(quantized: bool = False, use_pallas: bool = False) -> None:
    """Oversized bags evaluate on the exact float instance-sharded path;
    the int8 and fused-Pallas variants are single-chip programs and do not
    apply there.  Callers say so (once per eval loop) so a metric labeled
    int8/Pallas is never silently a mixed-regime number."""
    import warnings

    what = " + ".join(
        n for n, on in (("int8", quantized), ("fused-Pallas", use_pallas)) if on
    )
    warnings.warn(
        f"oversized bag routed to the instance-sharded EXACT float path; the "
        f"{what} single-chip variant does not apply there — this metric "
        "mixes evaluation regimes for such bags",
        stacklevel=3,
    )


@functools.lru_cache(maxsize=32)
def _det_step_sharded(model, criterion):
    """Deterministic forward with the instance axis sharded over all
    devices: sharded embed (cross-shard psum BN stats) + two-pass psum
    masked softmax head.  Math-identical to ``_det_step`` up to float
    reduction order (pinned by tests/test_parallel.py)."""
    from montecarlo_gated_mil_tpu.ops.gated_attention import GatedAttentionParams
    from montecarlo_gated_mil_tpu.parallel.instance import (
        sharded_embed,
        sharded_gated_attention,
    )

    mesh = _instance_mesh()

    @jax.jit
    def f(params, patches, mask, label):
        H = sharded_embed(model, params, patches, mask, mesh)
        y, _ = sharded_gated_attention(
            H, mask, GatedAttentionParams.from_model_params(params), mesh
        )
        loss = criterion(y[None, :], label[None])
        return loss, jnp.argmax(y)

    return f


@functools.lru_cache(maxsize=32)
def _mc_test_step_sharded(model, num_samples: int):
    """MC test step for an oversized bag: instance-sharded embed + MC head
    (float path; the Pallas/int8 variants are single-chip programs and do
    not apply here).  Same reduction as ``_mc_test_step``."""
    from montecarlo_gated_mil_tpu.parallel.instance import mc_inference_sharded

    mesh = _instance_mesh()

    @jax.jit
    def f(params, patches, mask, key):
        y, _ = mc_inference_sharded(
            model, params, patches, mask, num_samples, key, mesh
        )
        probs = jax.nn.softmax(y, axis=-1)
        return jnp.argmax(jnp.mean(probs, axis=0))

    return f


@functools.lru_cache(maxsize=32)
def _mc_val_step_sharded(model, criterion, num_samples: int):
    """MC validation step for an oversized bag (same loss/prediction
    reductions as ``_mc_val_step``; dropout draws are the sharded head's
    per-shard streams — statistically equivalent, not bit-identical)."""
    from montecarlo_gated_mil_tpu.parallel.instance import mc_inference_sharded

    mesh = _instance_mesh()

    @jax.jit
    def f(params, patches, mask, label, key):
        y, a = mc_inference_sharded(
            model, params, patches, mask, num_samples, key, mesh
        )
        return _mc_val_finish(model, criterion, y, a, label)

    return f


def _mc_val_finish(model, criterion, preds, attn, label):
    """Shared mc-validate reduction: mean over T of (CE + aux), prediction =
    argmax of mean RAW logits (``/root/reference/net_utils.py:139``)."""
    from montecarlo_gated_mil_tpu.models.gamil import auxiliary_loss

    aux_losses = model.aux_scale * auxiliary_loss(
        attn[:, 1, :], attn[:, 0, :], label == 1,
        loss_type=model.aux_loss_type, margin=model.aux_margin,
    )
    ce = jax.vmap(lambda yy: criterion(yy[None, :], label[None]))(preds)
    loss = jnp.mean(ce + aux_losses)
    aux = jnp.mean(aux_losses)
    pred = jnp.argmax(jnp.mean(preds, axis=0))
    return loss, aux, pred


def _allow_pallas(model, use_pallas: bool) -> bool:
    """Off-TPU the fused kernel runs only interpreted and only its
    deterministic path (the hardware PRNG has no CPU lowering), so fall
    back to the jnp twin for any model with active dropout instead of
    crashing with an opaque NotImplementedError."""
    if not use_pallas or jax.default_backend() == "tpu":
        return use_pallas
    return model.feature_dropout == 0.0 and model.attention_dropout == 0.0


@functools.lru_cache(maxsize=32)
def _det_step(model, criterion):
    @jax.jit
    def f(params, patches, mask, label):
        y, _, _ = model.apply({"params": params}, patches, mask)
        loss = criterion(y[None, :], label[None])
        return loss, jnp.argmax(y)

    return f


@functools.lru_cache(maxsize=32)
def _mc_val_step(model, criterion, num_samples: int, use_pallas: bool = False):
    def _finish(preds, attn, label):
        return _mc_val_finish(model, criterion, preds, attn, label)

    if use_pallas:
        from montecarlo_gated_mil_tpu.mcdo.sampling import mc_head
        from montecarlo_gated_mil_tpu.ops.gated_attention import (
            FUSED_HEAD_MAX_N,
            GatedAttentionParams,
            mc_gated_attention_fused,
        )

        @jax.jit
        def f(params, patches, mask, label, key):
            H = model.apply({"params": params}, patches, mask, method="embed")
            if mask.shape[0] > FUSED_HEAD_MAX_N:
                # static-shape fallback: past ~5.3k tiles the fused kernel's
                # VMEM-resident bag exceeds the scoped-vmem stack and XLA
                # refuses the program (gated_attention.FUSED_HEAD_MAX_N)
                out = mc_head(
                    model, {"params": params}, H, mask, num_samples, key
                )
                return _finish(out.predictions, out.attention, label)
            seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
            y, a = mc_gated_attention_fused(
                H,
                mask,
                GatedAttentionParams.from_model_params(params),
                num_samples,
                seed,
                model.feature_dropout,
                model.attention_dropout,
                # off-TPU the kernel runs interpreted (deterministic path
                # only: the hardware PRNG has no CPU lowering)
                interpret=jax.default_backend() != "tpu",
            )
            return _finish(y, a, label)

        return f

    @jax.jit
    def f(params, patches, mask, label, key):
        out = mc_inference(
            model, {"params": params}, patches, mask, num_samples, key
        )
        return _finish(out.predictions, out.attention, label)

    return f


@functools.lru_cache(maxsize=32)
def _mc_test_step(
    model, num_samples: int, use_pallas: bool = False, quantized: bool = False
):
    from montecarlo_gated_mil_tpu.mcdo.sampling import make_embed_fn

    embed = make_embed_fn(model, quantized)
    if use_pallas:
        from montecarlo_gated_mil_tpu.mcdo.sampling import mc_head
        from montecarlo_gated_mil_tpu.ops.gated_attention import (
            FUSED_HEAD_MAX_N,
            GatedAttentionParams,
            mc_gated_attention_fused,
        )

        @jax.jit
        def f(params, patches, mask, key):
            H = embed(params, patches, mask)
            if mask.shape[0] > FUSED_HEAD_MAX_N:
                # static-shape fallback past the kernel's VMEM ceiling
                out = mc_head(
                    model, {"params": params}, H, mask, num_samples, key
                )
                probs = jax.nn.softmax(out.predictions, axis=-1)
                return jnp.argmax(jnp.mean(probs, axis=0))
            seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
            y, _ = mc_gated_attention_fused(
                H,
                mask,
                GatedAttentionParams.from_model_params(params),
                num_samples,
                seed,
                model.feature_dropout,
                model.attention_dropout,
                interpret=jax.default_backend() != "tpu",
            )
            probs = jax.nn.softmax(y, axis=-1)
            return jnp.argmax(jnp.mean(probs, axis=0))

        return f

    from montecarlo_gated_mil_tpu.mcdo.sampling import mc_head

    @jax.jit
    def f(params, patches, mask, key):
        H = embed(params, patches, mask)
        out = mc_head(model, {"params": params}, H, mask, num_samples, key)
        probs = jax.nn.softmax(out.predictions, axis=-1)
        return jnp.argmax(jnp.mean(probs, axis=0))

    return f


def _with_last_flag(items):
    """Yield ``(item, is_last)`` with one item of lookahead, so the epoch-end
    optimizer flush (``net_utils.py:55-57``) fires for any iterable — a bare
    generator included — not just loaders with ``__len__``."""
    it = iter(items)
    try:
        prev = next(it)
    except StopIteration:
        return
    for item in it:
        yield prev, False
        prev = item
    yield prev, True


def train_epoch(
    step_fn,
    state: TrainState,
    loader: Iterable,
    *,
    epoch: int,
    accumulation_steps: int,
    key: jax.Array,
    metrics: Metrics | None = None,
    fold: int | None = None,
    sharded_step_fn=None,
    shard_over: int | None = None,
) -> TrainState:
    """One epoch of gradient-accumulated training (spec above).

    ``sharded_step_fn`` + ``shard_over``: OVERSIZED bags (bucket above
    ``shard_over``, the loader's ``oversized_bags='extend'`` output) train
    through the instance-sharded step
    (``train/state.py::make_train_step_sharded``) instead of embedding the
    whole extended bucket on one chip — the same routing the eval loops
    apply.  The two steps share the ``TrainState`` accumulator contract, so
    routing is per-bag and mid-accumulation-group safe."""
    running_loss = running_aux = correct = total = 0.0
    items = loader.epoch(epoch) if hasattr(loader, "epoch") else iter(loader)
    for batch_idx, ((bag, _rec), is_last) in enumerate(_with_last_flag(items)):
        k = jax.random.fold_in(jax.random.fold_in(key, epoch), batch_idx)
        do_update = ((batch_idx + 1) % accumulation_steps == 0) or is_last
        fn = step_fn
        if (
            sharded_step_fn is not None
            and _shard_mesh_for(bag.bucket, shard_over) is not None
        ):
            fn = sharded_step_fn
        else:
            _check_unrouted_train_bag(bag, shard_over)
        state, out = fn(state, bag, k, jnp.asarray(do_update))
        running_loss += float(out["loss"])
        running_aux += float(out["aux_loss"])
        correct += float(out["correct"])
        total += 1
    if total == 0:
        raise ValueError("empty training loader")
    m = (metrics or Metrics([])).scoped(fold)
    m.log("train/epoch_loss", running_loss / total, step=epoch)
    m.log("train/epoch_acc", correct / total, step=epoch)
    m.log("train/aux_loss", running_aux / total, step=epoch)
    print(
        f"Epoch {epoch} - Train Loss: {running_loss / total:.4f}, "
        f"Accuracy: {correct / total:.4f}"
    )
    return state


def train_epoch_dp(
    step_fn,
    apply_pending,
    state: TrainState,
    loader: Iterable,
    mesh,
    *,
    epoch: int,
    accumulation_steps: int,
    key: jax.Array,
    metrics: Metrics | None = None,
    fold: int | None = None,
    sharded_step_fn=None,
    shard_over: int | None = None,
) -> TrainState:
    """One epoch of data-parallel training over the device mesh.

    The SPMD twin of :func:`train_epoch` (BASELINE config 4; SURVEY.md §2
    parallelism item 3 — the reference is single-GPU bs=1 and has no
    counterpart): bags group per bucket into mesh-sized batches
    (``parallel.dp.BucketBatcher``, same policy as sharded eval), partial
    groups pad with zero-weight repeats, and one SPMD dispatch computes all
    B per-bag gradients with the ICI all-reduce placed by XLA.

    Per-bag dropout keys fold the bag's stream position exactly like the
    sequential loop, so each bag sees the same dropout draw under either
    path.  The optimizer updates once at least ``accumulation_steps`` real
    bags have accumulated (a mesh batch of B bags == B reference
    microbatches; effectively ``max(accumulation_steps, B)`` per update),
    and any remainder applies at epoch end via ``apply_pending``.
    """
    from montecarlo_gated_mil_tpu.parallel.dp import (
        BucketBatcher,
        pad_group_to_batch,
    )

    batch = int(mesh.shape["data"])
    running_loss = running_aux = correct = total = 0.0
    pending = 0  # real bags accumulated since the last optimizer update
    ekey = jax.random.fold_in(key, epoch)

    def flush(group, state, pending):
        bags = [b for b, _ in group]
        keys = [jax.random.fold_in(ekey, i) for _, i in group]
        stacked, keys, n_real = pad_group_to_batch(mesh, bags, keys)
        weights = jnp.asarray(
            [1.0] * n_real + [0.0] * (batch - n_real), jnp.float32
        )
        pending += n_real
        do_update = pending >= accumulation_steps
        state, out = step_fn(
            state, stacked, keys, weights, jnp.asarray(do_update)
        )
        if do_update:
            pending = 0
        return state, pending, out

    batcher = BucketBatcher(batch)
    items = loader.epoch(epoch) if hasattr(loader, "epoch") else iter(loader)
    for i, (bag, _rec) in enumerate(items):
        if (
            sharded_step_fn is not None
            and _shard_mesh_for(bag.bucket, shard_over) is not None
        ):
            # OVERSIZED bag: never enters the batcher (a mesh-sized group of
            # one extended bucket would pad batch-1 zero-weight repeats of a
            # huge bag); it trains instance-sharded over the same devices.
            # The sharded step shares the dp accumulator contract
            # (unscaled grad sums + acc_count; mean applied at update), so
            # interleaving with grouped dp steps is exact.
            pending += 1
            do_update = pending >= accumulation_steps
            state, out1 = sharded_step_fn(
                state, bag, jax.random.fold_in(ekey, i), jnp.asarray(do_update)
            )
            if do_update:
                pending = 0
            running_loss += float(out1["loss"])
            running_aux += float(out1["aux_loss"])
            correct += float(out1["correct"])
            total += 1
            continue
        _check_unrouted_train_bag(bag, shard_over)
        for group in batcher.add(bag, i):
            state, pending, out = flush(group, state, pending)
            running_loss += float(out["loss_sum"])
            running_aux += float(out["aux_sum"])
            correct += float(out["correct_sum"])
            total += float(out["count"])
    for group in batcher.drain():
        state, pending, out = flush(group, state, pending)
        running_loss += float(out["loss_sum"])
        running_aux += float(out["aux_sum"])
        correct += float(out["correct_sum"])
        total += float(out["count"])
    if pending > 0:  # epoch-end flush (reference net_utils.py:55-57)
        state = apply_pending(state)
    if total == 0:
        raise ValueError("empty training loader")
    m = (metrics or Metrics([])).scoped(fold)
    m.log("train/epoch_loss", running_loss / total, step=epoch)
    m.log("train/epoch_acc", correct / total, step=epoch)
    m.log("train/aux_loss", running_aux / total, step=epoch)
    print(
        f"Epoch {epoch} - Train Loss: {running_loss / total:.4f}, "
        f"Accuracy: {correct / total:.4f} (dp x{batch})"
    )
    return state


@functools.lru_cache(maxsize=8)
def _plain_step(model, optimizer):
    import optax

    from montecarlo_gated_mil_tpu.train.criteria import bce_on_probs

    @jax.jit
    def step(st, patches, mask, label, k):
        def loss_fn(params):
            y, _ = model.apply(
                {"params": params}, patches, mask, train=True, rngs={"dropout": k}
            )
            p = jax.nn.sigmoid(y)
            loss = bce_on_probs(p, jnp.full_like(p, label))
            return loss, p

        (loss, p), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        updates, new_opt = optimizer.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        correct = ((p[0] > 0.5).astype(jnp.int32) == label).astype(jnp.float32)
        new_st = TrainState(
            params=new_params, opt_state=new_opt, grad_acc=st.grad_acc,
            acc_count=st.acc_count, step=st.step + 1,
        )
        return new_st, loss, correct

    return step


def train_epoch_plain(
    model,
    state: TrainState,
    loader: Iterable,
    optimizer,
    *,
    epoch: int,
    key: jax.Array,
    metrics: Metrics | None = None,
) -> TrainState:
    """Plain per-batch training for the single-head model (spec:
    ``net_utils.py:6-30``): sigmoid outputs + BCE against the binary label,
    optimizer step every batch, prediction = P > 0.5.  Unused by the main
    entry points, provided for reference-API completeness."""
    step = _plain_step(model, optimizer)
    running_loss = correct = total = 0.0
    items = loader.epoch(epoch) if hasattr(loader, "epoch") else iter(loader)
    for i, (bag, _rec) in enumerate(items):
        k = jax.random.fold_in(jax.random.fold_in(key, epoch), i)
        state, loss, c = step(state, bag.patches, bag.mask, bag.label, k)
        running_loss += float(loss)
        correct += float(c)
        total += 1
    m = metrics or Metrics([])
    m.log("train/epoch_loss", running_loss / max(total, 1), step=epoch)
    m.log("train/epoch_acc", correct / max(total, 1), step=epoch)
    print(
        f"Epoch {epoch} - Train Loss: {running_loss / max(total, 1):.4f}, "
        f"Accuracy: {correct / max(total, 1):.4f}"
    )
    return state


def validate(
    model,
    params,
    loader: Iterable,
    criterion,
    *,
    epoch: int,
    metrics: Metrics | None = None,
    fold: int | None = None,
    shard_over: int | None = None,
) -> float:
    step = _det_step(model, criterion)
    running_loss = correct = total = 0.0
    items = loader.epoch(epoch) if hasattr(loader, "epoch") else iter(loader)
    for bag, _rec in items:
        if _shard_mesh_for(bag.bucket, shard_over) is not None:
            loss, pred = _det_step_sharded(model, criterion)(
                params, bag.patches, bag.mask, bag.label
            )
        else:
            loss, pred = step(params, bag.patches, bag.mask, bag.label)
        running_loss += float(loss)
        correct += float(pred == bag.label)
        total += 1
    epoch_loss = running_loss / max(total, 1)
    m = (metrics or Metrics([])).scoped(fold)
    m.log("val/epoch_loss", epoch_loss, step=epoch)
    m.log("val/epoch_acc", correct / max(total, 1), step=epoch)
    print(
        f"Epoch {epoch} - Val Loss: {epoch_loss:.4f}, "
        f"Accuracy: {correct / max(total, 1):.4f}"
    )
    return epoch_loss


def mc_validate(
    model,
    params,
    loader: Iterable,
    criterion,
    *,
    epoch: int,
    num_samples: int = 50,
    key: jax.Array,
    metrics: Metrics | None = None,
    fold: int | None = None,
    use_pallas: bool = False,
    shard_over: int | None = None,
) -> float:
    """MC validation (spec above).  ``use_pallas=True`` (TPU; both gate
    modes) runs the fused MC kernel — its custom VJP also makes this path
    gradient-capable; dropout masks come from the hardware PRNG, so losses
    are statistically equivalent but not bit-identical to the default.
    ``shard_over``: oversized bags route to the instance-sharded step."""
    pallas_on = _allow_pallas(model, use_pallas)
    step = _mc_val_step(model, criterion, num_samples, pallas_on)
    running_loss = running_aux = correct = total = 0.0
    warned_shard = False
    items = loader.epoch(epoch) if hasattr(loader, "epoch") else iter(loader)
    for i, (bag, _rec) in enumerate(items):
        k = jax.random.fold_in(jax.random.fold_in(key, epoch), i)
        if _shard_mesh_for(bag.bucket, shard_over) is not None:
            if pallas_on and not warned_shard:
                warned_shard = True
                warn_float_shard(use_pallas=True)
            loss, aux, pred = _mc_val_step_sharded(model, criterion, num_samples)(
                params, bag.patches, bag.mask, bag.label, k
            )
        else:
            loss, aux, pred = step(params, bag.patches, bag.mask, bag.label, k)
        running_loss += float(loss)
        running_aux += float(aux)
        correct += float(pred == bag.label)
        total += 1
    epoch_loss = running_loss / max(total, 1)
    m = (metrics or Metrics([])).scoped(fold)
    m.log("val/epoch_loss", epoch_loss, step=epoch)
    m.log("val/epoch_acc", correct / max(total, 1), step=epoch)
    m.log("val/aux_loss", running_aux / max(total, 1), step=epoch)
    print(
        f"Epoch {epoch} - Val Loss: {epoch_loss:.4f}, "
        f"Accuracy: {correct / max(total, 1):.4f}"
    )
    return epoch_loss


def _zero_criterion(logits, target):
    return jnp.asarray(0.0)


_ZERO_CRITERION = _zero_criterion


def _finish_test(all_targets, all_preds, metrics, fold, prefix="test"):
    from montecarlo_gated_mil_tpu.evaluation.report import classification_report

    acc = float(np.mean(np.asarray(all_preds) == np.asarray(all_targets)))
    # a Report: prints/logs as the sklearn text, carries .data for fold
    # aggregation of per-class precision/recall/F1.
    report = classification_report(all_targets, all_preds)
    m = metrics or Metrics([])
    if fold is None:
        m.log(f"{prefix}/accuracy", acc)
        m.log(f"{prefix}/classification_report", report)
    else:
        m.log(f"{prefix}/accuracy_fold{fold}", acc)
        m.log(f"{prefix}/classification_report_fold{fold}", report)
    print(f"Test Accuracy: {acc:.4f}")
    print("Classification Report:\n", report)
    return acc, report


def test(
    model,
    params,
    loader: Iterable,
    *,
    metrics: Metrics | None = None,
    fold: int | None = None,
    shard_over: int | None = None,
) -> tuple[float, str]:
    """Deterministic test pass (``net_utils.py:160-192``).

    ``shard_over``: bags whose bucket exceeds it (oversized bags the loader
    emitted under ``oversized_bags='extend'``) evaluate instance-sharded
    over all devices when a mesh is available (``parallel/instance.py``);
    on a single device they run whole."""
    step = _det_step(model, _ZERO_CRITERION)
    preds, targets = [], []
    items = loader.epoch(0) if hasattr(loader, "epoch") else iter(loader)
    for bag, _rec in items:
        if _shard_mesh_for(bag.bucket, shard_over) is not None:
            _, pred = _det_step_sharded(model, _ZERO_CRITERION)(
                params, bag.patches, bag.mask, bag.label
            )
        else:
            _, pred = step(params, bag.patches, bag.mask, bag.label)
        preds.append(int(pred))
        targets.append(int(bag.label))
    return _finish_test(targets, preds, metrics, fold)


def mc_test(
    model,
    params,
    loader: Iterable,
    *,
    num_samples: int = 50,
    key: jax.Array,
    metrics: Metrics | None = None,
    fold: int | None = None,
    use_pallas: bool = False,
    quantized: bool = False,
    shard_over: int | None = None,
) -> tuple[float, str]:
    """MC test pass: argmax of MC-mean softmax (``net_utils.py:195-230``).

    ``use_pallas=True`` (TPU; both gate modes) runs the fused MC
    kernel — 24x the vmap head; its dropout masks come from the hardware
    PRNG, so predictions are statistically equivalent but not bit-identical
    to the default path.  ``quantized=True`` embeds through the int8 PTQ
    path (ops/quantized.py).  ``shard_over``: oversized bags (bucket above
    it) evaluate instance-sharded over all devices when a mesh is available
    (float path — the Pallas/int8 single-chip variants don't apply there).
    """
    pallas_on = _allow_pallas(model, use_pallas)
    step = _mc_test_step(model, num_samples, pallas_on, quantized)
    preds, targets = [], []
    warned_shard = False
    items = loader.epoch(0) if hasattr(loader, "epoch") else iter(loader)
    for i, (bag, _rec) in enumerate(items):
        k = jax.random.fold_in(key, i)
        if _shard_mesh_for(bag.bucket, shard_over) is not None:
            if (quantized or pallas_on) and not warned_shard:
                warned_shard = True
                warn_float_shard(quantized=quantized, use_pallas=pallas_on)
            pred = _mc_test_step_sharded(model, num_samples)(
                params, bag.patches, bag.mask, k
            )
        else:
            pred = step(params, bag.patches, bag.mask, k)
        preds.append(int(pred))
        targets.append(int(bag.label))
    return _finish_test(targets, preds, metrics, fold)


def ensemble_mc_test(
    model,
    stacked_params,
    loader: Iterable,
    *,
    num_samples: int = 50,
    key: jax.Array,
    metrics: Metrics | None = None,
) -> tuple[float, "object"]:
    """MC test of a fold ensemble: argmax of the softmax mean pooled over
    all members' MC samples (``mc_test`` reduction semantics over M*T
    samples; beyond-reference — the reference only evaluates folds one at a
    time, ``/root/reference/cross_val_eval.py:100-138``).

    Runs the exact float head (no Pallas/int8 variants): this is an accuracy
    metric over the fixed shared test split, not a throughput path.
    """
    from montecarlo_gated_mil_tpu.mcdo.ensemble import ensemble_mc_inference

    @jax.jit
    def step(sp, patches, mask, k):
        out = ensemble_mc_inference(model, sp, patches, mask, num_samples, k)
        probs = jax.nn.softmax(out.predictions, axis=-1)
        return jnp.argmax(probs.mean(axis=0))

    preds, targets = [], []
    items = loader.epoch(0) if hasattr(loader, "epoch") else iter(loader)
    for i, (bag, _rec) in enumerate(items):
        pred = step(stacked_params, bag.patches, bag.mask, jax.random.fold_in(key, i))
        preds.append(int(pred))
        targets.append(int(bag.label))
    # 'ensemble_test/' keys: a shared Metrics stream must not conflate the
    # ensemble vote with a single-model 'test/accuracy'.
    return _finish_test(targets, preds, metrics, None, prefix="ensemble_test")
