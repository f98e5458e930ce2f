"""Train state, gradient accumulation, early stopping, checkpointing.

Capability spec:

- Gradient accumulation: loss divided by the static ``accumulation_steps``,
  optimizer stepped every k batches *and* at epoch end
  (``/root/reference/net_utils.py:52-57``).  Implemented as an on-device
  gradient accumulator inside a single jitted step (no host round trip).
- Early stopping: counter initialized to patience, reset on improvement,
  decremented otherwise, stop at zero; best parameters retained
  (``net_utils.py:232-261``).
- Checkpointing: the reference keeps the best state only in RAM until one
  final ``torch.save`` (``main.py:92-94``) and can never resume.  Here Orbax
  persists (params, opt_state, epoch, early-stop state, PRNG key) and
  training resumes exactly (SURVEY.md §5 auxiliary-subsystem requirement).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from montecarlo_gated_mil_tpu.core.bag import Bag

Array = jax.Array
Params = Any


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TrainState:
    """Pure pytree carried through the jitted train step."""

    params: Params
    opt_state: optax.OptState
    grad_acc: Params  # summed (already 1/k-scaled) gradients
    acc_count: Array  # int32 number of accumulated microbatches
    step: Array  # int32 optimizer step count

    @staticmethod
    def create(params: Params, optimizer: optax.GradientTransformation) -> "TrainState":
        return TrainState(
            params=params,
            opt_state=optimizer.init(params),
            grad_acc=jax.tree.map(jnp.zeros_like, params),
            acc_count=jnp.asarray(0, jnp.int32),
            step=jnp.asarray(0, jnp.int32),
        )


def make_train_step(
    model,
    criterion: Callable[[Array, Array], Array],
    optimizer: optax.GradientTransformation,
    accumulation_steps: int,
    use_pallas: bool = False,
    donate: bool = False,
):
    """Build the jitted one-bag training step.

    ``donate=True`` (``tpu.donate_buffers`` via the runners) donates the
    incoming ``TrainState``'s buffers to the step so XLA reuses them
    in place instead of holding input and output states live at once
    (params + opt_state + grad accumulator ~3x params HBM for Adam).
    Callers must then treat the passed state as consumed — the epoch
    loops do, and ``EarlyStopping`` copies the params it stashes.
    Default off: bare API users (tests, tools) reuse states freely.

    The returned function ``step(state, bag, key, do_update)`` computes
    CE(+aux) loss and gradients for one bag, adds ``grads / k`` to the
    accumulator, and — when ``do_update`` is true (every k-th microbatch or
    at epoch end, decided by the host loop) — applies the summed gradients
    and resets the accumulator.  Matches the reference's ``loss /= k; step
    every k or at epoch end`` exactly, including the partial final group.

    ``use_pallas=True`` runs the gated-attention head (forward AND backward)
    through the fused Pallas kernel at T=1 — its custom VJP replays the
    hardware-PRNG dropout masks by re-seeding (ops/gated_attention.py), so
    the whole loss is differentiable end to end; dropout draws then come
    from the hardware PRNG, statistically equivalent but not bit-identical
    to the jnp path (gradient parity at dropout 0 is pinned in
    tests/test_train.py).  The embed backward (where ~95% of the step's
    FLOPs live) is XLA either way, so the measured end-to-end win is small —
    see docs/PERFORMANCE.md §train-step audit for the numbers behind the
    ``tpu.use_pallas_train`` default.
    """

    if use_pallas and jax.default_backend() != "tpu" and (
        model.feature_dropout != 0.0 or model.attention_dropout != 0.0
    ):
        # Off-TPU the fused kernel runs interpreted and only its
        # deterministic path (the hardware PRNG has no CPU lowering) — fall
        # back to the jnp head instead of crashing with an opaque
        # NotImplementedError, the same guard train/loops._allow_pallas
        # applies to the eval steps.  Here rather than at the runners call
        # site so every caller (tests, tools, direct API use) is covered.
        use_pallas = False

    if use_pallas:
        from montecarlo_gated_mil_tpu.models.gamil import auxiliary_loss
        from montecarlo_gated_mil_tpu.ops.gated_attention import (
            GatedAttentionParams,
            mc_gated_attention_fused,
        )

        interpret = jax.default_backend() != "tpu"

        def loss_fn(params, bag: Bag, key):
            H = model.apply(
                {"params": params}, bag.patches, bag.mask, method="embed"
            )
            seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
            y, a = mc_gated_attention_fused(
                H,
                bag.mask,
                GatedAttentionParams.from_model_params(params),
                1,
                seed,
                model.feature_dropout,
                model.attention_dropout,
                interpret=interpret,
            )
            y0, a0 = y[0], a[0]
            aux = model.aux_scale * auxiliary_loss(
                a0[1], a0[0], bag.label == 1,
                loss_type=model.aux_loss_type, margin=model.aux_margin,
            )
            loss = criterion(y0[None, :], bag.label[None]) + aux
            correct = (jnp.argmax(y0) == bag.label).astype(jnp.float32)
            return loss / accumulation_steps, (loss, aux, correct)

    else:

        def loss_fn(params, bag: Bag, key):
            y, _, aux = model.apply(
                {"params": params},
                bag.patches,
                bag.mask,
                bag.label,
                train=True,
                rngs={"dropout": key},
            )
            loss = criterion(y[None, :], bag.label[None]) + aux
            correct = (jnp.argmax(y) == bag.label).astype(jnp.float32)
            return loss / accumulation_steps, (loss, aux, correct)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, bag: Bag, key: Array, do_update: Array):
        grads, (loss, aux, correct) = jax.grad(loss_fn, has_aux=True)(
            state.params, bag, key
        )
        grad_acc = jax.tree.map(jnp.add, state.grad_acc, grads)
        acc_count = state.acc_count + 1

        def apply(_):
            updates, new_opt = optimizer.update(grad_acc, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(
                params=new_params,
                opt_state=new_opt,
                grad_acc=jax.tree.map(jnp.zeros_like, grad_acc),
                acc_count=jnp.asarray(0, jnp.int32),
                step=state.step + 1,
            )

        def hold(_):
            return replace(state, grad_acc=grad_acc, acc_count=acc_count)

        new_state = jax.lax.cond(do_update, apply, hold, None)
        return new_state, {"loss": loss, "aux_loss": aux, "correct": correct}

    return step


def make_train_step_sharded(
    model,
    criterion: Callable[[Array, Array], Array],
    optimizer: optax.GradientTransformation,
    accumulation_steps: int,
    mesh,
    *,
    mean_scaling: bool = False,
):
    """Instance-sharded training step for OVERSIZED bags (training twin of
    the eval routing in ``train/loops.py::_shard_mesh_for``).

    A bag whose tile count exceeds the largest registry bucket arrives as an
    extended bucket (``BucketSpec.extended_bucket``); embedding it whole on
    one chip is the training-path HBM cliff VERDICT r04 flagged.  Here the
    embed — ~97% of the step's FLOPs and all of its activation memory —
    runs under ``shard_map`` with the instance axis split over ``mesh``'s
    ``inst`` axis (per-bag BN statistics ``psum`` across shards,
    ``parallel/instance.py::sharded_embed_grad``), and the tiny head runs
    on the gathered ``(N, L)`` features with the SAME dropout key structure
    as the sequential step, so dropout draws are identical.

    Accumulator contract matches the host loop that drives it:

    - ``mean_scaling=False`` (sequential ``train_epoch``): loss is divided
      by the static ``accumulation_steps`` and the update applies the
      accumulated sum — interchangeable mid-epoch with
      :func:`make_train_step`'s state.
    - ``mean_scaling=True`` (``train_epoch_dp``): raw-loss gradients are
      summed and ``acc_count`` counts bags; the update applies the mean —
      interchangeable with ``parallel/dp.py::make_dp_train_step``'s state.

    No buffer donation: the step is the rare path and its output shardings
    follow GSPMD propagation from the mesh, where donation would be
    silently dropped anyway.
    """
    from montecarlo_gated_mil_tpu.models.gamil import auxiliary_loss
    from montecarlo_gated_mil_tpu.parallel.instance import sharded_embed_grad

    def loss_fn(params, bag: Bag, key):
        H = sharded_embed_grad(
            model, params["features"], bag.patches, bag.mask, mesh
        )
        y, a = model.apply(
            {"params": params},
            H,
            bag.mask,
            train=True,
            method="head",
            rngs={"dropout": key},
        )
        aux = model.aux_scale * auxiliary_loss(
            a[1], a[0], bag.label == 1,
            loss_type=model.aux_loss_type, margin=model.aux_margin,
        )
        loss = criterion(y[None, :], bag.label[None]) + aux
        correct = (jnp.argmax(y) == bag.label).astype(jnp.float32)
        scale = 1.0 if mean_scaling else 1.0 / accumulation_steps
        return loss * scale, (loss, aux, correct)

    @jax.jit
    def step(state: TrainState, bag: Bag, key: Array, do_update: Array):
        grads, (loss, aux, correct) = jax.grad(loss_fn, has_aux=True)(
            state.params, bag, key
        )
        grad_acc = jax.tree.map(jnp.add, state.grad_acc, grads)
        acc_count = state.acc_count + 1

        def apply(_):
            if mean_scaling:
                denom = jnp.maximum(acc_count, 1).astype(jnp.float32)
                eff = jax.tree.map(lambda g: g / denom, grad_acc)
            else:
                eff = grad_acc
            updates, new_opt = optimizer.update(eff, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(
                params=new_params,
                opt_state=new_opt,
                grad_acc=jax.tree.map(jnp.zeros_like, grad_acc),
                acc_count=jnp.asarray(0, jnp.int32),
                step=state.step + 1,
            )

        def hold(_):
            return replace(state, grad_acc=grad_acc, acc_count=acc_count)

        new_state = jax.lax.cond(do_update, apply, hold, None)
        return new_state, {"loss": loss, "aux_loss": aux, "correct": correct}

    return step


class EarlyStopping:
    """Reference-semantics early stopping (``net_utils.py:232-261``)."""

    def __init__(self, patience: int = 5, metrics=None):
        self.patience = patience
        self.counter = patience
        self.best_loss = float("inf")
        self.best_params = None
        self.metrics = metrics

    def __call__(self, current_loss: float, params) -> bool:
        if current_loss < self.best_loss:
            self.best_loss = current_loss
            self.counter = self.patience
            # COPY, do not alias: the train steps donate their TrainState
            # buffers (tpu.donate_buffers), so holding a reference to the
            # live params would leave best_params pointing at deleted
            # device memory after the next step.  (CPU ignores donation,
            # which is why only real-hardware runs would have caught this.)
            self.best_params = jax.tree.map(
                lambda x: x.copy() if hasattr(x, "copy") else x, params
            )
        else:
            self.counter -= 1
        if self.metrics is not None:
            self.metrics.log("val/patience_counter", self.counter)
        return self.counter <= 0

    def state_dict(self) -> dict:
        return {
            "patience": self.patience,
            "counter": self.counter,
            "best_loss": self.best_loss,
        }

    def load_state_dict(self, d: dict):
        self.patience = int(d["patience"])
        self.counter = int(d["counter"])
        self.best_loss = float(d["best_loss"])


class Checkpointer:
    """Orbax-backed save/restore of the full training state.

    ``async_save=True`` lets Orbax write in the background so the epoch
    loop never blocks on checkpoint IO (useful for long CV sweeps);
    ``wait()``/``close()``/``latest_step()``/``restore()`` synchronize.

    Under multi-process fold fan-out (``parallel/distributed.py``) each
    process trains DIFFERENT folds, so checkpoints are process-local:
    Orbax's default cross-process barriers would pair unrelated saves
    (or deadlock outright when processes run unequal fold counts).  With
    ``jax.process_count() > 1`` the manager is therefore restricted to
    this process alone (``active_processes={index}``); params under the
    fan-out live wholly on local devices, so no cross-process array
    gather is ever needed at save time.
    """

    def __init__(self, directory: str, *, async_save: bool = False):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.async_save = async_save
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mp_options = None
        options = None
        if jax.process_count() > 1:
            idx = jax.process_index()
            self._mp_options = ocp.options.MultiprocessingOptions(
                primary_host=idx,
                active_processes={idx},
                barrier_sync_key_prefix=f"foldproc{idx}",
            )
            options = ocp.CheckpointManagerOptions(
                multiprocessing_options=self._mp_options,
                # orbax refuses create=True with active_processes; the
                # makedirs above already created the root.
                create=False,
                # async directory creation signals through the GLOBAL
                # distributed KV store (ignores active_processes) and
                # deadlocks when sibling processes save different steps.
                async_options=ocp.options.AsyncOptions(
                    create_directories_asynchronously=False
                ),
            )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def _standard_checkpointer(self):
        """StandardCheckpointer with the same process-locality as the
        manager (its default barriers span all processes)."""
        if self._mp_options is None:
            return self._ocp.StandardCheckpointer()
        return self._ocp.StandardCheckpointer(
            multiprocessing_options=self._mp_options,
            async_options=self._ocp.options.AsyncOptions(
                create_directories_asynchronously=False
            ),
        )

    def _to_host(self, tree):
        """Process-local mode: orbax refuses host-local jax.Arrays when
        jax.process_count() > 1 (it assumes global arrays); fold-fan-out
        states live wholly on this process's devices, so they serialize as
        numpy instead.  Identity in single-process mode."""
        if self._mp_options is None:
            return tree
        import numpy as np

        return jax.tree.map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
        )

    def save(
        self,
        step: int,
        state: TrainState,
        *,
        epoch: int,
        early_stop: dict | None = None,
        extra: dict | None = None,
        best_params=None,
    ):
        """Persist the full state.  ``best_params`` (the early-stopper's
        best-so-far pytree) rides along as its own composite item: without
        it a resumed run that never beats the pre-crash best loss would
        silently save the *final*-epoch params as "best", violating the
        reference's save-best semantics
        (``/root/reference/net_utils.py:240-256``, ``main.py:92-94``)."""
        meta = {
            "epoch": epoch,
            "early_stop": early_stop or {},
            "extra": extra or {},
            "has_best": best_params is not None,
        }
        items = dict(
            state=self._ocp.args.StandardSave(self._to_host(state)),
            meta=self._ocp.args.JsonSave(meta),
        )
        if best_params is not None:
            items["best"] = self._ocp.args.StandardSave(
                self._to_host(best_params)
            )
        saved = self._mgr.save(step, args=self._ocp.args.Composite(**items))
        if not saved:
            # Orbax SILENTLY skips a save onto an existing step (returns
            # False) — e.g. a fresh run writing into a directory a previous
            # run checkpointed.  Persisting nothing while training continues
            # would make a later resume restore the STALE run's weights;
            # fail loudly instead (fresh runs purge via purge_steps()).
            raise RuntimeError(
                f"checkpoint save skipped: step {step} already exists in "
                f"{self.directory} (left by a previous run?). Resume it, "
                "purge_steps(), or use a fresh directory."
            )
        if not self.async_save:
            self._mgr.wait_until_finished()

    def wait(self):
        """Block until any in-flight async save completes."""
        self._mgr.wait_until_finished()

    def purge_steps(self) -> None:
        """Delete every checkpointed step in the directory.

        A FRESH run (resume=False) writing into a directory a previous run
        checkpointed must call this first: orbax's ``save`` silently skips
        steps that already exist, so the new run's state would never
        persist and ``--resume`` after a crash would restore the previous
        run's weights."""
        self._mgr.wait_until_finished()
        for step in list(self._mgr.all_steps()):
            self._mgr.delete(step)

    def latest_step(self) -> int | None:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, step: int | None = None):
        """Returns ``(state, meta, best_params)``; ``best_params`` is None
        for checkpoints written without one (meta says which via
        ``has_best``, so old checkpoints restore cleanly)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        meta = self._mgr.restore(
            step, args=self._ocp.args.Composite(meta=self._ocp.args.JsonRestore())
        )["meta"]
        state_like = self._to_host(state_like)
        items = dict(state=self._ocp.args.StandardRestore(state_like))
        if meta.get("has_best"):
            items["best"] = self._ocp.args.StandardRestore(state_like.params)
        restored = self._mgr.restore(step, args=self._ocp.args.Composite(**items))
        return restored["state"], meta, restored.get("best")

    def save_params(self, name: str, params) -> str:
        """Save parameters only (the reference's best-model ``torch.save``,
        ``main.py:92-94``) under ``directory/name``.  ``force=True``:
        a pinned ``model_id`` name legitimately re-saves after a resumed
        run (the reference's torch.save overwrites too)."""
        path = os.path.join(self.directory, name)
        ckpt = self._standard_checkpointer()
        ckpt.save(path, self._to_host(params), force=True)
        ckpt.wait_until_finished()
        return path

    def restore_params(self, name_or_path: str, params_like):
        path = (
            name_or_path
            if os.path.isabs(name_or_path)
            else os.path.join(self.directory, name_or_path)
        )
        ckpt = self._standard_checkpointer()
        return ckpt.restore(path, target=self._to_host(params_like))

    def close(self):
        self._mgr.close()
