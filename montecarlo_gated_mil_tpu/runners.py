"""End-to-end runners: single-split training, k-fold CV, CV re-evaluation.

Capability spec:

- ``run_training`` == ``/root/reference/main.py:22-108``: build everything,
  epoch loop of train+validate with early stopping, save the best params
  under a uuid name, rebuild + reload, final deterministic test.
- ``run_cross_validation`` == ``cross_validation.py:21-135``: per fold fresh
  loaders/model/optimizer/early-stopping, MC or plain validation and test by
  config flags, per-fold checkpoints, fold-prefixed metrics.
- ``run_cv_eval`` == ``cross_val_eval.py:37-163``: re-evaluate saved fold
  models, timing MC vs deterministic test, mean±std across folds.  The
  reference pulls run metadata from a private Neptune project; here a local
  JSON manifest written next to the checkpoints is the store.

Determinism: the reference reseeds four global RNGs per fold
(``cross_validation.py:91-95``); here every stochastic consumer gets an
explicit key derived from ``Config.seed`` via named streams (core/rng.py),
so fold runs are reproducible by construction.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.core import rng as rnglib
from montecarlo_gated_mil_tpu.core.config import Config, config_to_dict
from montecarlo_gated_mil_tpu.evaluation.report import (
    aggregate_classification_reports,
    aggregate_fold_accuracies,
)
from montecarlo_gated_mil_tpu.experiment import (
    build_criterion,
    build_model,
    build_optimizer,
    get_dataloaders,
    get_fold_dataloaders,
)
from montecarlo_gated_mil_tpu.train.loops import (
    mc_test,
    mc_validate,
    test,
    train_epoch,
    validate,
)


from montecarlo_gated_mil_tpu.train.state import (
    Checkpointer,
    EarlyStopping,
    TrainState,
    make_train_step,
    make_train_step_sharded,
)
from montecarlo_gated_mil_tpu.utils.metrics import Metrics


def _shard_over(cfg: Config) -> int:
    """Bags padded past the largest registry bucket are OVERSIZED (the
    loader's oversized_bags='extend' output); eval loops route them to the
    instance-sharded path when a mesh is available (train/loops.py)."""
    return max(cfg.tpu.buckets)


def _use_pallas(cfg: Config) -> bool:
    """Fused-kernel eligibility: enabled and on TPU (both gate modes —
    shared and separate per-class — have fused kernels)."""
    return cfg.tpu.use_pallas_attention and jax.default_backend() == "tpu"


def _mc_test(cfg: Config, model, params, loader, *, key, metrics, fold):
    """MC test dispatch: sharded over the device mesh when available
    (BASELINE config 5), else the sequential loop.

    The sharded branch requires a single controller: under multi-process
    fold fan-out each process evaluates *different* folds, so a global mesh
    over all processes' devices would issue mismatched SPMD programs; folds
    then evaluate sequentially on their own process instead.
    """
    quantized = cfg.tpu.quantized_inference and cfg.model in ("r18", "r34", "r50")
    if (
        cfg.tpu.data_parallel_eval
        and jax.process_count() == 1
        and jax.device_count() > 1
    ):
        from montecarlo_gated_mil_tpu.evaluation.dp_eval import mc_test_dp

        return mc_test_dp(
            model, params, loader, num_samples=cfg.N, key=key,
            metrics=metrics, fold=fold, quantized=quantized,
            shard_over=_shard_over(cfg),
        )
    return mc_test(
        model, params, loader, num_samples=cfg.N, key=key,
        metrics=metrics, fold=fold, use_pallas=_use_pallas(cfg),
        quantized=quantized, shard_over=_shard_over(cfg),
    )


def init_params(model, key: jax.Array):
    """Initialize parameters with a tiny dummy bag.

    Every layer is spatial-size agnostic (global average pool before the
    heads), so initializing at 64x64 yields byte-identical parameter shapes
    to 224x224 while compiling a much smaller init program.
    """
    dummy = jnp.zeros((8, 64, 64, 3), jnp.float32)
    mask = jnp.ones((8,), bool)
    variables = jax.jit(model.init, static_argnames=())(
        {"params": key, "dropout": key}, dummy, mask
    )
    return variables["params"]


def initial_params(cfg: Config, model, key: jax.Array):
    """Initial parameters for training: random heads, and — when
    ``cfg.backbone_weights`` points at a saved torch state_dict — the
    feature extractor replaced by the ported weights (the reference
    constructs its ResNet ImageNet-pretrained by default,
    ``/root/reference/model.py:41-50``; fine-tuning from pretrained features
    is the experiment it actually runs)."""
    params = init_params(model, key)
    if cfg.backbone_weights:
        from montecarlo_gated_mil_tpu.models.port import load_backbone_params

        feats = load_backbone_params(cfg.backbone_weights, cfg.model)
        params = dict(params)
        # tree-map against the initialized backbone so any structure or
        # shape mismatch fails loudly, and dtypes follow the param dtype.
        params["features"] = jax.tree.map(
            lambda like, v: jnp.asarray(v, like.dtype), params["features"], feats
        )
        print(f"Initialized backbone from {cfg.backbone_weights}")
    return params


def _fit(
    cfg: Config,
    model,
    data,
    metrics: Metrics,
    *,
    fold: int | None = None,
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
) -> tuple[TrainState, EarlyStopping]:
    """Shared epoch loop with early stopping (reference ``main.py:83-91`` /
    ``cross_validation.py:96-109``).

    With a ``checkpointer``, the full state (params, optimizer, epoch,
    early-stop) persists every ``cfg.tpu.checkpoint_every`` epochs and
    ``resume=True`` continues from the latest — a crash no longer loses the
    run (the reference keeps its best model only in RAM, SURVEY.md §5).
    """
    if cfg.tpu.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if cfg.tpu.debug_infs:
        jax.config.update("jax_debug_infs", True)
    params_key = rnglib.named_key(rnglib.root_key(cfg.seed), "params")
    if fold is not None:
        params_key = jax.random.fold_in(params_key, fold)
    criterion = build_criterion(cfg)
    # Epoch-unit scheduler decays need the optimizer steps one epoch
    # produces: step every grad_acc_steps bags plus the epoch-end flush
    # (train/loops.py), i.e. ceil(bags / k).  Iterable-only loaders fall
    # back to 1 (decays then count optimizer steps; documented in optim.py).
    n_train = len(data.train) if hasattr(data.train, "__len__") else None
    k = cfg.training_plan.parameters.grad_acc_steps
    steps_per_epoch = max(1, -(-n_train // k)) if n_train else 1
    optimizer = build_optimizer(cfg, steps_per_epoch)
    params = initial_params(cfg, model, params_key)
    state = TrainState.create(params, optimizer)
    # Data-parallel training (BASELINE config 4): one SPMD step per mesh-
    # sized group of same-bucket bags.  Single-controller only (like
    # _mc_test): under multi-process fold fan-out each process trains
    # different folds, so a global mesh would issue mismatched programs.
    use_dp = (
        cfg.tpu.data_parallel_train
        and jax.process_count() == 1
        and jax.device_count() > 1
    )
    # Oversized-bag training route (the training twin of the eval loops'
    # shard_over routing): bags padded past the largest bucket embed
    # instance-sharded over all local devices instead of whole on one chip.
    from montecarlo_gated_mil_tpu.train.loops import _instance_mesh

    inst_mesh = _instance_mesh()
    if use_dp:
        from montecarlo_gated_mil_tpu.parallel.dp import make_dp_train_step
        from montecarlo_gated_mil_tpu.parallel.mesh import make_mesh
        from montecarlo_gated_mil_tpu.train.loops import train_epoch_dp

        mesh = make_mesh()
        dp_step, dp_apply = make_dp_train_step(
            model, criterion, optimizer, mesh, donate=cfg.tpu.donate_buffers
        )
        sharded_step = (
            make_train_step_sharded(
                model, criterion, optimizer,
                cfg.training_plan.parameters.grad_acc_steps,
                inst_mesh, mean_scaling=True,
            )
            if inst_mesh is not None
            else None
        )
    else:
        step_fn = make_train_step(
            model, criterion, optimizer,
            cfg.training_plan.parameters.grad_acc_steps,
            use_pallas=cfg.tpu.use_pallas_train and _use_pallas(cfg),
            donate=cfg.tpu.donate_buffers,
        )
        sharded_step = (
            make_train_step_sharded(
                model, criterion, optimizer,
                cfg.training_plan.parameters.grad_acc_steps,
                inst_mesh, mean_scaling=False,
            )
            if inst_mesh is not None
            else None
        )
    stopper = EarlyStopping(cfg.training_plan.parameters.patience, metrics.scoped(fold))
    train_key = rnglib.named_key(rnglib.root_key(cfg.seed), "train-dropout")
    val_key = rnglib.named_key(rnglib.root_key(cfg.seed), "mc-val")
    start_epoch = 1
    if checkpointer is not None and checkpointer.latest_step() is not None:
        if resume:
            state, meta, best = checkpointer.restore(state)
            stopper.load_state_dict(meta["early_stop"])
            # Without this, a resumed run that never improves on the
            # pre-crash best_loss would fall back to final-epoch params at
            # save time.
            stopper.best_params = best
            start_epoch = int(meta["epoch"]) + 1
            print(f"Resumed from epoch {meta['epoch']} (next: {start_epoch})")
        elif cfg.tpu.checkpoint_every:
            # Fresh run into a directory holding a previous run's steps:
            # purge them, or orbax would skip every save of THIS run and a
            # later --resume would restore the stale run's weights.  Gated
            # on this run actually checkpointing: with checkpoint_every=0
            # nothing would be saved, so destroying the previous run's
            # resume state would gain nothing (review finding).
            print(f"Fresh run: purging stale checkpoints in {checkpointer.directory}")
            checkpointer.purge_steps()
    for epoch in range(start_epoch, cfg.training_plan.parameters.epochs + 1):
        if use_dp:
            state = train_epoch_dp(
                dp_step,
                dp_apply,
                state,
                data.train,
                mesh,
                epoch=epoch,
                accumulation_steps=cfg.training_plan.parameters.grad_acc_steps,
                key=train_key,
                metrics=metrics,
                fold=fold,
                sharded_step_fn=sharded_step,
                shard_over=_shard_over(cfg),
            )
        else:
            state = train_epoch(
                step_fn,
                state,
                data.train,
                epoch=epoch,
                accumulation_steps=cfg.training_plan.parameters.grad_acc_steps,
                key=train_key,
                metrics=metrics,
                fold=fold,
                sharded_step_fn=sharded_step,
                shard_over=_shard_over(cfg),
            )
        if cfg.is_mcdo_val:
            val_loss = mc_validate(
                model, state.params, data.val, criterion,
                epoch=epoch, num_samples=cfg.N, key=val_key,
                metrics=metrics, fold=fold, use_pallas=_use_pallas(cfg),
                shard_over=_shard_over(cfg),
            )
        else:
            val_loss = validate(
                model, state.params, data.val, criterion,
                epoch=epoch, metrics=metrics, fold=fold,
                shard_over=_shard_over(cfg),
            )
        stop = stopper(val_loss, state.params)
        every = cfg.tpu.checkpoint_every
        if checkpointer is not None and every and (epoch % every == 0 or stop):
            checkpointer.save(
                epoch, state, epoch=epoch, early_stop=stopper.state_dict(),
                best_params=stopper.best_params,
            )
        if stop:
            print(f"Early stopping at epoch {epoch}")
            break
    if checkpointer is not None:
        checkpointer.wait()  # drain any in-flight async save
    return state, stopper


def run_training(
    cfg: Config, metrics: Metrics | None = None, resume: bool = False
) -> dict:
    """Single-split train -> save best -> reload -> deterministic test."""
    metrics = metrics or Metrics()
    model = build_model(cfg)
    data = get_dataloaders(cfg)
    ckpt_state = Checkpointer(
        os.path.join(cfg.model_path, "train_state"),
        async_save=cfg.tpu.async_checkpointing,
    )
    state, stopper = _fit(
        cfg, model, data, metrics, checkpointer=ckpt_state, resume=resume
    )
    best = stopper.best_params if stopper.best_params is not None else state.params
    ckpt = Checkpointer(cfg.model_path)
    # model_id pins the saved-model name (the reference's config.yml:7 holds
    # exactly such a uuid hex); empty -> fresh uuid4 like main.py:92-94.
    name = cfg.model_id or uuid.uuid4().hex
    path = ckpt.save_params(name, best)
    metrics.log("best_model_path", path)
    # Rebuild + reload (exercises the restore path like main.py:97-105).
    model2 = build_model(cfg)
    params = ckpt.restore_params(name, best)
    acc, report = test(
        model2, params, data.test, metrics=metrics, shard_over=_shard_over(cfg)
    )
    return {"best_model_path": path, "test_accuracy": acc, "report": report}


def _load_cv_progress(model_path: str, my_folds: set) -> list[dict]:
    """Validated read of CV progress files for resume.

    Reads every ``cv_progress*.json`` (not just this process's suffix, so a
    crashed multi-process run can resume under a different topology), keeps
    entries that are well-formed, belong to this process's fold assignment,
    and whose checkpoint still exists; dedupes by fold (first file wins).
    A truncated/corrupt file — the crash window is mid-rewrite — is warned
    about and skipped rather than aborting the resume."""
    import glob

    entries: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(model_path, "cv_progress*.json"))):
        try:
            with open(path) as f:
                loaded = json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            print(f"ignoring unreadable CV progress file {path}: {e}")
            continue
        if not isinstance(loaded, list):
            print(f"ignoring malformed CV progress file {path}")
            continue
        for entry in loaded:
            fold = entry.get("fold") if isinstance(entry, dict) else None
            if (
                isinstance(fold, int)
                and fold - 1 in my_folds
                and fold not in entries
                and "accuracy" in entry
                and os.path.exists(str(entry.get("checkpoint", "")))
            ):
                entries[fold] = entry
    return [entries[f] for f in sorted(entries)]


def _write_cv_progress(progress_path: str, folds: list[dict]) -> None:
    """Atomic rewrite: the progress file must survive a crash landing
    mid-write (that crash window is the file's whole reason to exist)."""
    tmp = progress_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(folds, f, indent=2, default=str)
    os.replace(tmp, progress_path)


def run_cross_validation(
    cfg: Config, metrics: Metrics | None = None, resume: bool = False
) -> dict:
    """k-fold CV with per-fold checkpoints and a JSON manifest.

    Multi-process (multi-slice) execution fans the independent folds out
    round-robin over processes and merges accuracies with one DCN allgather
    (``parallel/distributed.py``); single-process runs all folds locally.

    Fold-level resume: completed folds are appended to an on-disk progress
    file as they finish, so a crashed run restarted with ``resume=True``
    (``cli cv --resume``) skips them.  Each fold's PRNG streams derive only
    from (seed, fold), never from loop position, so the remaining folds
    train identically to an uninterrupted run.  (The reference keeps no CV
    progress at all — a crash at fold k loses folds 1..k-1,
    ``/root/reference/cross_validation.py:57-114``.)
    """
    from montecarlo_gated_mil_tpu.parallel.distributed import (
        allgather_fold_accuracies,
        fold_assignment,
    )

    metrics = metrics or Metrics()
    ckpt = Checkpointer(cfg.model_path)
    test_key = rnglib.named_key(rnglib.root_key(cfg.seed), "mc-test")
    my_folds = fold_assignment(
        cfg.data.cv_folds, jax.process_index(), jax.process_count()
    )
    suffix = "" if jax.process_count() == 1 else f"_p{jax.process_index()}"
    progress_path = os.path.join(cfg.model_path, f"cv_progress{suffix}.json")
    folds = []
    if resume:
        folds = _load_cv_progress(cfg.model_path, set(my_folds))
        if folds:
            print(
                f"Resuming CV: folds {[f['fold'] for f in folds]} already done"
            )
    done = {entry["fold"] for entry in folds}
    for fold in my_folds:
        if fold + 1 in done:
            continue
        print(f"Fold {fold + 1}/{cfg.data.cv_folds}")
        model = build_model(cfg)
        data = get_fold_dataloaders(cfg, fold)
        # Per-fold epoch checkpointing: each fold gets its own directory so
        # tpu.checkpoint_every is honored under CV and --resume continues
        # MID-fold at the checkpointed epoch (fold PRNG streams derive only
        # from (seed, fold), so this composes with the fold-level resume
        # above).  The reference loses all of a fold's epochs to a crash
        # (/root/reference/cross_validation.py:96-114).
        fold_ckpt = Checkpointer(
            os.path.join(cfg.model_path, f"fold_{fold + 1}", "train_state"),
            async_save=cfg.tpu.async_checkpointing,
        )
        state, stopper = _fit(
            cfg, model, data, metrics, fold=fold + 1,
            checkpointer=fold_ckpt, resume=resume,
        )
        best = stopper.best_params if stopper.best_params is not None else state.params
        name = f"fold_{fold + 1}_{uuid.uuid4().hex}"
        path = ckpt.save_params(name, best)
        metrics.log(f"fold_{fold + 1}/best_model_path", path)
        if cfg.is_mcdo_test:
            acc, report = _mc_test(
                cfg, model, best, data.test,
                key=jax.random.fold_in(test_key, fold),
                metrics=metrics, fold=fold + 1,
            )
        else:
            acc, report = test(
                model, best, data.test, metrics=metrics, fold=fold + 1,
                shard_over=_shard_over(cfg),
            )
        folds.append({"fold": fold + 1, "checkpoint": path, "accuracy": acc})
        _write_cv_progress(progress_path, folds)
    folds.sort(key=lambda entry: entry["fold"])
    merged = allgather_fold_accuracies(
        [entry["fold"] - 1 for entry in folds],
        [entry["accuracy"] for entry in folds],
        cfg.data.cv_folds,
    )
    agg = aggregate_fold_accuracies([merged[f] for f in sorted(merged)])
    manifest = {
        "config": config_to_dict(cfg),
        "folds": folds,  # local folds (checkpoints live on this process)
        "all_fold_accuracies": {str(k + 1): v for k, v in sorted(merged.items())},
        "accuracy": agg,
    }
    manifest_path = os.path.join(cfg.model_path, f"cv_manifest{suffix}.json")
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    # The manifest supersedes progress.  Single-process runs also clear
    # stale per-process progress files (e.g. after resuming a crashed
    # multi-process run single-process); live multi-process runs only
    # remove their own to avoid racing sibling processes.
    import glob as _glob

    stale = (
        _glob.glob(os.path.join(cfg.model_path, "cv_progress*.json"))
        if jax.process_count() == 1
        else [progress_path]
    )
    for p in stale:
        if os.path.exists(p):
            os.remove(p)
    print(f"CV accuracy: {agg['mean']:.4f} ± {agg['std']:.4f}")
    return manifest


def load_cv_manifest(model_path: str, manifest_path: str | None = None) -> dict:
    """Load the CV manifest, merging per-process manifests when present.

    Multi-process fold fan-out writes ``cv_manifest_p{i}.json`` per process
    (each holding the folds whose checkpoints live on that process);
    re-evaluation needs every fold, so without an explicit path all
    ``cv_manifest*.json`` files merge into one fold list (the reference's
    equivalent store is the Neptune runs table holding all folds,
    ``/root/reference/cross_val_eval.py:60-67,92``).
    """
    import glob

    if manifest_path is not None:
        with open(manifest_path) as f:
            return json.load(f)
    single = os.path.join(model_path, "cv_manifest.json")
    per_proc = sorted(
        glob.glob(os.path.join(model_path, "cv_manifest_p*.json"))
    )
    if not per_proc and not os.path.exists(single):
        raise FileNotFoundError(f"no cv_manifest*.json under {model_path}")
    # A single-process manifest and a per-process set can coexist when the
    # same model_path hosted runs of both kinds: merging across generations
    # would pair duplicate fold numbers with mixed-generation checkpoints.
    # Use whichever generation is newer on disk — and SAY which was picked:
    # mtimes can be rewritten by a backup restore, so a wrong pick must at
    # least be diagnosable from the output.
    if os.path.exists(single) and (
        not per_proc
        or os.path.getmtime(single) >= max(map(os.path.getmtime, per_proc))
    ):
        if per_proc:
            print(
                f"Using single-process manifest {single} (newer on disk than "
                f"{len(per_proc)} per-process cv_manifest_p*.json; pass an "
                "explicit manifest_path if that is not the run you want)"
            )
        with open(single) as f:
            return json.load(f)
    if os.path.exists(single):
        print(
            f"Using {len(per_proc)} per-process manifests (newer on disk "
            f"than {single}; pass an explicit manifest_path to override)"
        )
    merged: dict | None = None
    for path in per_proc:
        with open(path) as f:
            part = json.load(f)
        if merged is None:
            merged = part
        else:
            merged["folds"] = merged.get("folds", []) + part.get("folds", [])
            merged.setdefault("all_fold_accuracies", {}).update(
                part.get("all_fold_accuracies", {})
            )
    seen = [e["fold"] for e in merged["folds"]]
    if len(seen) != len(set(seen)):
        raise ValueError(
            f"duplicate fold ids {sorted(seen)} across per-process manifests "
            f"under {model_path} — stale files from an earlier run? Pass an "
            "explicit manifest_path or clean the directory."
        )
    merged["folds"] = sorted(merged["folds"], key=lambda e: e["fold"])
    return merged


def run_cv_eval(
    cfg: Config,
    manifest_path: str | None = None,
    metrics: Metrics | None = None,
    ensemble: bool = False,
) -> dict:
    """Re-evaluate saved fold models: timed MC vs deterministic test.

    ``ensemble=True`` additionally scores the fold *ensemble* on the fixed
    shared test split (CV's test set is identical across folds by
    construction, ``data/splits.py``): all folds' checkpoints stack into one
    parameter pytree and their pooled M*T MC samples vote via the mc_test
    reduction — the standard deep-ensemble+MCDO upgrade the reference's
    one-fold-at-a-time evaluation cannot produce.
    """
    metrics = metrics or Metrics()
    manifest = load_cv_manifest(cfg.model_path, manifest_path)
    model = build_model(cfg)
    ckpt = Checkpointer(cfg.model_path)
    params_like = init_params(
        model, rnglib.named_key(rnglib.root_key(cfg.seed), "params")
    )
    test_key = rnglib.named_key(rnglib.root_key(cfg.seed), "cv-eval")
    mc_accs, det_accs, mc_reports, det_reports = [], [], [], []
    # Retained only for the ensemble vote: k full ResNet trees are ~0.5 GB
    # at r50 x 5 folds, so the plain eval path must not keep them live.
    fold_params: dict[int, object] = {}
    for entry in manifest["folds"]:
        fold = entry["fold"]
        data = get_fold_dataloaders(cfg, fold - 1)
        params = ckpt.restore_params(entry["checkpoint"], params_like)
        if ensemble:
            fold_params[fold] = params
        t0 = time.time()
        mc_acc, mc_report = _mc_test(
            cfg, model, params, data.test,
            key=jax.random.fold_in(test_key, fold), metrics=metrics, fold=fold,
        )
        mc_time = time.time() - t0
        t0 = time.time()
        det_acc, det_report = test(
            model, params, data.test, metrics=metrics, fold=fold,
            shard_over=_shard_over(cfg),
        )
        det_time = time.time() - t0
        print(
            f"fold {fold}: MC-ACC {mc_acc:.4f} ({mc_time:.2f}s)  "
            f"nMC-ACC {det_acc:.4f} ({det_time:.2f}s)"
        )
        mc_accs.append(mc_acc)
        det_accs.append(det_acc)
        mc_reports.append(mc_report.data)
        det_reports.append(det_report.data)
    # Fold-averaged per-class precision/recall/F1 (cross_val_eval.py:37-56).
    result = {
        "mc": aggregate_fold_accuracies(mc_accs),
        "deterministic": aggregate_fold_accuracies(det_accs),
        "mc_report": aggregate_classification_reports(mc_reports),
        "deterministic_report": aggregate_classification_reports(det_reports),
    }
    print(
        f"MC-ACC: {result['mc']['mean']:.4f} ± {result['mc']['std']:.4f}   "
        f"nMC-ACC: {result['deterministic']['mean']:.4f} ± "
        f"{result['deterministic']['std']:.4f}"
    )
    if ensemble:
        from montecarlo_gated_mil_tpu.mcdo.ensemble import stack_params
        from montecarlo_gated_mil_tpu.train.loops import ensemble_mc_test

        # members were restored in the fold loop above; stack in fold order
        stacked = stack_params([fold_params[f] for f in sorted(fold_params)])
        # the test split is fold-independent; any fold's loader serves
        data = get_fold_dataloaders(cfg, 0)
        ens_acc, ens_report = ensemble_mc_test(
            model, stacked, data.test, num_samples=cfg.N,
            key=rnglib.named_key(rnglib.root_key(cfg.seed), "ens-test"),
            metrics=metrics,
        )
        result["ensemble"] = {"accuracy": ens_acc}
        result["ensemble_report"] = ens_report.data
        print(f"ENS-ACC ({len(manifest['folds'])} folds x T={cfg.N}): "
              f"{ens_acc:.4f}")
    return result
