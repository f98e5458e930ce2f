"""End-to-end runners on tiny synthetic data (CPU): train, CV, CV-eval,
inference figures, and the CLI wrapper."""

import json
import os

import numpy as np
import pytest

from montecarlo_gated_mil_tpu.core.config import Config, config_from_dict


def _tiny_config(tmp_path, **overrides) -> Config:
    raw = {
        "seed": 7,
        "model_path": str(tmp_path / "models"),
        "model": "r18",
        "is_MCDO-val": False,
        "is_MCDO-test": True,
        "N": 3,
        "feature_dropout": 0.1,
        "attention_dropout": 0.1,
        "shared_att": True,
        "data": {
            "H": 128,
            "W": 128,
            "patch_size": 64,
            "overlap_train": 0.0,
            "overlap_val_test": 0.0,
            "empty_threshold": 0.05,
            "cv_folds": 2,
            "fraction_test": 0.3,
            "fraction_train_rest": 0.6,
            "fraction_val_test": 0.5,
            "synthetic_count": 10,
        },
        "training_plan": {
            "weighted_sampler": True,
            "criterion": "ce",
            "optimizer": "sgd",
            "parameters": {
                "lr": 0.001,
                "wd": 0.0,
                "epochs": 2,
                "patience": 3,
                "grad_acc_steps": 2,
            },
        },
        "tpu": {"buckets": [8, 16], "compute_dtype": "float32"},
    }
    raw.update(overrides)
    os.makedirs(raw["model_path"], exist_ok=True)
    return config_from_dict(raw)


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    return _tiny_config(tmp_path_factory.mktemp("run"))


@pytest.mark.slow
def test_pretrained_backbone_wiring(tmp_path):
    """``backbone_weights`` initializes the feature extractor from a saved
    torch state_dict (reference builds its ResNet ImageNet-pretrained by
    default, model.py:41-50): the ported init carries the exact ported
    weights and yields a different initial val loss than random init."""
    import dataclasses

    import jax
    import numpy as np
    import torch

    from montecarlo_gated_mil_tpu.experiment import (
        build_criterion,
        build_model,
        get_dataloaders,
    )
    from montecarlo_gated_mil_tpu.models.port import port_backbone
    from montecarlo_gated_mil_tpu.runners import initial_params
    from montecarlo_gated_mil_tpu.train.loops import validate
    from tests.torch_ref import TorchMultiHeadGAMIL

    torch.manual_seed(0)
    tm = TorchMultiHeadGAMIL(backbone="r18", shared_attention=True)
    pth = tmp_path / "pretrained.pth"
    torch.save(tm.state_dict(), pth)

    cfg = _tiny_config(tmp_path, backbone_weights=str(pth))
    model = build_model(cfg)
    key = jax.random.key(0)
    ported = initial_params(cfg, model, key)
    rand = initial_params(dataclasses.replace(cfg, backbone_weights=""), model, key)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    expect = port_backbone(sd, "r18", prefix="feature_extractor.")
    np.testing.assert_array_equal(
        np.asarray(ported["features"]["conv1"]["kernel"]), expect["conv1"]["kernel"]
    )
    assert not np.array_equal(
        np.asarray(rand["features"]["conv1"]["kernel"]), expect["conv1"]["kernel"]
    )
    data = get_dataloaders(cfg)
    criterion = build_criterion(cfg)
    l_ported = validate(model, ported, data.val, criterion, epoch=0)
    l_rand = validate(model, rand, data.val, criterion, epoch=0)
    assert l_ported != pytest.approx(l_rand)


@pytest.mark.slow
def test_model_id_pins_saved_name(tmp_path):
    """A non-empty model_id (reference config.yml:7) names the saved best
    model instead of a fresh uuid."""
    cfg = _tiny_config(
        tmp_path,
        model_id="cafe0123deadbeef",
        training_plan={
            "weighted_sampler": False,
            "parameters": {"epochs": 1, "patience": 1, "grad_acc_steps": 1},
        },
    )
    from montecarlo_gated_mil_tpu.runners import run_training

    result = run_training(cfg)
    assert os.path.basename(result["best_model_path"]) == "cafe0123deadbeef"


@pytest.mark.slow
def test_run_training_end_to_end(tiny_cfg):
    from montecarlo_gated_mil_tpu.runners import run_training
    from montecarlo_gated_mil_tpu.utils.metrics import MemorySink, Metrics

    sink = MemorySink()
    result = run_training(tiny_cfg, Metrics([sink]))
    assert os.path.exists(result["best_model_path"])
    assert 0.0 <= result["test_accuracy"] <= 1.0
    assert "Negative" in result["report"] and "Positive" in result["report"]
    assert len(sink.values("train/epoch_loss")) == 2
    assert len(sink.values("val/epoch_loss")) == 2
    assert sink.values("test/accuracy") == [result["test_accuracy"]]


@pytest.mark.slow
def test_run_cross_validation_and_eval_and_infer(tiny_cfg, tmp_path):
    from montecarlo_gated_mil_tpu.runners import run_cross_validation, run_cv_eval
    from montecarlo_gated_mil_tpu.utils.metrics import MemorySink, Metrics

    sink = MemorySink()
    manifest = run_cross_validation(tiny_cfg, Metrics([sink]))
    assert len(manifest["folds"]) == 2
    for f in manifest["folds"]:
        assert os.path.exists(f["checkpoint"])
    assert 0.0 <= manifest["accuracy"]["mean"] <= 1.0
    # fold-prefixed metric names (reference schema)
    assert len(sink.values("1/train/epoch_loss")) == 2
    assert len(sink.values("2/val/epoch_loss")) == 2
    mpath = os.path.join(tiny_cfg.model_path, "cv_manifest.json")
    assert os.path.exists(mpath)
    with open(mpath) as f:
        loaded = json.load(f)
    assert loaded["folds"] == manifest["folds"]

    # CV re-evaluation from the manifest store (MC + deterministic +
    # pooled fold ensemble on the shared test split)
    result = run_cv_eval(tiny_cfg, mpath, Metrics([MemorySink()]), ensemble=True)
    assert len(result["mc"]["per_fold"]) == 2
    assert len(result["deterministic"]["per_fold"]) == 2
    assert 0.0 <= result["ensemble"]["accuracy"] <= 1.0
    assert {"Negative", "Positive"} <= set(result["ensemble_report"])
    # fold-averaged per-class P/R/F1 (cross_val_eval.py:37-56)
    for key in ("mc_report", "deterministic_report"):
        rep = result[key]
        for cls in ("Negative", "Positive"):
            assert {"precision", "recall", "f1-score"} <= set(rep[cls])
            assert 0.0 <= rep[cls]["f1-score"] <= 1.0

    # inference figures from the same manifest
    from montecarlo_gated_mil_tpu.viz.infer import run_inference

    out = run_inference(tiny_cfg, out_dir=str(tmp_path / "figs"), max_items=1)
    assert len(out) == 2  # one per fold
    for p in out:
        assert os.path.exists(p + ".png") and os.path.exists(p + ".pdf")
    # pooled fold-ensemble figures: one per item, under figures_ensemble/
    out_e = run_inference(
        tiny_cfg, out_dir=str(tmp_path / "figs"), max_items=1, ensemble=True
    )
    assert len(out_e) == 1 and "figures_ensemble" in out_e[0]
    assert os.path.exists(out_e[0] + ".png")


@pytest.mark.slow
def test_run_training_data_parallel(tmp_path):
    """``tpu.data_parallel_train`` drives the epoch through the SPMD dp step
    on the 8-device mesh from the normal runner entry (VERDICT r02 item 1);
    the 6-bag train split exercises a padded partial mesh group."""
    from montecarlo_gated_mil_tpu.runners import run_training
    from montecarlo_gated_mil_tpu.utils.metrics import MemorySink, Metrics

    cfg = _tiny_config(
        tmp_path, tpu={
            "buckets": [8, 16], "compute_dtype": "float32",
            "data_parallel_train": True,
        },
    )
    sink = MemorySink()
    result = run_training(cfg, Metrics([sink]))
    assert 0.0 <= result["test_accuracy"] <= 1.0
    losses = sink.values("train/epoch_loss")
    assert len(losses) == 2 and all(np.isfinite(v) for v in losses)
    assert len(sink.values("val/epoch_loss")) == 2


@pytest.mark.slow
def test_cli_train(tmp_path, capsys):
    import yaml

    from montecarlo_gated_mil_tpu.cli import main

    cfg = _tiny_config(tmp_path)
    from montecarlo_gated_mil_tpu.core.config import config_to_dict

    cfg_path = tmp_path / "config.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f)
    assert main(["train", "--config", str(cfg_path)]) == 0
    outp = capsys.readouterr().out
    assert "Test Accuracy" in outp


def test_load_cv_manifest_merges_per_process_files(tmp_path):
    """Multi-process CV writes cv_manifest_p{i}.json per process; cv-eval
    without an explicit path must see every fold (VERDICT r02 item 6)."""
    from montecarlo_gated_mil_tpu.runners import load_cv_manifest

    p0 = {
        "config": {"seed": 1},
        "folds": [
            {"fold": 1, "checkpoint": "/tmp/f1", "accuracy": 0.5},
            {"fold": 3, "checkpoint": "/tmp/f3", "accuracy": 0.7},
        ],
        "all_fold_accuracies": {"1": 0.5, "3": 0.7},
    }
    p1 = {
        "config": {"seed": 1},
        "folds": [{"fold": 2, "checkpoint": "/tmp/f2", "accuracy": 0.6}],
        "all_fold_accuracies": {"2": 0.6},
    }
    with open(tmp_path / "cv_manifest_p0.json", "w") as f:
        json.dump(p0, f)
    with open(tmp_path / "cv_manifest_p1.json", "w") as f:
        json.dump(p1, f)
    merged = load_cv_manifest(str(tmp_path))
    assert [e["fold"] for e in merged["folds"]] == [1, 2, 3]
    assert merged["all_fold_accuracies"] == {"1": 0.5, "2": 0.6, "3": 0.7}
    # explicit path: no merging, exactly that file
    single = load_cv_manifest(str(tmp_path), str(tmp_path / "cv_manifest_p1.json"))
    assert [e["fold"] for e in single["folds"]] == [2]
    with pytest.raises(FileNotFoundError):
        load_cv_manifest(str(tmp_path / "nope"))
    # a NEWER single-process manifest wins over stale per-process files
    # (mixing generations would pair duplicate folds with mixed checkpoints)
    fresh = {
        "config": {"seed": 2},
        "folds": [{"fold": 1, "checkpoint": "/tmp/new_f1", "accuracy": 0.9}],
        "all_fold_accuracies": {"1": 0.9},
    }
    with open(tmp_path / "cv_manifest.json", "w") as f:
        json.dump(fresh, f)
    got = load_cv_manifest(str(tmp_path))
    assert [e["checkpoint"] for e in got["folds"]] == ["/tmp/new_f1"]
    # newer per-process files win over a stale single-process manifest
    os.utime(tmp_path / "cv_manifest.json", (1, 1))
    got = load_cv_manifest(str(tmp_path))
    assert [e["fold"] for e in got["folds"]] == [1, 2, 3]
    # duplicate folds ACROSS per-process files = stale mix -> loud error
    os.remove(tmp_path / "cv_manifest.json")
    with open(tmp_path / "cv_manifest_p2.json", "w") as f:
        json.dump(p1, f)
    with pytest.raises(ValueError, match="duplicate fold"):
        load_cv_manifest(str(tmp_path))


def test_cli_rejects_missing_command():
    from montecarlo_gated_mil_tpu.cli import main

    with pytest.raises(SystemExit):
        main([])
    with pytest.raises(SystemExit):
        main(["train"])  # missing --config


@pytest.mark.slow
def test_cv_resume_skips_completed_folds(tmp_path):
    """A crashed CV run resumes from its progress file: completed folds are
    skipped (their checkpoints and accuracies reused) and the final manifest
    matches an uninterrupted run, because per-fold PRNG streams derive from
    (seed, fold) only.  The progress file is superseded by the manifest."""
    from montecarlo_gated_mil_tpu.runners import run_cross_validation

    cfg_full = _tiny_config(tmp_path / "full")
    full = run_cross_validation(cfg_full)

    cfg = _tiny_config(tmp_path / "resumed")
    # Simulate a run that crashed after fold 1: a completed run's fold-1
    # entry becomes the progress file, its manifest is deleted.
    first = run_cross_validation(cfg)
    progress = [first["folds"][0]]
    os.remove(os.path.join(cfg.model_path, "cv_manifest.json"))
    with open(os.path.join(cfg.model_path, "cv_progress.json"), "w") as f:
        json.dump(progress, f)

    resumed = run_cross_validation(cfg, resume=True)
    # fold 1 reused (same checkpoint path), fold 2 retrained
    assert resumed["folds"][0]["checkpoint"] == progress[0]["checkpoint"]
    assert resumed["folds"][1]["fold"] == 2
    # identical accuracies to the uninterrupted run (fold-stateless PRNG)
    assert [f["accuracy"] for f in resumed["folds"]] == [
        f["accuracy"] for f in full["folds"]
    ]
    assert resumed["accuracy"] == full["accuracy"]
    assert not os.path.exists(os.path.join(cfg.model_path, "cv_progress.json"))
    # progress entries whose checkpoints vanished are retrained, not trusted
    with open(os.path.join(cfg.model_path, "cv_progress.json"), "w") as f:
        json.dump([{"fold": 1, "checkpoint": "/nope/gone", "accuracy": 0.1}], f)
    again = run_cross_validation(cfg, resume=True)
    assert again["folds"][0]["checkpoint"] != "/nope/gone"
    assert [f["accuracy"] for f in again["folds"]] == [
        f["accuracy"] for f in full["folds"]
    ]


def test_cv_progress_load_is_validated(tmp_path):
    """Resume must survive the crash it exists for: corrupt/truncated
    progress files are skipped with a warning, entries outside the fold
    assignment or with missing checkpoints are dropped, per-process files
    merge (topology change), duplicates dedupe first-file-wins, and the
    rewrite is atomic (no .tmp left behind)."""
    from montecarlo_gated_mil_tpu.runners import (
        _load_cv_progress,
        _write_cv_progress,
    )

    ck = tmp_path / "ck1"
    ck.write_text("x")
    good = {"fold": 1, "checkpoint": str(ck), "accuracy": 0.5}
    # atomic write
    path = str(tmp_path / "cv_progress.json")
    _write_cv_progress(path, [good])
    assert not os.path.exists(path + ".tmp")
    assert _load_cv_progress(str(tmp_path), {0, 1}) == [good]
    # truncated file (the mid-write crash) is skipped, not fatal
    with open(tmp_path / "cv_progress_p1.json", "w") as f:
        f.write('[{"fold": 2, "check')
    assert _load_cv_progress(str(tmp_path), {0, 1}) == [good]
    # out-of-assignment folds, missing checkpoints, malformed entries drop
    bad = [
        {"fold": 9, "checkpoint": str(ck), "accuracy": 0.5},   # not assigned
        {"fold": 2, "checkpoint": "/nope", "accuracy": 0.5},   # gone
        {"fold": "x", "checkpoint": str(ck), "accuracy": 0.5}, # malformed
        {"fold": 2, "checkpoint": str(ck)},                    # no accuracy
    ]
    _write_cv_progress(str(tmp_path / "cv_progress_p1.json"), bad)
    assert _load_cv_progress(str(tmp_path), {0, 1, 2}) == [good]
    # multi-process progress merges under a single-process resume; duplicate
    # folds dedupe with the first (sorted-path) file winning
    dup = {"fold": 1, "checkpoint": str(ck), "accuracy": 0.9}
    ck2 = tmp_path / "ck2"
    ck2.write_text("y")
    other = {"fold": 2, "checkpoint": str(ck2), "accuracy": 0.7}
    _write_cv_progress(str(tmp_path / "cv_progress_p1.json"), [dup, other])
    merged = _load_cv_progress(str(tmp_path), {0, 1})
    assert merged == [good, other]  # cv_progress.json sorts before _p1


@pytest.mark.slow
def test_fresh_run_over_stale_checkpoints_persists(tmp_path):
    """A second run (resume=False) into a model_path a previous run
    checkpointed must purge the stale steps and persist its OWN state —
    orbax silently skips saves onto existing steps, so without the purge a
    later --resume would restore the first run's weights (round-4 review
    finding).  Checkpointer.save now raises on a skipped save, so this test
    fails loudly if the purge path regresses."""
    cfg = _tiny_config(
        tmp_path,
        training_plan={
            "weighted_sampler": False,
            "parameters": {"epochs": 2, "patience": 3, "grad_acc_steps": 1},
        },
    )
    from montecarlo_gated_mil_tpu.runners import run_training
    from montecarlo_gated_mil_tpu.train import Checkpointer

    run_training(cfg)
    cfg2 = _tiny_config(tmp_path, seed=8)  # same model_path, new run
    run_training(cfg2)  # raises without the _fit purge
    ckpt = Checkpointer(os.path.join(cfg.model_path, "train_state"))
    assert ckpt.latest_step() is not None  # the second run's state persisted
    ckpt.close()


@pytest.mark.slow
def test_no_purge_when_run_never_checkpoints(tmp_path):
    """checkpoint_every=0 (best-only) fresh runs must NOT destroy a
    previous run's resume state: purging gains nothing when this run will
    never save a step (review finding)."""
    cfg = _tiny_config(
        tmp_path,
        training_plan={
            "weighted_sampler": False,
            "parameters": {"epochs": 1, "patience": 2, "grad_acc_steps": 1},
        },
    )
    from montecarlo_gated_mil_tpu.runners import run_training
    from montecarlo_gated_mil_tpu.train import Checkpointer

    run_training(cfg)  # leaves train_state steps (checkpoint_every=1 default)
    ckpt = Checkpointer(os.path.join(cfg.model_path, "train_state"))
    steps_before = ckpt.latest_step()
    assert steps_before is not None
    ckpt.close()
    cfg0 = _tiny_config(tmp_path, seed=9, tpu={"buckets": [8, 16],
                                               "checkpoint_every": 0})
    run_training(cfg0)  # best-only run: must leave run A's steps alone
    ckpt = Checkpointer(os.path.join(cfg.model_path, "train_state"))
    assert ckpt.latest_step() == steps_before
    ckpt.close()
