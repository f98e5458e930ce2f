"""Experiment assembly: Config -> model, criterion, optimizer, loaders.

The glue the reference spreads across ``main.py:56-81`` and
``utils.py:36-243`` — model/criterion/optimizer construction and the three
dataloaders for either a single split or one CV fold.  Data can come from
real DICOMs (when pydicom + a metadata pickle are available) or from the
synthetic generator (``data.synthetic``), selected by
``data.synthetic_count > 0``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import numpy as np

from montecarlo_gated_mil_tpu.core.bag import BucketSpec
from montecarlo_gated_mil_tpu.core.config import Config
from montecarlo_gated_mil_tpu.data import (
    BagLoader,
    PipelineConfig,
    class_weights,
    kfold_split,
    random_split,
    select_records,
    stratified_test_split,
    synthetic_records,
)
from montecarlo_gated_mil_tpu.data.records import BagRecord
from montecarlo_gated_mil_tpu.data.synthetic import make_synthetic_reader
from montecarlo_gated_mil_tpu.models import (
    GatedAttentionMIL,
    MultiHeadGatedAttentionMIL,
)
from montecarlo_gated_mil_tpu.train.criteria import make_criterion
from montecarlo_gated_mil_tpu.train.optim import make_optimizer

import jax.numpy as jnp


def build_model(cfg: Config, num_classes: int = 2) -> MultiHeadGatedAttentionMIL:
    """Flagship MH-GA-MIL from config (reference ``main.py:56-61``)."""
    return MultiHeadGatedAttentionMIL(
        num_classes=num_classes,
        backbone=cfg.model,
        feature_dropout=cfg.feature_dropout,
        attention_dropout=cfg.attention_dropout,
        shared_attention=cfg.shared_att,
        dtype=jnp.dtype(cfg.tpu.compute_dtype),
    )


def build_criterion(cfg: Config) -> Callable:
    return make_criterion(cfg.training_plan.criterion)


def build_optimizer(cfg: Config, steps_per_epoch: int = 1):
    """Optimizer from config.  ``steps_per_epoch`` (= ceil(train bags /
    grad_acc_steps)) places epoch-unit scheduler decays on epoch boundaries
    (torch StepLR semantics; see ``train/optim.py::make_schedule``)."""
    return make_optimizer(cfg.training_plan, steps_per_epoch)


@dataclass
class DataBundle:
    train: BagLoader
    val: BagLoader
    test: BagLoader
    records: list[BagRecord]


def print_class_counts(
    train_recs: list[BagRecord],
    val_recs: list[BagRecord],
    test_recs: list[BagRecord],
) -> dict[int, float]:
    """Per-set class count summary + inverse-frequency weights (reference
    ``print_class_counts``, ``/root/reference/utils.py:246-275``)."""
    from collections import Counter

    for name, recs in (("Train", train_recs), ("Validation", val_recs),
                       ("Test", test_recs)):
        counts = dict(sorted(Counter(r.class_name for r in recs).items()))
        print(f"  {name} set class counts: {counts}  (Total: {len(recs)})")
    weights, _ = class_weights(train_recs)
    return weights


def _pipeline_cfgs(cfg: Config) -> tuple[PipelineConfig, PipelineConfig]:
    from montecarlo_gated_mil_tpu.ops.patching import compute_tile_grid

    d = cfg.data
    spec = BucketSpec(cfg.tpu.buckets)
    train_grid = compute_tile_grid(d.H, d.W, d.patch_size, d.overlap_train)
    eval_grid = compute_tile_grid(d.H, d.W, d.patch_size, d.overlap_val_test)
    train_cfg = PipelineConfig(
        height=d.H, width=d.W, patch_size=d.patch_size, overlap=d.overlap_train,
        empty_threshold=d.empty_threshold, bag_size=d.bag_size_train,
        bucket=spec.bucket_for(train_grid.num_tiles), augment=True,
        dtype=cfg.tpu.compute_dtype,
    )
    eval_cfg = PipelineConfig(
        height=d.H, width=d.W, patch_size=d.patch_size, overlap=d.overlap_val_test,
        empty_threshold=d.empty_threshold, bag_size=d.bag_size_val_test,
        bucket=spec.bucket_for(eval_grid.num_tiles), augment=False,
        dtype=cfg.tpu.compute_dtype,
    )
    return train_cfg, eval_cfg


def load_records(cfg: Config) -> tuple[list[BagRecord], Callable]:
    """Records + pixel reader: synthetic when configured, else DICOM+pandas."""
    d = cfg.data
    if getattr(d, "synthetic_count", 0):
        recs = synthetic_records(d.synthetic_count, seed=cfg.seed)
        return recs, make_synthetic_reader(d.H, d.W)
    import pandas as pd

    df = pd.read_pickle(d.metadata_path)
    recs = select_records(df.to_dict("records"), list(d.view), d.multimodal)
    from montecarlo_gated_mil_tpu.data.dicom import HAVE_PYDICOM, make_dicom_reader

    if HAVE_PYDICOM:
        return recs, make_dicom_reader(d.root_path)
    # pydicom absent: the native C++ parser (native/dicom.cc) is the backend.
    from montecarlo_gated_mil_tpu.data.dicom_native import make_native_dicom_reader

    return recs, make_native_dicom_reader(d.root_path)


def _bundle(
    cfg: Config,
    recs: list[BagRecord],
    reader,
    train_idx: np.ndarray,
    val_idx: np.ndarray,
    test_idx: np.ndarray,
    weighted: bool,
) -> DataBundle:
    train_cfg, eval_cfg = _pipeline_cfgs(cfg)
    train_recs = [recs[i] for i in train_idx]
    print_class_counts(
        train_recs, [recs[i] for i in val_idx], [recs[i] for i in test_idx]
    )
    sample_w = None
    if weighted and train_recs:
        # Weights only; BagLoader redraws the with-replacement order every
        # epoch (reference WeightedRandomSampler, utils.py:217).
        _, sample_w = class_weights(train_recs)
    mm = cfg.data.multimodal and not getattr(cfg.data, "synthetic_count", 0)
    mk = lambda r, pc, **kw: BagLoader(  # noqa: E731
        r, reader, pc, multimodal=mm, seed=cfg.seed,
        oversized=cfg.tpu.oversized_bags,
        # The reference's DataLoader worker count (config.yml:43,
        # utils.py:99) maps to the loader's parallel-read pool.
        io_workers=max(1, cfg.training_plan.parameters.num_workers),
        **kw
    )
    # Adaptive buckets apply to eval too: sequential eval compiles one
    # program per bucket, and dp_eval groups bags per bucket before stacking.
    spec = BucketSpec(cfg.tpu.buckets) if cfg.tpu.adaptive_buckets else None
    return DataBundle(
        train=mk(train_recs, train_cfg, shuffle=True, sample_weights=sample_w,
                 bucket_spec=spec),
        val=mk([recs[i] for i in val_idx], eval_cfg, bucket_spec=spec),
        test=mk([recs[i] for i in test_idx], eval_cfg, bucket_spec=spec),
        records=recs,
    )


def get_dataloaders(cfg: Config) -> DataBundle:
    """Single random split (reference ``utils.get_dataloaders``)."""
    recs, reader = load_records(cfg)
    s = random_split(
        len(recs), cfg.data.fraction_train_rest, cfg.data.fraction_val_test, cfg.seed
    )
    return _bundle(cfg, recs, reader, s.train, s.val, s.test, weighted=False)


def get_fold_dataloaders(cfg: Config, fold: int) -> DataBundle:
    """Stratified test split + k-fold train/val (reference
    ``utils.get_fold_dataloaders``), with optional weighted sampling."""
    recs, reader = load_records(cfg)
    labels = [r.label for r in recs]
    train_val, test_idx = stratified_test_split(labels, cfg.data.fraction_test, cfg.seed)
    tr_rel, va_rel = kfold_split(len(train_val), cfg.data.cv_folds, fold, cfg.seed)
    return _bundle(
        cfg,
        recs,
        reader,
        train_val[tr_rel],
        train_val[va_rel],
        test_idx,
        weighted=cfg.training_plan.weighted_sampler,
    )
