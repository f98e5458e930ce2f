"""MCDO inference + uncertainty-figure generation (infer entry point).

Capability spec (``/root/reference/infer.py:111-239``): for each saved fold
model and test item, run T-sample MC inference, reconstruct per-class
attention maps at full resolution, reduce to mean/std maps over samples, and
render the five-panel uncertainty figure.  The reference fetches run
metadata from Neptune; here the local CV manifest (``runners.py``) is the
store.  All reductions run on device; only finished maps cross to host.

Beyond-reference: ``ensemble=True`` renders one pooled figure per test item
from the stacked fold ensemble's M*T samples (``mcdo/ensemble.py``) instead
of one figure per fold — the predictive spread then includes cross-member
epistemic uncertainty.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_gated_mil_tpu.core import rng as rnglib
from montecarlo_gated_mil_tpu.core.config import Config
from montecarlo_gated_mil_tpu.experiment import build_model, get_fold_dataloaders
from montecarlo_gated_mil_tpu.mcdo.sampling import (
    mc_inference,
    predictive_stats,
)
from montecarlo_gated_mil_tpu.runners import init_params
from montecarlo_gated_mil_tpu.train.state import Checkpointer
from montecarlo_gated_mil_tpu.viz.attention import attention_map_stats
from montecarlo_gated_mil_tpu.viz.figures import plot_attention_and_density


def _render_item(out, bag, rec, grid, reader, dest_dir, j, num_samples):
    """Maps + display image + five-panel figure for one test item."""
    stats = predictive_stats(out.predictions)
    mean_maps, std_maps = attention_map_stats(
        out.attention, bag.tile_indices, bag.mask, grid
    )  # (C, H, W) each; std over samples, ddof=1, zeros at 1 sample
    # Display image: re-read the raw pixels and apply the laterality
    # canonicalization, exactly as the reference re-loads the DICOM
    # for display (infer.py:201-210).
    from montecarlo_gated_mil_tpu.data.pipeline import canonicalize_image

    raw = reader(rec)
    if isinstance(raw, tuple):
        raw = np.concatenate([np.asarray(raw[1]), np.asarray(raw[0])], axis=0)
    img = canonicalize_image(
        jnp.asarray(raw, jnp.float32),
        jnp.asarray(rec.laterality == "R"),
        (grid.height, grid.width),
    )
    path = os.path.join(dest_dir, f"{j + 1}_{rec.class_name}")
    plot_attention_and_density(
        np.asarray(img),
        np.asarray(mean_maps[1]),
        np.asarray(std_maps[1]),
        np.asarray(mean_maps[0]),
        np.asarray(std_maps[0]),
        stats,
        title_class=rec.class_name,
        num_samples=num_samples,
        save_path=path,
    )
    return path


def run_inference(
    cfg: Config,
    out_dir: str = "figures",
    manifest_path: str | None = None,
    max_items: int = 0,
    ensemble: bool = False,
) -> list[str]:
    """Generate figures for every fold x test item (or, with ``ensemble``,
    one pooled fold-ensemble figure per test item); returns saved paths."""
    manifest_path = manifest_path or os.path.join(cfg.model_path, "cv_manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    model = build_model(cfg)
    ckpt = Checkpointer(cfg.model_path)
    params_like = init_params(
        model, rnglib.named_key(rnglib.root_key(cfg.seed), "params")
    )
    key = rnglib.named_key(rnglib.root_key(cfg.seed), "infer")
    saved: list[str] = []
    if ensemble:
        from montecarlo_gated_mil_tpu.mcdo.ensemble import (
            ensemble_mc_inference,
            load_fold_ensemble,
        )

        stacked = load_fold_ensemble(
            cfg, manifest, template=params_like, ckpt=ckpt
        )
        n_members = len(manifest["folds"])
        # the test split is fold-independent; any fold's loader serves
        data = get_fold_dataloaders(cfg, 0)
        dest = os.path.join(out_dir, "figures_ensemble")
        os.makedirs(dest, exist_ok=True)
        grid = data.test.cfg.grid()
        total = n_members * cfg.N
        for j, (bag, rec) in enumerate(data.test.epoch(0)):
            if max_items and j >= max_items:
                break
            out = ensemble_mc_inference(
                model, stacked, bag.patches, bag.mask, cfg.N,
                jax.random.fold_in(key, j),
            )
            saved.append(
                _render_item(out, bag, rec, grid, data.test.reader, dest, j, total)
            )
            print(f"done: {j + 1}/{len(data.test)} (ensemble of {n_members})")
        return saved
    for entry in manifest["folds"]:
        fold = entry["fold"]
        params = ckpt.restore_params(entry["checkpoint"], params_like)
        data = get_fold_dataloaders(cfg, fold - 1)
        fold_dir = os.path.join(out_dir, f"figures_f{fold - 1}")
        os.makedirs(fold_dir, exist_ok=True)
        grid = data.test.cfg.grid()
        for j, (bag, rec) in enumerate(data.test.epoch(0)):
            if max_items and j >= max_items:
                break
            out = mc_inference(
                model,
                {"params": params},
                bag.patches,
                bag.mask,
                cfg.N,
                jax.random.fold_in(key, j),
            )
            saved.append(
                _render_item(
                    out, bag, rec, grid, data.test.reader, fold_dir, j, cfg.N
                )
            )
            print(f"done: {j + 1}/{len(data.test)} (fold {fold})")
    return saved
