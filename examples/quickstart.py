#!/usr/bin/env python
"""End-to-end quickstart on the built-in synthetic mammogram generator.

Walks the full reference workflow (train -> cross-validate -> re-evaluate
-> uncertainty figures -> serving), sized to finish in a few minutes on CPU
and faster on a TPU chip.  Every step is the same public API the CLI
subcommands drive; swap ``synthetic_count`` for real ``metadata_path`` /
``data_path`` keys (reference config.yml schema) to run on DICOM data.

    python examples/quickstart.py [--out DIR]
"""

import argparse
import json
import os
import tempfile

import numpy as np


def make_config(workdir: str):
    """A small but complete config (reference config.yml schema + tpu block).

    128x128 synthetic images, 64px patches, two buckets, 2 CV folds,
    T=8 MCDO samples.
    """
    from montecarlo_gated_mil_tpu.core import config_from_dict

    return config_from_dict(
        {
            "seed": 42,
            "model_path": os.path.join(workdir, "models"),
            "model": "r18",
            "is_MCDO-val": True,
            "is_MCDO-test": True,
            "N": 8,  # MCDO samples (the reference's T)
            "feature_dropout": 0.2,
            "attention_dropout": 0.1,
            "shared_att": True,
            "data": {
                "H": 128,
                "W": 128,
                "patch_size": 64,
                "overlap_train": 0.25,
                "overlap_val_test": 0.25,
                "empty_threshold": 0.05,
                "cv_folds": 2,
                "fraction_test": 0.3,
                "fraction_train_rest": 0.6,
                "fraction_val_test": 0.5,
                "synthetic_count": 16,
            },
            "training_plan": {
                "weighted_sampler": True,
                "criterion": "ce",
                "optimizer": "adam",
                "parameters": {
                    "lr": 1e-4,
                    "wd": 1e-4,
                    "epochs": 2,
                    "patience": 3,
                    "grad_acc_steps": 2,
                },
            },
            "tpu": {"buckets": [8, 16], "compute_dtype": "float32"},
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="output dir (default: temp)")
    args = ap.parse_args()
    workdir = args.out or tempfile.mkdtemp(prefix="mcgmil_quickstart_")
    os.makedirs(workdir, exist_ok=True)
    cfg = make_config(workdir)

    from montecarlo_gated_mil_tpu.runners import (
        run_cross_validation,
        run_cv_eval,
        run_training,
    )
    from montecarlo_gated_mil_tpu.utils.metrics import (
        JsonlSink,
        Metrics,
        StdoutSink,
    )

    metrics = Metrics(
        [StdoutSink(), JsonlSink(os.path.join(workdir, "metrics.jsonl"))]
    )

    # 1. Single-split training -> early stopping -> save best -> test
    #    (the reference's main.py workflow).
    print(f"== 1/5 train (workdir: {workdir})")
    result = run_training(cfg, metrics)
    print(f"   test accuracy {result['test_accuracy']:.3f}; "
          f"best model at {result['best_model_path']}")

    # 2. k-fold cross-validation (cross_validation.py): per-fold fresh
    #    model/optimizer/early-stop, MC validation, manifest on disk.
    print("== 2/5 cross-validation")
    manifest = run_cross_validation(cfg, metrics)
    print(f"   fold accuracies: "
          f"{[round(f['accuracy'], 3) for f in manifest['folds']]}")

    # 3. Re-evaluate every fold from the manifest, timed MCDO vs
    #    deterministic (cross_val_eval.py), plus the pooled fold ensemble
    #    (beyond-reference: all folds' checkpoints vote together).
    print("== 3/5 CV re-evaluation (MC vs deterministic vs fold ensemble)")
    manifest_path = os.path.join(cfg.model_path, "cv_manifest.json")
    ev = run_cv_eval(cfg, manifest_path, metrics, ensemble=True)
    print(f"   MC  acc {ev['mc']['mean']:.3f} +- {ev['mc']['std']:.3f}   "
          f"det acc {ev['deterministic']['mean']:.3f} "
          f"+- {ev['deterministic']['std']:.3f}   "
          f"ens acc {ev['ensemble']['accuracy']:.3f}")

    # 4. MCDO inference + 5-panel attention/uncertainty figures (infer.py).
    print("== 4/5 uncertainty figures")
    from montecarlo_gated_mil_tpu.viz.infer import run_inference

    figs = run_inference(cfg, out_dir=os.path.join(workdir, "figures"),
                         max_items=1)
    print(f"   wrote {', '.join(p + '.png' for p in figs)}")

    # 5. Serving: a warm predictor answering single-image requests with
    #    predictive statistics and (optionally) attention maps.
    print("== 5/5 serving")
    from montecarlo_gated_mil_tpu.data.synthetic import synthetic_image
    from montecarlo_gated_mil_tpu.mcdo import interpret_entropy
    from montecarlo_gated_mil_tpu.server import build_predictor

    predictor = build_predictor(cfg, checkpoint=result["best_model_path"])
    predictor.warmup()
    image = synthetic_image(cfg.data.H, cfg.data.W, positive=True, seed=3)
    r = predictor.predict(image, laterality="L", return_maps=True,
                          map_downsample=4)
    print(json.dumps(
        {
            "prediction": int(r.prediction),
            "p_cancer_mean": round(float(r.stats.mean), 4),
            "p_cancer_std": round(float(r.stats.std), 4),
            "mean_entropy": round(float(r.stats.mean_entropy), 4),
            "interpretation": interpret_entropy(r.stats.mean_entropy),
            "attention_map_shape": list(np.shape(r.attention_mean_maps)),
        },
        indent=2,
    ))
    print(f"done; artifacts in {workdir}")


if __name__ == "__main__":
    main()
