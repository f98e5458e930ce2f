"""Classification reports and fold aggregation.

Capability spec: sklearn ``classification_report`` with target names
Negative/Positive (``/root/reference/net_utils.py:180,218``) and the
mean±std fold aggregation printed by ``cross_val_eval.py:145-153``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class Report(str):
    """Classification-report text that also carries the sklearn dict form,
    so fold aggregation (``cross_val_eval.py:37-56``) can average per-class
    precision/recall/F1 without re-running predictions."""

    data: dict

    def __new__(cls, text: str, data: dict) -> "Report":
        obj = super().__new__(cls, text)
        obj.data = data
        return obj


def classification_report(
    targets: Sequence[int],
    preds: Sequence[int],
    target_names: tuple[str, str] = ("Negative", "Positive"),
) -> Report:
    """Text + dict classification report in one object."""
    return Report(
        classification_report_text(targets, preds, target_names),
        classification_report_dict(targets, preds, target_names),
    )


def classification_report_text(
    targets: Sequence[int],
    preds: Sequence[int],
    target_names: tuple[str, str] = ("Negative", "Positive"),
) -> str:
    from sklearn.metrics import classification_report

    # labels pinned so a single-class test set still reports both rows
    # (sklearn would otherwise reject the 2 target names).
    return classification_report(
        list(targets), list(preds), labels=[0, 1],
        target_names=list(target_names), zero_division=0,
    )


def classification_report_dict(
    targets: Sequence[int],
    preds: Sequence[int],
    target_names: tuple[str, str] = ("Negative", "Positive"),
) -> dict:
    from sklearn.metrics import classification_report

    return classification_report(
        list(targets),
        list(preds),
        labels=[0, 1],
        target_names=list(target_names),
        output_dict=True,
        zero_division=0,
    )


def aggregate_fold_accuracies(accs: Sequence[float]) -> dict:
    """Mean / std across folds (``cross_val_eval.py:145-153``)."""
    a = np.asarray(list(accs), dtype=np.float64)
    return {
        "mean": float(a.mean()) if a.size else float("nan"),
        "std": float(a.std()) if a.size else float("nan"),
        "per_fold": [float(x) for x in a],
    }


def aggregate_classification_reports(reports: Sequence[dict]) -> dict:
    """Average per-class precision/recall/F1 across folds (capability of
    ``cross_val_eval.py:37-56``)."""
    if not reports:
        return {}
    out: dict = {}
    keys = reports[0].keys()
    for k in keys:
        vals = [r[k] for r in reports if k in r]
        if isinstance(vals[0], dict):
            out[k] = {
                m: float(np.mean([v[m] for v in vals])) for m in vals[0].keys()
            }
        else:
            out[k] = float(np.mean(vals))
    return out
