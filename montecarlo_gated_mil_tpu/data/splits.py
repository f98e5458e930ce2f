"""Dataset splitting: fractional train/val/test and stratified k-fold CV.

Capability spec: ``/root/reference/utils.py:26-33`` (seeded fractional split)
and ``utils.py:137-154`` (stratified held-out test split + KFold over the
rest).  Implemented over plain index arrays so the same functions serve
pandas DataFrames, record lists, or synthetic datasets.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np


@dataclass(frozen=True)
class Split:
    train: np.ndarray
    val: np.ndarray
    test: np.ndarray


def random_split(
    n: int, train_frac: float, val_test_frac: float, seed: int
) -> Split:
    """train = train_frac of all; val = val_test_frac of the rest; test =
    remainder (reference ``random_split_df``, ``utils.py:26-33``)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_train = round(n * train_frac)
    rest = perm[n_train:]
    n_val = round(len(rest) * val_test_frac)
    return Split(
        train=np.sort(perm[:n_train]),
        val=np.sort(rest[:n_val]),
        test=np.sort(rest[n_val:]),
    )


def stratified_test_split(
    labels: Sequence[int], test_frac: float, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Held-out test set stratified by label (reference uses sklearn
    ``train_test_split(stratify=...)``, ``utils.py:141``)."""
    from sklearn.model_selection import train_test_split

    idx = np.arange(len(labels))
    train_val, test = train_test_split(
        idx, test_size=test_frac, random_state=seed, stratify=np.asarray(labels)
    )
    return np.sort(train_val), np.sort(test)


def kfold_split(
    n: int, k: int, fold: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Fold ``fold`` of shuffled k-fold over ``n`` items (reference:
    ``KFold(k, shuffle=True, random_state=seed)``, ``utils.py:144-151``)."""
    from sklearn.model_selection import KFold

    if not 0 <= fold < k:
        raise ValueError(f"fold index {fold} must be in [0, {k})")
    kf = KFold(n_splits=k, shuffle=True, random_state=seed)
    for i, (train_idx, val_idx) in enumerate(kf.split(np.arange(n))):
        if i == fold:
            return train_idx, val_idx
    raise AssertionError("unreachable")


def weighted_sample_order(
    sample_weights: Sequence[float], num_samples: int, seed: int
) -> np.ndarray:
    """Epoch ordering drawn with replacement proportional to weights
    (reference ``WeightedRandomSampler``, ``utils.py:217``)."""
    w = np.asarray(sample_weights, dtype=np.float64)
    p = w / w.sum()
    rng = np.random.default_rng(seed)
    return rng.choice(len(w), size=num_samples, replace=True, p=p)
