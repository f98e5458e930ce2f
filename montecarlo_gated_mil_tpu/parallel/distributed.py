"""Multi-process / multi-slice execution: init, fold fan-out, result gather.

SURVEY.md §5 (distributed communication backend): within one slice, SPMD
over ICI is handled by ``parallel/mesh.py`` + XLA collectives; across
slices/hosts the framework uses ``jax.distributed.initialize`` and fans the
embarrassingly-parallel cross-validation folds out over processes, merging
fold metrics over DCN with a single allgather.  The reference is strictly
single-process (``/root/reference/main.py:30-31``, no torch.distributed
anywhere); this layer is what lets CV sweeps use a multi-slice pod.

Single-process behavior is the identity: every helper degrades to a no-op
or passthrough when ``jax.process_count() == 1``, so the same runner code
serves a laptop CPU, one chip, and a pod.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(
    coordinator_address: str = "",
    num_processes: int = -1,
    process_id: int = -1,
) -> bool:
    """Bring up the JAX distributed runtime (no-op when not configured).

    Returns True if multi-process mode is active.  IMPORTANT ordering: when
    a coordinator is configured, ``jax.distributed.initialize`` must run
    before *any* call that could initialize the XLA backends — including
    ``jax.process_count()`` — so the configured branch calls it first and
    treats an already-initialized runtime (e.g. brought up by a launcher)
    as success.
    """
    if not coordinator_address:
        # Unconfigured: report whatever the environment already set up
        # (a launcher may have called jax.distributed.initialize itself).
        return jax.process_count() > 1
    kwargs: dict = {"coordinator_address": coordinator_address}
    if num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # double-init by a launcher is fine
        # jax 0.9 raises "distributed.initialize should only be called
        # once."; older versions said "already initialized" — accept both.
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise
    return jax.process_count() > 1


def fold_assignment(num_folds: int, process_index: int, process_count: int) -> list[int]:
    """Round-robin fold -> process assignment (folds are independent:
    fresh model/loaders/optimizer per fold, ``cross_validation.py:57-95``)."""
    if process_count <= 0:
        raise ValueError(f"process_count must be positive, got {process_count}")
    if not 0 <= process_index < process_count:
        raise ValueError(
            f"process_index {process_index} out of range [0, {process_count})"
        )
    return [f for f in range(num_folds) if f % process_count == process_index]


def allgather_fold_accuracies(
    fold_ids: list[int], accuracies: list[float], num_folds: int
) -> dict[int, float]:
    """Merge per-process fold accuracies into a full fold -> accuracy map.

    Each process contributes the folds it ran; the merge is one DCN
    allgather of a fixed-size (num_folds,) vector (NaN where a process did
    not run a fold).  Single-process: pure passthrough, no collective.
    """
    local = np.full((num_folds,), np.nan, np.float64)
    for f, a in zip(fold_ids, accuracies):
        local[f] = a
    if jax.process_count() == 1:
        merged = local
    else:
        from jax.experimental import multihost_utils

        # Gather the f64 vector as its uint32 bit pattern: process_allgather
        # jits an identity, and with jax_enable_x64 off that DEMOTES f64 to
        # f32 — the merged table would silently disagree with a
        # single-process run of the same folds (e.g. 2/3 gathers as
        # 0.66666668653...).  uint32 rides the collective unchanged.
        gathered = (
            np.asarray(multihost_utils.process_allgather(local.view(np.uint32)))
            .view(np.float64)
        )  # (P, num_folds)
        merged = np.full((num_folds,), np.nan, np.float64)
        for row in gathered:
            have = ~np.isnan(row)
            merged[have] = row[have]
    return {int(f): float(a) for f, a in enumerate(merged) if not np.isnan(a)}
