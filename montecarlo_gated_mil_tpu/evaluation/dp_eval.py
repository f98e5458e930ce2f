"""Data-parallel MC test: bags sharded over the device mesh.

BASELINE.json config 5: k-fold CV evaluation data-parallel over bucketed
bags.  Bags from the loader are grouped **per bucket size** into mesh-sized
batches, stacked, sharded over the ``data`` axis and evaluated with one
compiled SPMD program per bucket — so adaptive per-bag buckets (sparse bags
in small buckets) compose with sharded eval instead of paying full padding.
The per-bag PRNG keys match the sequential ``loops.mc_test`` scheme
(``fold_in(key, bag_index)`` with the bag's stream position), so predictions
are identical to the sequential path bag-for-bag regardless of grouping.
Partial groups are padded by repeating their first bag; padding results are
dropped and outputs are re-ordered to stream order.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_gated_mil_tpu.parallel.dp import (
    BucketBatcher,
    make_dp_mc_eval,
    pad_group_to_batch,
)
from montecarlo_gated_mil_tpu.parallel.mesh import make_mesh
from montecarlo_gated_mil_tpu.utils.metrics import Metrics


def mc_test_dp(
    model,
    params,
    loader: Iterable,
    *,
    num_samples: int = 50,
    key: jax.Array,
    mesh=None,
    metrics: Metrics | None = None,
    fold: int | None = None,
    quantized: bool = False,
    pending_budget_bytes: int = 1 << 31,
    shard_over: int | None = None,
) -> tuple[float, str]:
    """Sharded equivalent of ``loops.mc_test`` (same reduction: argmax of
    MC-mean softmax, ``net_utils.py:207-210``).  ``quantized`` embeds
    through the int8 PTQ path, matching the sequential loop's flag.
    ``pending_budget_bytes`` bounds device-resident partial groups (default
    2 GiB; always at least one full mesh batch of the largest bag seen).
    ``shard_over``: OVERSIZED bags (bucket above it) skip data-parallel
    grouping — a per-device shard of the data axis could not hold them —
    and instead evaluate one at a time with the instance axis sharded over
    ALL devices (``parallel/instance.py``; float path)."""
    from montecarlo_gated_mil_tpu.train.loops import (
        _finish_test,
        _mc_test_step_sharded,
        _shard_mesh_for,
        warn_float_shard,
    )

    mesh = mesh or make_mesh()
    batch = int(mesh.shape["data"])
    eval_step = make_dp_mc_eval(model, mesh, num_samples, quantized)

    @jax.jit
    def reduce_preds(preds):  # (B, T, C) -> (B,)
        probs = jax.nn.softmax(preds, axis=-1)
        return jnp.argmax(jnp.mean(probs, axis=1), axis=-1)

    results: dict[int, int] = {}
    targets: list[int] = []

    def flush(group):
        stacked, keys, n_real = pad_group_to_batch(
            mesh,
            [b for b, _ in group],
            [jax.random.fold_in(key, i) for _, i in group],
        )
        preds, _ = eval_step(params, stacked, keys)
        labels = reduce_preds(preds)
        for (_, orig_i), pred in zip(group, np.asarray(labels)[:n_real]):
            results[orig_i] = int(pred)

    # Grouping + pending-byte bounding policy lives in BucketBatcher (shared
    # with data-parallel training): groups flush when full, and when total
    # pending bytes exceed max(budget, one mesh batch of the largest bag)
    # the byte-heaviest partial group flushes early.
    batcher = BucketBatcher(batch, pending_budget_bytes)
    warned_shard = False
    items = loader.epoch(0) if hasattr(loader, "epoch") else iter(loader)
    for i, (bag, _rec) in enumerate(items):
        targets.append(int(bag.label))
        if _shard_mesh_for(bag.bucket, shard_over) is not None:
            if quantized and not warned_shard:
                warned_shard = True
                warn_float_shard(quantized=True)
            results[i] = int(
                _mc_test_step_sharded(model, num_samples)(
                    params, bag.patches, bag.mask, jax.random.fold_in(key, i)
                )
            )
            continue
        for group in batcher.add(bag, i):
            flush(group)
    for group in batcher.drain():
        flush(group)
    preds_out = [results[i] for i in range(len(targets))]
    return _finish_test(targets, preds_out, metrics, fold)
