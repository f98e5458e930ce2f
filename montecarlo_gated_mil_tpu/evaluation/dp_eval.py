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

from montecarlo_gated_mil_tpu.parallel.dp import make_dp_mc_eval, pad_group_to_batch
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
) -> tuple[float, str]:
    """Sharded equivalent of ``loops.mc_test`` (same reduction: argmax of
    MC-mean softmax, ``net_utils.py:207-210``).  ``quantized`` embeds
    through the int8 PTQ path, matching the sequential loop's flag."""
    from montecarlo_gated_mil_tpu.train.loops import _finish_test

    mesh = mesh or make_mesh()
    batch = int(mesh.shape["data"])
    eval_step = make_dp_mc_eval(model, mesh, num_samples, quantized)

    @jax.jit
    def reduce_preds(preds):  # (B, T, C) -> (B,)
        probs = jax.nn.softmax(preds, axis=-1)
        return jnp.argmax(jnp.mean(probs, axis=1), axis=-1)

    results: dict[int, int] = {}
    targets: list[int] = []
    groups: dict[int, list] = {}  # bucket size -> [(bag, stream index)]

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

    # Bound device-resident pending bags: with many registry buckets, each
    # partial group could otherwise pin up to batch-1 production-scale bags
    # (~300 MB each) simultaneously until end-of-stream.  When the total
    # pending count exceeds the cap, the fullest partial group flushes
    # early — a partially-padded SPMD batch costs some padded compute but
    # keeps HBM residency bounded regardless of bucket count.
    max_pending = 2 * batch
    items = loader.epoch(0) if hasattr(loader, "epoch") else iter(loader)
    for i, (bag, _rec) in enumerate(items):
        targets.append(int(bag.label))
        group = groups.setdefault(bag.bucket, [])
        group.append((bag, i))
        if len(group) == batch:
            flush(group)
            groups[bag.bucket] = []
        elif sum(len(g) for g in groups.values()) > max_pending:
            fullest = max(groups, key=lambda k: len(groups[k]))
            flush(groups[fullest])
            groups[fullest] = []
    for group in groups.values():
        if group:
            flush(group)
    preds_out = [results[i] for i in range(len(targets))]
    return _finish_test(targets, preds_out, metrics, fold)
