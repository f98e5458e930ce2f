#!/usr/bin/env python
"""Training-step throughput on the real TPU (slope method).

Measures the full jitted one-bag training step (``train/state.py::
make_train_step``): ResNet-18 embed + MH gated-attention forward with
dropout, CE + auxiliary loss, backward, grad-accumulation add, Adam update
— the reference's hot loop (``/root/reference/net_utils.py:33-78``) — at
the benchmark workload (256-instance bag of 224px patches).

Usage: python tools/measure_train.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from montecarlo_gated_mil_tpu.core.bag import Bag  # noqa: E402
from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL  # noqa: E402
from montecarlo_gated_mil_tpu.train import TrainState, make_train_step  # noqa: E402
from montecarlo_gated_mil_tpu.train.criteria import cross_entropy  # noqa: E402

N = 256


def main():
    print(f"backend: {jax.default_backend()}")
    model = MultiHeadGatedAttentionMIL(
        backbone="r18", dtype=jnp.bfloat16, feature_dropout=0.25,
        attention_dropout=0.25,
    )
    key = jax.random.key(0)
    variables = jax.jit(model.init)(
        {"params": key, "dropout": key},
        jnp.zeros((8, 64, 64, 3), jnp.float32), jnp.ones((8,), bool),
    )
    opt = optax.adam(3e-5)
    state = TrainState.create(variables["params"], opt)
    step = make_train_step(model, cross_entropy, opt, accumulation_steps=1)

    patches = jax.random.normal(key, (N, 224, 224, 3), jnp.bfloat16)
    bag = Bag(
        patches=patches,
        mask=jnp.ones((N,), bool),
        label=jnp.asarray(1, jnp.int32),
        tile_indices=jnp.arange(N, dtype=jnp.int32),
    )

    # chained-scan slope: k steps per call, state threaded through the scan
    # (successive realistic updates), scalar readback forces completion.
    def chain(k):
        @jax.jit
        def f(state, patches):
            def body(carry, i):
                st = carry
                b = Bag(
                    patches=patches + st.step.astype(jnp.bfloat16) * 0,
                    mask=bag.mask, label=bag.label,
                    tile_indices=bag.tile_indices,
                )
                st, m = step(st, b, jax.random.fold_in(key, i), jnp.asarray(True))
                return st, m["loss"]

            st, losses = jax.lax.scan(body, state, jnp.arange(k))
            return jnp.sum(losses)

        return f

    totals = {}
    for k in (2, 5, 10):
        g = chain(k)
        float(g(state, patches))  # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(g(state, patches))
            best = min(best, time.perf_counter() - t0)
        totals[k] = best
    slopes = sorted(
        (totals[b] - totals[a]) / (b - a)
        for a, b in ((2, 5), (5, 10), (2, 10))
    )
    per_step = slopes[1]
    print(
        f"train step (r18, bag {N}x224px, CE+aux, Adam): "
        f"{per_step * 1e3:.2f} ms/step = {1.0 / per_step:.1f} bags/s/chip"
    )


if __name__ == "__main__":
    main()
