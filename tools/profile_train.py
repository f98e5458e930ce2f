#!/usr/bin/env python
"""Training-step utilization audit on the real TPU (slope method).

Decomposes the one-bag training step (``train/state.py::make_train_step``;
the reference's hot loop, ``/root/reference/net_utils.py:33-78``) at the
benchmark workload (r18 bf16, 256-instance bag of 224px patches, CE+aux,
Adam) into its phases, and measures the fused-Pallas-head variant
(``use_pallas=True`` — fused head forward + custom-VJP backward at T=1)
against the jnp head, so the ``tpu.use_pallas_train`` default is a recorded
measurement, not a guess.  Results land in docs/PERFORMANCE.md
§train-step audit.

All timings use the chained-scan slope method (tunnel-safe; see
docs/PERFORMANCE.md §Measurement methodology — run on a QUIET host).

Usage: python tools/profile_train.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from montecarlo_gated_mil_tpu.core.bag import Bag  # noqa: E402
from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL  # noqa: E402
from montecarlo_gated_mil_tpu.train import TrainState, make_train_step  # noqa: E402
from montecarlo_gated_mil_tpu.train.criteria import cross_entropy  # noqa: E402
from montecarlo_gated_mil_tpu.utils.profiling import (  # noqa: E402
    slope_of_chain,
    train_step_chain,
)

N = 256
KS = (2, 5, 10)


def _slope(build_chain) -> float:
    """Shared methodology with bench.py's train_step_ms (one definition in
    utils/profiling.py, so the audit and the recorded series cannot
    diverge)."""
    return slope_of_chain(build_chain, ks=KS)


def _consume(tree):
    """Cheap scalar that depends on every leaf (defeats backward DCE)."""
    return sum(jnp.sum(l.astype(jnp.float32) ** 2) * 1e-9 for l in jax.tree.leaves(tree))


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
    params = variables["params"]
    opt = optax.adam(3e-5)
    patches = jax.random.normal(key, (N, 224, 224, 3), jnp.bfloat16)
    mask = jnp.ones((N,), bool)
    bag = Bag(
        patches=patches, mask=mask, label=jnp.asarray(1, jnp.int32),
        tile_indices=jnp.arange(N, dtype=jnp.int32),
    )

    results: dict[str, float] = {}

    # --- full train step, jnp head vs fused Pallas head -------------------
    def step_chain(use_pallas):
        step = make_train_step(
            model, cross_entropy, opt, accumulation_steps=1,
            use_pallas=use_pallas,
        )
        state = TrainState.create(params, opt)
        return train_step_chain(
            step, state, patches, mask, bag.label, bag.tile_indices, key
        )

    results["full step (jnp head)"] = _slope(step_chain(False))
    results["full step (fused Pallas head)"] = _slope(step_chain(True))

    # --- embed forward only ------------------------------------------------
    def embed_fwd(k):
        @jax.jit
        def f(p):
            def body(c, i):
                H = model.apply(
                    {"params": params}, p + c.astype(jnp.bfloat16), mask,
                    method="embed",
                )
                return jnp.sum(H.astype(jnp.float32)) * 1e-9, None

            c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), jnp.arange(k))
            return c

        return lambda: float(f(patches))

    results["embed fwd"] = _slope(embed_fwd)

    # --- embed forward + backward (grads w.r.t. backbone params) ----------
    def embed_fwd_bwd(k):
        def loss(prm, p):
            H = model.apply({"params": prm}, p, mask, method="embed")
            return jnp.sum(H.astype(jnp.float32))

        @jax.jit
        def f(p):
            def body(c, i):
                g = jax.grad(loss)(params, p + c.astype(jnp.bfloat16))
                return _consume(g), None

            c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), jnp.arange(k))
            return c

        return lambda: float(f(patches))

    results["embed fwd+bwd"] = _slope(embed_fwd_bwd)

    # --- head-only forward + backward on fixed H ---------------------------
    H0 = jax.jit(
        lambda p: model.apply({"params": params}, p, mask, method="embed")
    )(patches)

    def head_fwd_bwd(fused):
        from montecarlo_gated_mil_tpu.models.gamil import auxiliary_loss
        from montecarlo_gated_mil_tpu.ops.gated_attention import (
            GatedAttentionParams,
            mc_gated_attention_fused,
        )

        label = bag.label

        def loss(prm, H, seed):
            if fused:
                y, a = mc_gated_attention_fused(
                    H, mask, GatedAttentionParams.from_model_params(prm),
                    1, seed, model.feature_dropout, model.attention_dropout,
                )
                y0, a0 = y[0], a[0]
            else:
                y0, a0 = model.apply(
                    {"params": prm}, H, mask, train=True,
                    rngs={"dropout": jax.random.key(seed)}, method="head",
                )
            aux = model.aux_scale * auxiliary_loss(
                a0[1], a0[0], label == 1,
                loss_type=model.aux_loss_type, margin=model.aux_margin,
            )
            return cross_entropy(y0[None, :], label[None]) + aux

        def build(k):
            @jax.jit
            def f(H):
                def body(c, i):
                    g = jax.grad(loss)(
                        params, H + c.astype(H.dtype), i.astype(jnp.int32)
                    )
                    return _consume(g), None

                c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), jnp.arange(k))
                return c

            return lambda: float(f(H0))

        return build

    try:
        results["head fwd+bwd (jnp, on fixed H)"] = _slope(head_fwd_bwd(False))
    except Exception as e:  # noqa: BLE001  (no `method="head"` signature match)
        print(f"  [head jnp measurement skipped: {e}]")
    results["head fwd+bwd (fused, on fixed H)"] = _slope(head_fwd_bwd(True))

    # --- optimizer update alone --------------------------------------------
    grads = jax.jit(lambda: jax.tree.map(jnp.ones_like, params))()
    opt_state0 = opt.init(params)

    def opt_only(k):
        @jax.jit
        def f(g0):
            def body(carry, i):
                prm, ost = carry
                g = jax.tree.map(
                    lambda x: x + (i % 2).astype(x.dtype) * 1e-9, g0
                )
                updates, ost = opt.update(g, ost, prm)
                prm = optax.apply_updates(prm, updates)
                return (prm, ost), None

            (prm, _), _ = jax.lax.scan(body, (params, opt_state0), jnp.arange(k))
            return _consume(prm)

        return lambda: float(f(grads))

    results["optimizer update (Adam)"] = _slope(opt_only)

    full = results["full step (jnp head)"]
    print(f"\ntrain-step audit (r18 bf16, bag {N}x224px, CE+aux, Adam):")
    print(f"{'component':38s} {'ms':>8s} {'% of full':>10s}")
    for name, t in results.items():
        print(f"{name:38s} {t * 1e3:8.2f} {100 * t / full:9.1f}%")
    known = (
        results.get("embed fwd+bwd", 0.0)
        + results.get("head fwd+bwd (fused, on fixed H)", 0.0)
        + results.get("optimizer update (Adam)", 0.0)
    )
    print(f"{'(sum embed+head+opt)':38s} {known * 1e3:8.2f} {100 * known / full:9.1f}%")


if __name__ == "__main__":
    main()
