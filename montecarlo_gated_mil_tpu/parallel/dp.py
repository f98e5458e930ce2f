"""Data-parallel training and MC evaluation over a device mesh.

SPMD over stacked bags: the batch's leading axis shards across the ``data``
mesh axis, parameters replicate, and XLA inserts the gradient all-reduce
over ICI — no hand-written collectives (the scaling-book recipe: annotate
shardings, let the compiler place psums).  Per-bag semantics (BN statistics,
attention masking, aux loss) are preserved because the model is vmapped
per bag, exactly as in the single-device path.

Reference counterpart: none (single GPU, batch size 1); this layer is what
makes k-fold evaluation and large-batch training scale to a v5e-8 slice.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from montecarlo_gated_mil_tpu.core.bag import Bag
from montecarlo_gated_mil_tpu.mcdo.sampling import mc_head
from montecarlo_gated_mil_tpu.parallel.mesh import (
    data_sharded,
    replicated,
)
from montecarlo_gated_mil_tpu.train.state import TrainState

Array = jax.Array


def make_dp_train_step(
    model,
    criterion: Callable,
    optimizer: optax.GradientTransformation,
    mesh,
):
    """Jitted SPMD step over a stacked batch of bags ``(B, N, h, w, 3)``.

    Loss is the mean over bags of CE + scaled aux (the reference's bs=1
    accumulation of B microbatches collapses into one sharded batch); the
    gradient all-reduce over ``data`` is inserted by XLA from the sharding
    annotations.
    """
    rep = replicated(mesh)
    shard1 = data_sharded(mesh, 1)

    def loss_fn(params, bags: Bag, keys):
        def per_bag(bag: Bag, key):
            y, _, aux = model.apply(
                {"params": params},
                bag.patches,
                bag.mask,
                bag.label,
                train=True,
                rngs={"dropout": key},
            )
            ce = criterion(y[None, :], bag.label[None])
            correct = (jnp.argmax(y) == bag.label).astype(jnp.float32)
            return ce + aux, correct

        losses, corrects = jax.vmap(per_bag)(bags, keys)
        return jnp.mean(losses), jnp.mean(corrects)

    @partial(
        jax.jit,
        in_shardings=(rep, data_sharded(mesh, 1), shard1),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    def step(state: TrainState, bags: Bag, keys: Array):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, bags, keys
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt,
            grad_acc=state.grad_acc,
            acc_count=state.acc_count,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_dp_mc_eval(model, mesh, num_samples: int, quantized: bool = False):
    """Jitted SPMD MC inference over a stacked batch of bags.

    Features are computed once per bag and the T dropout passes vmap inside;
    bags shard over ``data``.  ``quantized`` embeds through the int8 PTQ
    path (ops/quantized.py), matching the sequential loops.  Returns per-bag
    ``(T, C)`` logits and ``(T, C, N)`` attention.
    """
    from montecarlo_gated_mil_tpu.mcdo.sampling import make_embed_fn

    embed = make_embed_fn(model, quantized)
    rep = replicated(mesh)
    shard1 = data_sharded(mesh, 1)

    @partial(
        jax.jit,
        in_shardings=(rep, data_sharded(mesh, 1), shard1),
        out_shardings=(data_sharded(mesh, 1), data_sharded(mesh, 1)),
        static_argnums=(),
    )
    def eval_step(params, bags: Bag, keys: Array):
        def per_bag(bag: Bag, key):
            H = embed(params, bag.patches, bag.mask)
            out = mc_head(model, {"params": params}, H, bag.mask, num_samples, key)
            return out.predictions, out.attention

        return jax.vmap(per_bag)(bags, keys)

    return eval_step


def pad_group_to_batch(mesh, bags, keys):
    """Pad a partial mesh group by repeating its first bag/key, stack,
    shard.  Shared by the sharded eval (``evaluation/dp_eval.py``) and
    batched serving (``serve.predict_many``) so the padding protocol has
    one owner.  Returns ``(stacked_sharded_bags, stacked_keys, n_real)``.
    """
    import jax.numpy as jnp

    from montecarlo_gated_mil_tpu.core.bag import stack_bags
    from montecarlo_gated_mil_tpu.parallel.mesh import shard_batch

    batch = int(mesh.shape["data"])
    n_real = len(bags)
    if not 0 < n_real <= batch:
        raise ValueError(f"group size {n_real} not in (0, {batch}]")
    bags = list(bags) + [bags[0]] * (batch - n_real)
    keys = jnp.stack(list(keys) + [keys[0]] * (batch - n_real))
    return shard_batch(mesh, stack_bags(bags)), keys, n_real
