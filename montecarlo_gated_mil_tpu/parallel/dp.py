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
    donate: bool = True,
):
    """Jitted SPMD training over stacked batches of bags ``(B, N, h, w, 3)``.

    Returns ``(step, apply_pending)``:

    - ``step(state, bags, keys, weights, do_update)`` computes per-bag
      CE+aux gradients (bags shard over ``data``; the gradient all-reduce
      over ICI is inserted by XLA from the sharding annotations), adds the
      ``weights``-weighted gradient sum to the accumulator (padding slots of
      a partial group carry weight 0 and contribute nothing), and — when
      ``do_update`` — applies the **mean** accumulated gradient and resets.
    - ``apply_pending(state)`` applies whatever is accumulated (no-op when
      nothing is) — the epoch-end flush when the last group left
      ``do_update`` false.

    Accumulation semantics vs the sequential step (``train/state.py``): a
    mesh batch of B real bags counts as B reference microbatches; the
    update applies the mean gradient over the bags accumulated since the
    last update.  When that count equals ``grad_acc_steps`` this is exactly
    the reference's ``sum(grad_i)/k``; at a partial epoch-end flush the
    reference scales by the full k (a smaller effective step — an artifact
    of its static ``loss /= k``), while this path uses the true mean.
    Documented divergence; trajectories are statistically equivalent.
    """
    rep = replicated(mesh)
    shard1 = data_sharded(mesh, 1)

    def sum_fn(params, bags: Bag, keys, weights):
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
            return ce + aux, aux, correct

        losses, auxes, corrects = jax.vmap(per_bag)(bags, keys)
        loss_sum = jnp.sum(losses * weights)
        return loss_sum, (
            loss_sum,
            jnp.sum(auxes * weights),
            jnp.sum(corrects * weights),
            jnp.sum(weights),
        )

    def _apply(grad_acc, acc_count, state: TrainState) -> TrainState:
        denom = jnp.maximum(acc_count, 1).astype(jnp.float32)
        mean_grads = jax.tree.map(lambda g: g / denom, grad_acc)
        updates, new_opt = optimizer.update(
            mean_grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(
            params=new_params,
            opt_state=new_opt,
            grad_acc=jax.tree.map(jnp.zeros_like, grad_acc),
            acc_count=jnp.asarray(0, jnp.int32),
            step=state.step + 1,
        )

    @partial(
        jax.jit,
        in_shardings=(rep, data_sharded(mesh, 1), shard1, shard1, rep),
        out_shardings=(rep, rep),
        # In-place TrainState reuse (tpu.donate_buffers).  Anything stashing
        # params across steps must copy — EarlyStopping does.
        donate_argnums=(0,) if donate else (),
    )
    def step(state: TrainState, bags: Bag, keys: Array, weights: Array, do_update):
        grads, (loss_sum, aux_sum, correct_sum, n) = jax.grad(
            sum_fn, has_aux=True
        )(state.params, bags, keys, weights)
        grad_acc = jax.tree.map(jnp.add, state.grad_acc, grads)
        acc_count = state.acc_count + n.astype(jnp.int32)

        def apply(_):
            return _apply(grad_acc, acc_count, state)

        def hold(_):
            from dataclasses import replace

            return replace(state, grad_acc=grad_acc, acc_count=acc_count)

        new_state = jax.lax.cond(do_update, apply, hold, None)
        return new_state, {
            "loss_sum": loss_sum,
            "aux_sum": aux_sum,
            "correct_sum": correct_sum,
            "count": n,
        }

    @partial(
        jax.jit,
        in_shardings=(rep,),
        out_shardings=rep,
        donate_argnums=(0,) if donate else (),
    )
    def apply_pending(state: TrainState):
        return jax.lax.cond(
            state.acc_count > 0,
            lambda _: _apply(state.grad_acc, state.acc_count, state),
            lambda _: state,
            None,
        )

    return step, apply_pending


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


class BucketBatcher:
    """Group a bag stream per bucket size into mesh-batch-sized groups.

    One owner for the grouping policy shared by sharded evaluation
    (``evaluation/dp_eval.py``) and data-parallel training
    (``train/loops.py::train_epoch_dp``): bags group by their bucket (so
    every group compiles one SPMD program), a group flushes when it reaches
    ``batch`` bags, and device-resident pending bytes stay bounded — when
    the total exceeds ``max(budget_bytes, batch * largest-bag-bytes)`` the
    byte-heaviest partial group flushes early (some padded compute, bounded
    HBM regardless of bucket count and bag size).
    """

    def __init__(self, batch: int, budget_bytes: int = 1 << 31):
        self.batch = batch
        self.budget_bytes = budget_bytes
        self._groups: dict[int, list] = {}
        self._max_bag_bytes = 1

    @staticmethod
    def _bytes(group) -> int:
        return sum(b.patches.nbytes for b, _ in group)

    def add(self, bag, index: int) -> list[list]:
        """Add ``(bag, index)``; returns groups that must flush now."""
        self._max_bag_bytes = max(self._max_bag_bytes, bag.patches.nbytes)
        group = self._groups.setdefault(bag.bucket, [])
        group.append((bag, index))
        if len(group) == self.batch:
            self._groups[bag.bucket] = []
            return [group]
        if sum(map(self._bytes, self._groups.values())) > max(
            self.budget_bytes, self.batch * self._max_bag_bytes
        ):
            heaviest = max(self._groups, key=lambda k: self._bytes(self._groups[k]))
            group = self._groups[heaviest]
            self._groups[heaviest] = []
            return [group]
        return []

    def drain(self) -> list[list]:
        """Remaining partial groups, in first-seen bucket order."""
        out = [g for g in self._groups.values() if g]
        self._groups = {}
        return out


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
