"""Fold-ensemble MCDO: pool MC-dropout samples across independently trained
models (e.g. the k cross-validation fold checkpoints).

Beyond-reference capability (the reference evaluates fold models one at a
time, ``/root/reference/cross_val_eval.py:100-138`` / ``infer.py:131-187``,
and never combines them): deep-ensemble + MCDO is the standard stronger
uncertainty baseline, and the CV workflow already produces the members.  The
TPU-native form is purely functional — member parameter trees stack into one
pytree with a leading member axis, and one compiled program maps the
existing :func:`~montecarlo_gated_mil_tpu.mcdo.sampling.mc_inference` over
it.  Members run under ``lax.map`` (sequential) rather than ``vmap``: a
single 256-instance bag already saturates a chip (docs/PERFORMANCE.md,
"batching bags does not help"), so member-parallelism buys nothing while
multiplying live embed intermediates by M.

The pooled ``(M * T, C)`` samples drop straight into
:func:`~montecarlo_gated_mil_tpu.mcdo.sampling.predictive_stats` /
:func:`attention_stats` — the predictive distribution then mixes epistemic
spread across members with per-member MC-dropout spread.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.mcdo.sampling import MCOutputs, mc_head

Array = jax.Array


def stack_params(params_list) -> dict:
    """Stack structurally identical parameter pytrees along a new leading
    member axis (the functional-JAX ensemble representation)."""
    if len(params_list) == 0:
        raise ValueError("ensemble needs at least one member")
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *params_list
    )


def _member_forward(model, params, patches, mask, num_samples, member_key):
    """One ensemble member's embed + T MC head passes (shared by the
    single-device and member-sharded forms so they stay bit-identical)."""
    h = model.apply({"params": params}, patches, mask, method="embed")
    out = mc_head(model, {"params": params}, h, mask, num_samples, member_key)
    return out.predictions, out.attention


def ensemble_mc_inference(
    model,
    stacked_params,
    patches: Array,
    mask: Array | None,
    num_samples: int,
    key: Array,
) -> MCOutputs:
    """MC inference pooled over ensemble members.

    ``stacked_params``: a pytree whose leaves carry a leading member axis M
    (from :func:`stack_params`).  Each member embeds the bag with its own
    backbone and runs ``num_samples`` MC-dropout head passes under an
    independent PRNG stream (``fold_in(key, member)``), so the total
    predictive sample count is ``M * num_samples``.

    Returns :class:`MCOutputs` with ``predictions (M*T, C)`` raw logits and
    ``attention (M*T, C, N)``, ordered member-major (member 0's T samples
    first) — the same contract as ``mc_inference`` with a larger T.
    ``aux_losses`` is always None (ensembles are an inference-time tool).
    """
    m = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]

    def one_member(args):
        params, member_key = args
        return _member_forward(model, params, patches, mask, num_samples, member_key)

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(m))
    Y, A = jax.lax.map(one_member, (stacked_params, keys))
    # (M, T, C) / (M, T, C, N) -> member-major pooled samples
    return MCOutputs(
        predictions=Y.reshape((-1,) + Y.shape[2:]),
        attention=A.reshape((-1,) + A.shape[2:]),
        aux_losses=None,
    )


def load_fold_ensemble(cfg, manifest: dict, *, template=None, ckpt=None) -> dict:
    """Stacked parameters from a CV manifest's fold checkpoints.

    ``manifest`` is ``run_cross_validation``'s output (or
    ``load_cv_manifest``'s merge); every fold entry's checkpoint is restored
    against an initialized template and stacked in fold order.  The members
    must share the manifest's model config (they do by construction — CV
    builds one model per fold from the same config).  Callers that already
    built the restore machinery pass ``template``/``ckpt`` to skip the
    redundant model build + init jit (e.g. ``viz.infer.run_inference``).
    """
    from montecarlo_gated_mil_tpu.train.state import Checkpointer

    if template is None:
        from montecarlo_gated_mil_tpu.experiment import build_model
        from montecarlo_gated_mil_tpu.runners import init_params

        template = init_params(build_model(cfg), jax.random.key(cfg.seed))
    if ckpt is None:
        ckpt = Checkpointer(cfg.model_path)
    members = [
        ckpt.restore_params(entry["checkpoint"], template)
        for entry in sorted(manifest["folds"], key=lambda e: e["fold"])
    ]
    return stack_params(members)


def ensemble_mc_inference_sharded(
    model,
    stacked_params,
    patches: Array,
    mask: Array | None,
    num_samples: int,
    key: Array,
    mesh,
    axis: str = "data",
) -> MCOutputs:
    """Member-sharded ensemble MC inference over a device mesh.

    Members are embarrassingly parallel (each embeds the replicated bag with
    its own parameters; per-bag masked BN statistics are member-local, so no
    cross-shard collectives are needed) — sharding the member axis over
    ``mesh.shape[axis]`` devices scales near-linearly.  Per-member PRNG keys
    fold in the GLOBAL member index, so results match the single-device
    :func:`ensemble_mc_inference` for the same key regardless of mesh shape.

    Requires the mesh axis size to divide the member count (e.g. 8 members
    on 4 devices = 2 per device).  When it doesn't — the canonical 5-fold
    ensemble on an 8-device mesh — use the unsharded form or a smaller mesh
    axis; do NOT pad with repeated members, which would weight the pooled
    predictive distribution toward the repeats.
    """
    from jax.sharding import PartitionSpec as P

    m = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    size = mesh.shape[axis]
    if m % size:
        raise ValueError(f"member count {m} not divisible by {axis}={size}")
    local_m = m // size

    def block(params_blk, patches_in, mask_in, key_in):
        shard = jax.lax.axis_index(axis)

        def one_member(args):
            params, j = args
            member_key = jax.random.fold_in(key_in[0], shard * local_m + j)
            return _member_forward(
                model, params, patches_in, mask_in, num_samples, member_key
            )

        return jax.lax.map(one_member, (params_blk, jnp.arange(local_m)))

    f = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    Y, A = f(stacked_params, patches, mask, key[None])
    return MCOutputs(
        predictions=Y.reshape((-1,) + Y.shape[2:]),
        attention=A.reshape((-1,) + A.shape[2:]),
        aux_losses=None,
    )
