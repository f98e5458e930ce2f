"""Fused Monte-Carlo gated-attention pooling — the framework's Pallas kernel.

The hot MCDO stage is: T independent passes of

    Hd   = feature_dropout(H)                       # (N, L)
    G    = tanh(Hd Wv + bv) * sigmoid(Hd Wu + bu)   # (N, D)
    lgts = attention_dropout(G Wa + ba)             # (N, C)
    A    = masked_softmax_over_N(lgts)              # (N, C)
    M    = A^T Hd                                   # (C, L)
    Y    = sum(M * Wcls, axis=-1)                   # (C,)

(reference math: ``/root/reference/model.py:256-328``, executed there as a
T-expanded torch batch).  Under plain XLA vmap this materializes the dropped
features ``(T, N, L)`` in HBM (T=30, N=1024, L=512 -> ~60 MB of traffic) and
burns Threefry FLOPs for every mask bit.  This kernel instead:

- keeps ``H`` (<= 2 MB) **resident in VMEM** across the whole T-grid;
- draws dropout masks from the TPU's hardware PRNG (`pltpu.prng_random_bits`)
  seeded per-sample, so no mask tensor ever exists in HBM;
- fuses gate, attention-logit, masked softmax, pooling and classification
  into one pass per sample — HBM traffic is H once in, (Y, A) out.

The pure-jnp twin ``mc_head_reference`` is the numerical spec (and the
autodiff/train path); the kernel is inference-only.  They use different PRNG
streams, so they agree exactly at dropout 0 and statistically otherwise.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_gated_mil_tpu.ops.masked import masked_softmax

Array = jax.Array

_MASK_FILL = -1e30
_INV_2_24 = float(2.0**-24)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GatedAttentionParams:
    """Shared-gate multi-head GA parameters in kernel layout.

    w_V/w_U: (L, D); b_V/b_U: (D,); w_att: (D, C); b_att: (C,);
    w_cls: (C, L) bias-free per-class classifiers.
    """

    w_V: Array
    b_V: Array
    w_U: Array
    b_U: Array
    w_att: Array
    b_att: Array
    w_cls: Array

    @staticmethod
    def from_model_params(p: dict) -> "GatedAttentionParams":
        """Convert ``MultiHeadGatedAttentionMIL`` flax params (shared gate)."""
        if p["w_V"].ndim != 2:
            raise ValueError(
                "the fused kernel supports shared-attention models only "
                f"(w_V must be (L, D), got shape {tuple(p['w_V'].shape)}; "
                "separate per-class gates use the jnp path)"
            )
        return GatedAttentionParams(
            w_V=p["w_V"],
            b_V=p["b_V"],
            w_U=p["w_U"],
            b_U=p["b_U"],
            w_att=p["w_att"][:, :, 0].T,  # (C, D, 1) -> (D, C)
            b_att=p["b_att"][:, 0],  # (C, 1) -> (C,)
            w_cls=p["w_cls"][:, :, 0],  # (C, L, 1) -> (C, L)
        )


def mc_head_reference(
    H: Array,
    mask: Array,
    params: GatedAttentionParams,
    num_samples: int,
    key: Array,
    feature_dropout: float,
    attention_dropout: float,
) -> tuple[Array, Array]:
    """jnp twin of the kernel: T vmapped head passes. Returns
    ``(Y (T, C), A (T, C, N))``."""

    def one(k):
        kf, ka = jax.random.split(k)
        Hd = H.astype(jnp.float32)
        if feature_dropout > 0.0:
            keep = jax.random.bernoulli(kf, 1.0 - feature_dropout, H.shape)
            Hd = jnp.where(keep, Hd / (1.0 - feature_dropout), 0.0)
        G = jnp.tanh(Hd @ params.w_V + params.b_V) * jax.nn.sigmoid(
            Hd @ params.w_U + params.b_U
        )
        logits = (G @ params.w_att + params.b_att).T  # (C, N)
        if attention_dropout > 0.0:
            keep = jax.random.bernoulli(ka, 1.0 - attention_dropout, logits.shape)
            logits = jnp.where(keep, logits / (1.0 - attention_dropout), 0.0)
        A = masked_softmax(logits, mask)
        M = jnp.einsum("cn,nl->cl", A, Hd)
        Y = jnp.sum(M * params.w_cls, axis=-1)
        return Y, A

    return jax.vmap(one)(jax.random.split(key, num_samples))


def _uniform(shape) -> Array:
    """U[0,1) from the hardware PRNG (top 24 bits of uint32).

    The bitcast matters: raw bits may arrive as int32, where ``>> 8`` would
    be an arithmetic shift producing negative values (and a ~50%+p/2
    effective drop rate).
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic can't cast uint32->f32 directly; after the logical shift the top
    # byte is zero, so a bitcast to int32 is value-preserving and castable.
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * _INV_2_24


def _mc_kernel(
    seed_ref,  # (T,) SMEM int32, all per-sample seeds (full array)
    h_ref,  # (N, L) VMEM
    mask_ref,  # (N, 1) VMEM float (1.0 valid / 0.0 padded)
    wv_ref,  # (L, D)
    bv_ref,  # (1, D)
    wu_ref,  # (L, D)
    bu_ref,  # (1, D)
    wa_ref,  # (D, C)
    ba_ref,  # (1, C)
    m_ref,  # (1, C, L) out: pooled bag embedding per class
    a_ref,  # (1, N, C) out
    *,
    p_feat: float,
    p_att: float,
):
    if p_feat > 0.0 or p_att > 0.0:
        # Seed only when dropout is active: keeps the deterministic path
        # runnable under interpret mode on CPU (no prng_seed lowering there).
        pltpu.prng_seed(seed_ref[pl.program_id(0)])
    H = h_ref[:].astype(jnp.float32)
    if p_feat > 0.0:
        keep = (_uniform(H.shape) >= p_feat).astype(jnp.float32)
        H = H * keep * (1.0 / (1.0 - p_feat))
    V = jnp.tanh(
        jnp.dot(H, wv_ref[:], preferred_element_type=jnp.float32) + bv_ref[:]
    )
    U = jax.nn.sigmoid(
        jnp.dot(H, wu_ref[:], preferred_element_type=jnp.float32) + bu_ref[:]
    )
    G = V * U
    logits = jnp.dot(G, wa_ref[:], preferred_element_type=jnp.float32) + ba_ref[:]
    if p_att > 0.0:
        keep = (_uniform(logits.shape) >= p_att).astype(jnp.float32)
        logits = logits * keep * (1.0 / (1.0 - p_att))
    m = mask_ref[:]  # (N, 1)
    filled = jnp.where(m > 0.0, logits, _MASK_FILL)
    mx = jnp.max(filled, axis=0, keepdims=True)
    mx = jnp.where(mx <= _MASK_FILL, 0.0, mx)
    e = jnp.where(m > 0.0, jnp.exp(filled - mx), 0.0)
    denom = jnp.sum(e, axis=0, keepdims=True)
    A = e / jnp.where(denom > 0.0, denom, 1.0)  # (N, C)
    M = jax.lax.dot_general(
        A, H, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C, L)
    m_ref[0] = M
    a_ref[0] = A


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "feature_dropout", "attention_dropout", "interpret"),
)
def mc_gated_attention_fused(
    H: Array,
    mask: Array,
    params: GatedAttentionParams,
    num_samples: int,
    seed: Array,
    feature_dropout: float = 0.1,
    attention_dropout: float = 0.1,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """All T MC samples of the gated-attention head in one Pallas kernel.

    Args:
      H: ``(N, L)`` patch features (any float dtype; compute is f32).
      mask: ``(N,)`` bool validity.
      seed: scalar int32 base seed; sample t uses ``seed + t``.
    Returns ``(Y (T, C) f32, A (T, C, N) f32)`` matching
    ``mc_head_reference`` semantics (different PRNG stream).
    """
    n, l = H.shape
    if n % 8:
        raise ValueError(f"bucket size N={n} must be a multiple of 8 (TPU sublanes)")
    d = params.w_V.shape[-1]
    c = params.w_att.shape[-1]
    seeds = jnp.asarray(seed, jnp.int32) + jnp.arange(num_samples, dtype=jnp.int32)
    mask_f = mask.astype(jnp.float32)[:, None]
    kernel = functools.partial(
        _mc_kernel, p_feat=float(feature_dropout), p_att=float(attention_dropout)
    )
    const = lambda *_: (0, 0)  # noqa: E731 — block constant across the grid
    pooled, a = pl.pallas_call(
        kernel,
        grid=(num_samples,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # all seeds, read by program_id
            pl.BlockSpec((n, l), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, l), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_samples, c, l), jnp.float32),
            jax.ShapeDtypeStruct((num_samples, n, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=num_samples * (2 * n * l * d * 2 + 2 * n * d * c + 2 * c * n * l),
            bytes_accessed=n * l * 4 + num_samples * (c * l * 4 + n * c * 4),
            transcendentals=num_samples * 2 * n * d,
        ),
        interpret=interpret,
    )(
        seeds,
        H,
        mask_f,
        params.w_V.astype(jnp.float32),
        params.b_V.reshape(1, -1).astype(jnp.float32),
        params.w_U.astype(jnp.float32),
        params.b_U.reshape(1, -1).astype(jnp.float32),
        params.w_att.astype(jnp.float32),
        params.b_att.reshape(1, -1).astype(jnp.float32),
    )
    # Tiny per-class projection stays in XLA (fuses into the epilogue).
    y = jnp.einsum("tcl,cl->tc", pooled, params.w_cls.astype(jnp.float32))
    return y, jnp.transpose(a, (0, 2, 1))  # (T, C, N)
