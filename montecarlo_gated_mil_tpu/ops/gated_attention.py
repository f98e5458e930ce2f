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

# The kernel keeps the whole (N, L) bag VMEM-resident across the T-grid, so
# its working set grows linearly in N and hits the 16M scoped-vmem stack
# between N=4096 (compiles, measured) and N=6144 (XLA refuses: "Scoped
# allocation with size 18.33M and limit 16.00M" — tools/measure_hbm.py,
# docs/PERFORMANCE.md §HBM envelope).  4096 is the guaranteed-safe static
# ceiling; eval loops and serving fall back to the jnp head above it.
FUSED_HEAD_MAX_N = 4096

_MASK_FILL = -1e30
_INV_2_24 = float(2.0**-24)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GatedAttentionParams:
    """Multi-head GA parameters in kernel layout; both gate modes.

    Shared gate (``model.py:182-193`` shared branch):
      w_V/w_U: (L, D); b_V/b_U: (D,); w_att: (D, C); b_att: (C,).
    Separate per-class gates (the reference's shipped default,
    ``config.yml:8`` ``shared_att: False``): a leading class axis —
      w_V/w_U: (C, L, D); b_V/b_U: (C, D); w_att: (C, D); b_att: (C,).
    Either way w_cls: (C, L) bias-free per-class classifiers.  The gate
    mode is carried by ``w_V.ndim`` (static under jit).
    """

    w_V: Array
    b_V: Array
    w_U: Array
    b_U: Array
    w_att: Array
    b_att: Array
    w_cls: Array

    @property
    def separate(self) -> bool:
        return self.w_V.ndim == 3

    @staticmethod
    def from_model_params(p: dict) -> "GatedAttentionParams":
        """Convert ``MultiHeadGatedAttentionMIL`` flax params (either gate
        mode; ``w_V.ndim`` distinguishes them)."""
        if p["w_V"].ndim == 3:  # separate per-class gates
            return GatedAttentionParams(
                w_V=p["w_V"],  # (C, L, D)
                b_V=p["b_V"],  # (C, D)
                w_U=p["w_U"],
                b_U=p["b_U"],
                w_att=p["w_att"][:, :, 0],  # (C, D, 1) -> (C, D)
                b_att=p["b_att"][:, 0],  # (C, 1) -> (C,)
                w_cls=p["w_cls"][:, :, 0],  # (C, L, 1) -> (C, L)
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
        if params.separate:
            G = jnp.tanh(
                jnp.einsum("nl,cld->cnd", Hd, params.w_V) + params.b_V[:, None, :]
            ) * jax.nn.sigmoid(
                jnp.einsum("nl,cld->cnd", Hd, params.w_U) + params.b_U[:, None, :]
            )  # (C, N, D)
            logits = (
                jnp.einsum("cnd,cd->cn", G, params.w_att)
                + params.b_att[:, None]
            )  # (C, N)
        else:
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


def _fused_fwd_call(
    seeds, H, mask_f, wv, bv, wu, bu, wa, ba, *, num_samples, p_feat, p_att, interpret
):
    """The forward ``pallas_call`` (T-grid; H and weights VMEM-resident)."""
    n, l = H.shape
    d = wv.shape[-1]
    c = wa.shape[-1]
    kernel = functools.partial(_mc_kernel, p_feat=p_feat, p_att=p_att)
    const = lambda *_: (0, 0)  # noqa: E731 — block constant across the grid
    return pl.pallas_call(
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
    )(seeds, H, mask_f, wv, bv, wu, bu, wa, ba)


def _mc_kernel_sep(
    seed_ref,  # (T,) SMEM int32
    h_ref,  # (N, L) VMEM
    mask_ref,  # (N, 1) VMEM float
    wv_ref,  # (C, L, D)
    bv_ref,  # (C, 1, D)
    wu_ref,  # (C, L, D)
    bu_ref,  # (C, 1, D)
    wa_ref,  # (C, D, 1)
    ba_ref,  # (1, C)
    m_ref,  # (1, C, L) out
    a_ref,  # (1, N, C) out
    *,
    p_feat: float,
    p_att: float,
):
    """Separate-gates variant of ``_mc_kernel``: one V/U gate per class
    (the reference's shipped ``shared_att: False`` configuration,
    ``config.yml:8`` / ``model.py:185-193``).  The per-class logit columns
    are placed into the (N, C) logit matrix with a lane-iota select, after
    which attention dropout / masked softmax / pooling are identical to
    the shared kernel.  Dropout draw order (feature mask, then one (N, C)
    attention mask) matches the shared kernel and the jnp twin."""
    if p_feat > 0.0 or p_att > 0.0:
        pltpu.prng_seed(seed_ref[pl.program_id(0)])
    H = h_ref[:].astype(jnp.float32)
    if p_feat > 0.0:
        keep = (_uniform(H.shape) >= p_feat).astype(jnp.float32)
        H = H * keep * (1.0 / (1.0 - p_feat))
    n = H.shape[0]
    c_dim = wa_ref.shape[0]
    cols = []
    for c in range(c_dim):
        V = jnp.tanh(
            jnp.dot(H, wv_ref[c], preferred_element_type=jnp.float32) + bv_ref[c]
        )
        U = jax.nn.sigmoid(
            jnp.dot(H, wu_ref[c], preferred_element_type=jnp.float32) + bu_ref[c]
        )
        cols.append(
            jnp.dot(V * U, wa_ref[c], preferred_element_type=jnp.float32)
        )  # (N, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, c_dim), 1)
    logits = ba_ref[:]
    for c in range(c_dim):
        logits = logits + jnp.where(lane == c, cols[c], 0.0)
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


def _fused_fwd_call_sep(
    seeds, H, mask_f, wv, bv, wu, bu, wa, ba, *, num_samples, p_feat, p_att, interpret
):
    n, l = H.shape
    c, _, d = wv.shape
    kernel = functools.partial(_mc_kernel_sep, p_feat=p_feat, p_att=p_att)
    c2 = lambda *_: (0, 0)  # noqa: E731
    c3 = lambda *_: (0, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(num_samples,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, l), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, l, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, l, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d, 1), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), c2, memory_space=pltpu.VMEM),
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
            flops=num_samples * (2 * n * l * d * 2 * c + 2 * n * d * c + 2 * c * n * l),
            bytes_accessed=n * l * 4 + num_samples * (c * l * 4 + n * c * 4),
            transcendentals=num_samples * 2 * n * d * c,
        ),
        interpret=interpret,
    )(seeds, H, mask_f, wv, bv, wu, bu, wa, ba)


def _mc_bwd_kernel(
    seed_ref,  # (T,) SMEM int32
    h_ref,  # (N, L) VMEM
    mask_ref,  # (N, 1) VMEM float
    wv_ref,  # (L, D)
    wu_ref,  # (L, D)
    wa_ref,  # (D, C)
    bv_ref,  # (1, D)
    bu_ref,  # (1, D)
    ba_ref,  # (1, C)
    dm_ref,  # (1, C, L) cotangent of pooled M for sample t
    da_ref,  # (1, N, C) cotangent of A for sample t
    dh_ref,  # (N, L) out, accumulated over the T-grid
    dwv_ref,  # (L, D) out
    dbv_ref,  # (1, D) out
    dwu_ref,  # (L, D) out
    dbu_ref,  # (1, D) out
    dwa_ref,  # (D, C) out
    dba_ref,  # (1, C) out
    *,
    p_feat: float,
    p_att: float,
):
    """Backward of one MC sample; grid axis = T, outputs accumulate.

    Re-seeds the hardware PRNG with the sample's forward seed and replays the
    dropout draws **in forward order** (feature mask first, then attention
    mask), so the masks are bit-identical to the forward pass without ever
    materializing them in HBM.  The cheap forward (gate, logits, masked
    softmax) is recomputed from the VMEM-resident H — residuals are just the
    forward's own inputs.
    """
    t = pl.program_id(0)
    if p_feat > 0.0 or p_att > 0.0:
        pltpu.prng_seed(seed_ref[t])
    H = h_ref[:].astype(jnp.float32)
    inv_keep_f = 1.0 / (1.0 - p_feat) if p_feat > 0.0 else 1.0
    if p_feat > 0.0:
        kf = (_uniform(H.shape) >= p_feat).astype(jnp.float32)
        Hd = H * kf * inv_keep_f
    else:
        kf = None
        Hd = H
    V = jnp.tanh(
        jnp.dot(Hd, wv_ref[:], preferred_element_type=jnp.float32) + bv_ref[:]
    )
    U = jax.nn.sigmoid(
        jnp.dot(Hd, wu_ref[:], preferred_element_type=jnp.float32) + bu_ref[:]
    )
    G = V * U
    logits = jnp.dot(G, wa_ref[:], preferred_element_type=jnp.float32) + ba_ref[:]
    inv_keep_a = 1.0 / (1.0 - p_att) if p_att > 0.0 else 1.0
    if p_att > 0.0:
        ka = (_uniform(logits.shape) >= p_att).astype(jnp.float32)
        logits = logits * ka * inv_keep_a
    else:
        ka = None
    m = mask_ref[:]  # (N, 1)
    filled = jnp.where(m > 0.0, logits, _MASK_FILL)
    mx = jnp.max(filled, axis=0, keepdims=True)
    mx = jnp.where(mx <= _MASK_FILL, 0.0, mx)
    e = jnp.where(m > 0.0, jnp.exp(filled - mx), 0.0)
    denom = jnp.sum(e, axis=0, keepdims=True)
    A = e / jnp.where(denom > 0.0, denom, 1.0)  # (N, C)

    dM = dm_ref[0]  # (C, L)
    # A feeds the output and the pooling M = A^T Hd.
    dA = da_ref[0] + jax.lax.dot_general(
        Hd, dM, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, C)
    dHd = jnp.dot(A, dM, preferred_element_type=jnp.float32)  # (N, L)
    # masked-softmax backward (padded rows have A == 0 -> zero gradient)
    s = jnp.sum(dA * A, axis=0, keepdims=True)  # (1, C)
    dlogits = A * (dA - s)  # (N, C)
    if ka is not None:
        dlogits = dlogits * ka * inv_keep_a
    dG = jax.lax.dot_general(
        dlogits, wa_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, D)
    dwa = jax.lax.dot_general(
        G, dlogits, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, C)
    dba = jnp.sum(dlogits, axis=0, keepdims=True)  # (1, C)
    dV = dG * U
    dU = dG * V
    dzv = dV * (1.0 - V * V)
    dzu = dU * U * (1.0 - U)
    dHd = dHd + jax.lax.dot_general(
        dzv, wv_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        dzu, wu_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwv = jax.lax.dot_general(
        Hd, dzv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (L, D)
    dwu = jax.lax.dot_general(
        Hd, dzu, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbv = jnp.sum(dzv, axis=0, keepdims=True)
    dbu = jnp.sum(dzu, axis=0, keepdims=True)
    dH = dHd * kf * inv_keep_f if kf is not None else dHd

    @pl.when(t == 0)
    def _():
        dh_ref[:] = dH
        dwv_ref[:] = dwv
        dbv_ref[:] = dbv
        dwu_ref[:] = dwu
        dbu_ref[:] = dbu
        dwa_ref[:] = dwa
        dba_ref[:] = dba

    @pl.when(t > 0)
    def _():
        dh_ref[:] += dH
        dwv_ref[:] += dwv
        dbv_ref[:] += dbv
        dwu_ref[:] += dwu
        dbu_ref[:] += dbu
        dwa_ref[:] += dwa
        dba_ref[:] += dba


def _fused_bwd_call(
    seeds, H, mask_f, wv, bv, wu, bu, wa, ba, dM, dA,
    *, num_samples, p_feat, p_att, interpret,
):
    n, l = H.shape
    d = wv.shape[-1]
    c = wa.shape[-1]
    kernel = functools.partial(_mc_bwd_kernel, p_feat=p_feat, p_att=p_att)
    const = lambda *_: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(num_samples,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, l), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, l), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, l), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((l, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, l), jnp.float32),
            jax.ShapeDtypeStruct((l, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((l, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=num_samples * (2 * n * l * d * 6 + 2 * n * d * c * 3),
            bytes_accessed=n * l * 4 * 2 + num_samples * (c * l * 4 + n * c * 4),
            transcendentals=num_samples * 2 * n * d,
        ),
        interpret=interpret,
    )(seeds, H, mask_f, wv, wu, wa, bv, bu, ba, dM, dA)


def _mc_bwd_kernel_sep(
    seed_ref,  # (T,) SMEM int32
    h_ref,  # (N, L) VMEM
    mask_ref,  # (N, 1) VMEM float
    wv_ref,  # (C, L, D)
    wu_ref,  # (C, L, D)
    wa_ref,  # (C, D, 1)
    bv_ref,  # (C, 1, D)
    bu_ref,  # (C, 1, D)
    ba_ref,  # (1, C)
    dm_ref,  # (1, C, L)
    da_ref,  # (1, N, C)
    dh_ref,  # (N, L) out, T-grid accumulated
    dwv_ref,  # (C, L, D) out
    dbv_ref,  # (C, 1, D) out
    dwu_ref,  # (C, L, D) out
    dbu_ref,  # (C, 1, D) out
    dwa_ref,  # (C, D, 1) out
    dba_ref,  # (1, C) out
    *,
    p_feat: float,
    p_att: float,
):
    """Backward of one separate-gates MC sample (mirrors ``_mc_bwd_kernel``;
    dropout masks replayed from the per-sample seed in forward draw order)."""
    t = pl.program_id(0)
    if p_feat > 0.0 or p_att > 0.0:
        pltpu.prng_seed(seed_ref[t])
    H = h_ref[:].astype(jnp.float32)
    inv_keep_f = 1.0 / (1.0 - p_feat) if p_feat > 0.0 else 1.0
    if p_feat > 0.0:
        kf = (_uniform(H.shape) >= p_feat).astype(jnp.float32)
        Hd = H * kf * inv_keep_f
    else:
        kf = None
        Hd = H
    n = Hd.shape[0]
    c_dim = wa_ref.shape[0]
    Vs, Us, cols = [], [], []
    for c in range(c_dim):
        V = jnp.tanh(
            jnp.dot(Hd, wv_ref[c], preferred_element_type=jnp.float32) + bv_ref[c]
        )
        U = jax.nn.sigmoid(
            jnp.dot(Hd, wu_ref[c], preferred_element_type=jnp.float32) + bu_ref[c]
        )
        Vs.append(V)
        Us.append(U)
        cols.append(
            jnp.dot(V * U, wa_ref[c], preferred_element_type=jnp.float32)
        )
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, c_dim), 1)
    logits = ba_ref[:]
    for c in range(c_dim):
        logits = logits + jnp.where(lane == c, cols[c], 0.0)
    inv_keep_a = 1.0 / (1.0 - p_att) if p_att > 0.0 else 1.0
    if p_att > 0.0:
        ka = (_uniform(logits.shape) >= p_att).astype(jnp.float32)
        logits = logits * ka * inv_keep_a
    else:
        ka = None
    m = mask_ref[:]
    filled = jnp.where(m > 0.0, logits, _MASK_FILL)
    mx = jnp.max(filled, axis=0, keepdims=True)
    mx = jnp.where(mx <= _MASK_FILL, 0.0, mx)
    e = jnp.where(m > 0.0, jnp.exp(filled - mx), 0.0)
    denom = jnp.sum(e, axis=0, keepdims=True)
    A = e / jnp.where(denom > 0.0, denom, 1.0)  # (N, C)

    dM = dm_ref[0]  # (C, L)
    dA = da_ref[0] + jax.lax.dot_general(
        Hd, dM, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, C)
    dHd = jnp.dot(A, dM, preferred_element_type=jnp.float32)  # (N, L)
    s = jnp.sum(dA * A, axis=0, keepdims=True)
    dlogits = A * (dA - s)  # (N, C)
    if ka is not None:
        dlogits = dlogits * ka * inv_keep_a
    dba = jnp.sum(dlogits, axis=0, keepdims=True)  # (1, C)
    dwvs, dbvs, dwus, dbus, dwas = [], [], [], [], []
    for c in range(c_dim):
        dcol = jnp.where(lane == c, dlogits, 0.0)
        dcol = jnp.sum(dcol, axis=1, keepdims=True)  # (N, 1)
        dG = jax.lax.dot_general(
            dcol, wa_ref[c], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, D)
        dwas.append(
            jax.lax.dot_general(
                Vs[c] * Us[c], dcol, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # (D, 1)
        dV = dG * Us[c]
        dU = dG * Vs[c]
        dzv = dV * (1.0 - Vs[c] * Vs[c])
        dzu = dU * Us[c] * (1.0 - Us[c])
        dHd = dHd + jax.lax.dot_general(
            dzv, wv_ref[c], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            dzu, wu_ref[c], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwvs.append(
            jax.lax.dot_general(
                Hd, dzv, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        dwus.append(
            jax.lax.dot_general(
                Hd, dzu, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        dbvs.append(jnp.sum(dzv, axis=0, keepdims=True))
        dbus.append(jnp.sum(dzu, axis=0, keepdims=True))
    dH = dHd * kf * inv_keep_f if kf is not None else dHd

    @pl.when(t == 0)
    def _():
        dh_ref[:] = dH
        dba_ref[:] = dba
        for c in range(c_dim):
            dwv_ref[c] = dwvs[c]
            dbv_ref[c] = dbvs[c]
            dwu_ref[c] = dwus[c]
            dbu_ref[c] = dbus[c]
            dwa_ref[c] = dwas[c]

    @pl.when(t > 0)
    def _():
        dh_ref[:] += dH
        dba_ref[:] += dba
        for c in range(c_dim):
            dwv_ref[c] += dwvs[c]
            dbv_ref[c] += dbvs[c]
            dwu_ref[c] += dwus[c]
            dbu_ref[c] += dbus[c]
            dwa_ref[c] += dwas[c]


def _fused_bwd_call_sep(
    seeds, H, mask_f, wv, bv, wu, bu, wa, ba, dM, dA,
    *, num_samples, p_feat, p_att, interpret,
):
    n, l = H.shape
    c, _, d = wv.shape
    kernel = functools.partial(_mc_bwd_kernel_sep, p_feat=p_feat, p_att=p_att)
    c2 = lambda *_: (0, 0)  # noqa: E731
    c3 = lambda *_: (0, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(num_samples,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, l), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, l, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, l, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d, 1), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, l), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, l), c2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, l, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, l, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1, d), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d, 1), c3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), c2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, l), jnp.float32),
            jax.ShapeDtypeStruct((c, l, d), jnp.float32),
            jax.ShapeDtypeStruct((c, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((c, l, d), jnp.float32),
            jax.ShapeDtypeStruct((c, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((c, d, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=num_samples * (2 * n * l * d * 6 * c + 2 * n * d * c * 3),
            bytes_accessed=n * l * 4 * 2 + num_samples * (c * l * 4 + n * c * 4),
            transcendentals=num_samples * 2 * n * d * c,
        ),
        interpret=interpret,
    )(seeds, H, mask_f, wv, wu, wa, bv, bu, ba, dM, dA)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_core_sep(
    num_samples, p_feat, p_att, interpret, seeds, H, mask_f, wv, bv, wu, bu, wa, ba
):
    """Separate-gates differentiable core (mirrors ``_fused_core``)."""
    return _fused_fwd_call_sep(
        seeds, H, mask_f, wv, bv, wu, bu, wa, ba,
        num_samples=num_samples, p_feat=p_feat, p_att=p_att, interpret=interpret,
    )


def _fused_core_sep_fwd(
    num_samples, p_feat, p_att, interpret, seeds, H, mask_f, wv, bv, wu, bu, wa, ba
):
    out = _fused_fwd_call_sep(
        seeds, H, mask_f, wv, bv, wu, bu, wa, ba,
        num_samples=num_samples, p_feat=p_feat, p_att=p_att, interpret=interpret,
    )
    return out, (seeds, H, mask_f, wv, bv, wu, bu, wa, ba)


def _fused_core_sep_bwd(num_samples, p_feat, p_att, interpret, res, cotangents):
    import numpy as np

    seeds, H, mask_f, wv, bv, wu, bu, wa, ba = res
    dM, dA = cotangents
    dH, dwv, dbv, dwu, dbu, dwa, dba = _fused_bwd_call_sep(
        seeds, H, mask_f, wv, bv, wu, bu, wa, ba,
        dM.astype(jnp.float32), dA.astype(jnp.float32),
        num_samples=num_samples, p_feat=p_feat, p_att=p_att, interpret=interpret,
    )
    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return (
        dseeds,
        dH.astype(H.dtype),
        jnp.zeros_like(mask_f),
        dwv, dbv, dwu, dbu, dwa, dba,
    )


_fused_core_sep.defvjp(_fused_core_sep_fwd, _fused_core_sep_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_core(
    num_samples, p_feat, p_att, interpret, seeds, H, mask_f, wv, bv, wu, bu, wa, ba
):
    """Differentiable core: ``(pooled (T,C,L), A (T,N,C))`` with a Pallas
    backward that replays the hardware-PRNG dropout masks by re-seeding."""
    return _fused_fwd_call(
        seeds, H, mask_f, wv, bv, wu, bu, wa, ba,
        num_samples=num_samples, p_feat=p_feat, p_att=p_att, interpret=interpret,
    )


def _fused_core_fwd(
    num_samples, p_feat, p_att, interpret, seeds, H, mask_f, wv, bv, wu, bu, wa, ba
):
    out = _fused_fwd_call(
        seeds, H, mask_f, wv, bv, wu, bu, wa, ba,
        num_samples=num_samples, p_feat=p_feat, p_att=p_att, interpret=interpret,
    )
    # Residuals are the forward inputs only; the backward kernel recomputes
    # the cheap intermediates from VMEM-resident H.
    return out, (seeds, H, mask_f, wv, bv, wu, bu, wa, ba)


def _fused_core_bwd(num_samples, p_feat, p_att, interpret, res, cotangents):
    import numpy as np

    seeds, H, mask_f, wv, bv, wu, bu, wa, ba = res
    dM, dA = cotangents
    dH, dwv, dbv, dwu, dbu, dwa, dba = _fused_bwd_call(
        seeds, H, mask_f, wv, bv, wu, bu, wa, ba,
        dM.astype(jnp.float32), dA.astype(jnp.float32),
        num_samples=num_samples, p_feat=p_feat, p_att=p_att, interpret=interpret,
    )
    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)  # int input
    return (
        dseeds,
        dH.astype(H.dtype),
        jnp.zeros_like(mask_f),
        dwv, dbv, dwu, dbu, dwa, dba,
    )


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


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

    Both gate modes: shared V/U gate, and separate per-class gates (the
    reference's shipped ``shared_att: False`` default) — dispatch is static
    on ``params.w_V.ndim``.

    Differentiable: a custom VJP runs a twin Pallas backward kernel that
    re-seeds the hardware PRNG to regenerate the forward's exact dropout
    masks, so mc_validate/training can take the fused path too (gradient
    parity vs the jnp twin tested at dropout 0).

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
    if n > FUSED_HEAD_MAX_N:
        raise ValueError(
            f"bucket size N={n} exceeds the fused head's VMEM ceiling "
            f"({FUSED_HEAD_MAX_N}): the kernel keeps the whole (N, {l}) bag "
            "resident on-core and XLA refuses the scoped-vmem allocation "
            "past ~5.3k tiles (measured: 18.33M needed vs the 16M limit at "
            "N=6144 — docs/PERFORMANCE.md §HBM envelope). Use the jnp head "
            "(mcdo.sampling.mc_head) or instance sharding for bags this "
            "large; eval loops and serving fall back automatically."
        )
    seeds = jnp.asarray(seed, jnp.int32) + jnp.arange(num_samples, dtype=jnp.int32)
    mask_f = mask.astype(jnp.float32)[:, None]
    if params.separate:
        pooled, a = _fused_core_sep(
            num_samples,
            float(feature_dropout),
            float(attention_dropout),
            interpret,
            seeds,
            H,
            mask_f,
            params.w_V.astype(jnp.float32),
            params.b_V[:, None, :].astype(jnp.float32),  # (C, 1, D)
            params.w_U.astype(jnp.float32),
            params.b_U[:, None, :].astype(jnp.float32),
            params.w_att[:, :, None].astype(jnp.float32),  # (C, D, 1)
            params.b_att.reshape(1, -1).astype(jnp.float32),  # (1, C)
        )
        y = jnp.einsum("tcl,cl->tc", pooled, params.w_cls.astype(jnp.float32))
        return y, jnp.transpose(a, (0, 2, 1))
    pooled, a = _fused_core(
        num_samples,
        float(feature_dropout),
        float(attention_dropout),
        interpret,
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
