"""Gated-Attention MIL models (single-head and multi-head), TPU-native.

Capability spec (math, not code, from the reference):

- Single-head GA-MIL: ``softmax(w^T (tanh(V H) * sigmoid(U H)))`` attention
  with dropout inside the V/U branches, K attention heads pooled and fed to
  one classifier (``/root/reference/model.py:24-85``).
- Multi-head GA-MIL (the flagship): one attention head and one bias-free
  linear classifier per class, shared or per-class V/U gates, attention
  dropout applied to the **pre-softmax logits**, auxiliary
  attention-separation loss between the positive and negative heads
  (``/root/reference/model.py:134-253,405-438``).

TPU-native design decisions:

- Models operate on **one bag** ``(N, ...)`` with a validity mask; batching
  over bags is an outer ``jax.vmap`` (keeps the reference's per-bag BN
  semantics and lets XLA fuse everything into one program).
- The per-class Python loop of the reference (``model.py:221-235``) becomes a
  stacked class axis contracted with ``einsum`` — one MXU matmul for all
  heads at once.
- ``embed`` (ResNet features, expensive) and ``head`` (dropout -> gate ->
  masked softmax -> pool -> classify, cheap) are separate methods so Monte
  Carlo dropout vmaps T copies of ``head`` over PRNG keys while the features
  are computed once (see ``mcdo/``).
- Softmax over instances is **masked**: padded slots get exactly zero
  attention and contribute nothing to pooling or the auxiliary loss.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.models.resnet import feature_dim, make_backbone
from montecarlo_gated_mil_tpu.ops.masked import masked_softmax

Array = jax.Array


def pairwise_distance(x: Array, y: Array, eps: float = 1e-6) -> Array:
    """Euclidean distance with torch's ``F.pairwise_distance`` epsilon
    semantics (eps added to the difference before the norm), reduced over the
    last axis."""
    return jnp.sqrt(jnp.sum(jnp.square(x - y + eps), axis=-1))


def cosine_similarity(x: Array, y: Array, eps: float = 1e-8) -> Array:
    """Cosine similarity over the last axis with torch's norm clamping."""
    nx = jnp.maximum(jnp.linalg.norm(x, axis=-1), eps)
    ny = jnp.maximum(jnp.linalg.norm(y, axis=-1), eps)
    return jnp.sum(x * y, axis=-1) / (nx * ny)


def auxiliary_loss(
    pos_attention: Array,
    neg_attention: Array,
    is_positive: Array,
    *,
    loss_type: str = "pairwise",
    margin: float = 1.0,
) -> Array:
    """Attention-separation loss (spec: ``/root/reference/model.py:405-438``).

    Pushes the positive and negative heads' attention apart on positive bags
    and together on negative bags.  Vectorized over a leading batch axis and
    over a traced ``is_positive`` (the reference branches in Python on
    ``targets.item()``, forcing batch size 1 — ``model.py:243-248``; here it
    is a ``jnp.where``, so any batch size jits).

    Args:
      pos_attention / neg_attention: ``(..., N)`` post-softmax attention
        (padded slots are exactly zero so they cancel in the distance).
      is_positive: ``(...)`` bool per bag.
    Returns per-bag loss ``(...)`` (unscaled; the caller applies the scale,
    matching the reference call-site at ``model.py:245-246``).
    """
    if loss_type == "pairwise":
        d = pairwise_distance(pos_attention, neg_attention)
        pos_branch = jnp.maximum(margin - d, 0.0)
        neg_branch = d
    elif loss_type == "cosine":
        c = cosine_similarity(pos_attention, neg_attention)
        pos_branch = c
        neg_branch = 1.0 - c
    else:
        raise ValueError(f"Unknown auxiliary loss type: {loss_type!r}")
    return jnp.where(is_positive, pos_branch, neg_branch)


def _torch_linear_init(key, shape, dtype):
    """torch ``nn.Linear`` default weight init (kaiming-uniform, a=sqrt(5)),
    for distributional similarity when training from scratch.  ``shape`` is
    ``(..., fan_in, fan_out)``."""
    fan_in = shape[-2]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    def init(key, shape, dtype):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MultiHeadGatedAttentionMIL(nn.Module):
    """Per-class gated-attention MIL with MC-dropout support (flagship model).

    Spec: ``/root/reference/model.py:134-253``.  One gated attention head and
    one bias-free classifier per class; attention dropout on pre-softmax
    logits; optional shared V/U gate.
    """

    num_classes: int = 2
    backbone: str = "r18"
    D: int = 128
    feature_dropout: float = 0.1
    attention_dropout: float = 0.1
    shared_attention: bool = True
    aux_loss_type: str = "pairwise"
    aux_margin: float = 1.0
    aux_scale: float = 0.5
    dtype: Any = jnp.float32
    space_to_depth: bool = False  # exact s2d stem transform (same params)

    @property
    def L(self) -> int:
        return feature_dim(self.backbone)

    def setup(self):
        C, L, D = self.num_classes, self.L, self.D
        self.features = make_backbone(
            self.backbone, dtype=self.dtype, space_to_depth=self.space_to_depth
        )
        gate_shape = (L, D) if self.shared_attention else (C, L, D)
        gate_bias_shape = (D,) if self.shared_attention else (C, D)
        self.w_V = self.param("w_V", _torch_linear_init, gate_shape, jnp.float32)
        self.b_V = self.param("b_V", _torch_bias_init(L), gate_bias_shape, jnp.float32)
        self.w_U = self.param("w_U", _torch_linear_init, gate_shape, jnp.float32)
        self.b_U = self.param("b_U", _torch_bias_init(L), gate_bias_shape, jnp.float32)
        # Per-class attention-weight vectors (reference: ModuleList of
        # Linear(D, 1), model.py:196-198) stacked on a class axis.
        self.w_att = self.param("w_att", _torch_linear_init, (C, D, 1), jnp.float32)
        self.b_att = self.param("b_att", _torch_bias_init(D), (C, 1), jnp.float32)
        # Per-class bias-free classifiers (reference: Linear(L, 1, bias=False),
        # model.py:201-203).
        self.w_cls = self.param("w_cls", _torch_linear_init, (C, L, 1), jnp.float32)
        self.drop_features = nn.Dropout(self.feature_dropout)
        self.drop_attention = nn.Dropout(self.attention_dropout)

    def embed(self, patches: Array, mask: Array | None = None) -> Array:
        """Patch bag ``(N, h, w, 3)`` -> features ``(N, L)`` (the expensive
        pass, run once per bag; reference: ``model.py:212-214``)."""
        return self.features(patches, mask)

    def head(
        self,
        H: Array,
        mask: Array | None = None,
        *,
        train: bool = False,
        mc_dropout: bool = False,
    ) -> tuple[Array, Array]:
        """Features ``(N, L)`` -> logits ``(C,)`` and attention ``(C, N)``.

        ``train`` enables dropout with gradients flowing; ``mc_dropout``
        enables dropout alone (the reference's eval + ``enable_dropout``,
        ``model.py:268-271``).
        """
        stochastic = train or mc_dropout
        Hd = self.drop_features(H, deterministic=not stochastic)
        # Head math in >= f32 (promote a bf16 embed; keep f64 runs f64 —
        # the trajectory-parity tests depend on no demotion here).
        Hd32 = Hd.astype(jnp.promote_types(Hd.dtype, jnp.float32))
        if self.shared_attention:
            V = jnp.tanh(Hd32 @ self.w_V + self.b_V)  # (N, D)
            U = jax.nn.sigmoid(Hd32 @ self.w_U + self.b_U)
            G = V * U
            # (N, D) x (C, D, 1) -> (C, N): all class heads in one contraction.
            logits = jnp.einsum("nd,cdk->ckn", G, self.w_att)[:, 0, :] + self.b_att
        else:
            V = jnp.tanh(jnp.einsum("nl,cld->cnd", Hd32, self.w_V) + self.b_V[:, None, :])
            U = jax.nn.sigmoid(
                jnp.einsum("nl,cld->cnd", Hd32, self.w_U) + self.b_U[:, None, :]
            )
            G = V * U  # (C, N, D)
            logits = jnp.einsum("cnd,cdk->ckn", G, self.w_att)[:, 0, :] + self.b_att
        # Pre-softmax attention dropout (reference model.py:229-232; one mask
        # over (C, N) == independent per-class dropout modules).
        logits = self.drop_attention(logits, deterministic=not stochastic)
        A = masked_softmax(logits, mask if mask is not None else jnp.ones_like(logits, bool))
        M = jnp.einsum("cn,nl->cl", A, Hd32)  # pooled bag embedding per class
        Y = jnp.einsum("cl,clk->ck", M, self.w_cls)[:, 0]  # (C,)
        return Y, A

    def __call__(
        self,
        patches: Array,
        mask: Array | None = None,
        targets: Array | None = None,
        *,
        train: bool = False,
    ) -> tuple[Array, Array, Array | None]:
        """Full forward for one bag (reference ``model.py:211-253``).

        Returns ``(Y (C,), A (C, N), aux_loss or None)``; the auxiliary loss
        is already scaled by ``aux_scale`` as at the reference call site.
        """
        H = self.embed(patches, mask)
        Y, A = self.head(H, mask, train=train)
        aux = None
        if targets is not None:
            aux = self.aux_scale * auxiliary_loss(
                A[1],
                A[0],
                targets == 1,
                loss_type=self.aux_loss_type,
                margin=self.aux_margin,
            )
        return Y, A, aux


class GatedAttentionMIL(nn.Module):
    """Single-head GA-MIL (spec: ``/root/reference/model.py:24-85``).

    K attention heads over one gate, pooled embeddings concatenated into one
    classifier.  Attention dropout lives *inside* the V/U branches (after the
    activations), unlike the multi-head model's pre-softmax logit dropout.
    """

    num_classes: int = 1
    backbone: str = "r18"
    D: int = 128
    K: int = 1
    feature_dropout: float = 0.1
    attention_dropout: float = 0.1
    dtype: Any = jnp.float32

    @property
    def L(self) -> int:
        return feature_dim(self.backbone)

    def setup(self):
        L, D, K = self.L, self.D, self.K
        self.features = make_backbone(self.backbone, dtype=self.dtype)
        self.w_V = self.param("w_V", _torch_linear_init, (L, D), jnp.float32)
        self.b_V = self.param("b_V", _torch_bias_init(L), (D,), jnp.float32)
        self.w_U = self.param("w_U", _torch_linear_init, (L, D), jnp.float32)
        self.b_U = self.param("b_U", _torch_bias_init(L), (D,), jnp.float32)
        self.w_att = self.param("w_att", _torch_linear_init, (D, K), jnp.float32)
        self.b_att = self.param("b_att", _torch_bias_init(D), (K,), jnp.float32)
        self.w_cls = self.param(
            "w_cls", _torch_linear_init, (L * K, self.num_classes), jnp.float32
        )
        self.b_cls = self.param(
            "b_cls", _torch_bias_init(L * K), (self.num_classes,), jnp.float32
        )
        self.drop_features = nn.Dropout(self.feature_dropout)
        self.drop_V = nn.Dropout(self.attention_dropout)
        self.drop_U = nn.Dropout(self.attention_dropout)

    def embed(self, patches: Array, mask: Array | None = None) -> Array:
        return self.features(patches, mask)

    def head(
        self,
        H: Array,
        mask: Array | None = None,
        *,
        train: bool = False,
        mc_dropout: bool = False,
    ) -> tuple[Array, Array]:
        """Features ``(N, L)`` -> ``(Y (num_classes,), A (K, N))``."""
        stochastic = train or mc_dropout
        Hd = self.drop_features(H, deterministic=not stochastic)
        Hd = Hd.astype(jnp.promote_types(Hd.dtype, jnp.float32))  # no f64 demotion
        V = jnp.tanh(Hd @ self.w_V + self.b_V)
        V = self.drop_V(V, deterministic=not stochastic)
        U = jax.nn.sigmoid(Hd @ self.w_U + self.b_U)
        U = self.drop_U(U, deterministic=not stochastic)
        logits = ((V * U) @ self.w_att + self.b_att).T  # (K, N)
        A = masked_softmax(
            logits, mask if mask is not None else jnp.ones_like(logits, bool)
        )
        M = A @ Hd  # (K, L)
        Y = M.reshape(-1) @ self.w_cls + self.b_cls
        return Y, A

    def __call__(
        self,
        patches: Array,
        mask: Array | None = None,
        *,
        train: bool = False,
    ) -> tuple[Array, Array]:
        H = self.embed(patches, mask)
        return self.head(H, mask, train=train)
