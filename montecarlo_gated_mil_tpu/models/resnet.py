"""BN-free ResNet backbones (18/34/50) for patch embedding, TPU-native.

Capability spec: the reference embeds every patch with a torchvision ResNet
whose final ``fc`` is replaced by identity (``/root/reference/model.py:41-54``)
and whose BatchNorm layers have running statistics disabled
(``/root/reference/main.py:16-20``), i.e. **BN always normalizes with the
current batch's statistics** — the batch being the N patches of one bag
(batch size is 1, ``/root/reference/config.yml:42``).

TPU-native design decisions (not a translation):

- **NHWC layout** end to end: TPU convolutions tile natively onto the MXU in
  NHWC; the reference's NCHW is a CUDA convention.
- **Masked batch statistics**: bags are padded to fixed buckets (see
  ``core/bag.py``), so BN means/variances are computed only over *valid*
  instances — padded zero-patches contribute nothing, reproducing the
  reference's ragged-batch statistics exactly on the valid prefix.
- **Per-bag statistics**: the reference always sees one bag per batch, so its
  BN stats are per-bag. Callers batch over bags with ``jax.vmap``, which
  keeps that semantic under a single compiled program.
- **Mixed precision**: convolutions run in a configurable ``compute_dtype``
  (bfloat16 feeds the MXU at full rate); BN statistics and the residual adds
  accumulate in float32 for stability and parity.
- No running-average machinery exists at all — there is nothing to
  "deactivate"; stateless batch statistics are the only mode.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# Feature dimension produced by each backbone (torchvision parity:
# fc.in_features; /root/reference/model.py:53).
FEATURE_DIMS = {"r18": 512, "r34": 512, "r50": 2048}


class MaskedBatchStatsNorm(nn.Module):
    """BatchNorm that always uses current (masked) batch statistics.

    Equivalent to torch BatchNorm2d after the reference's
    ``deactivate_batchnorm`` (``/root/reference/main.py:16-20``): no running
    stats, learned affine, eps 1e-5, biased variance. ``mask`` (over the
    leading instance axis) excludes padded instances from the statistics.

    ``axis_name``: when the instance axis is sharded across chips under
    ``shard_map`` (oversized-bag embed, the MIL analogue of sequence
    parallelism — SURVEY.md §5 long-context), statistics reduce over the
    named mesh axis with a ``psum`` of (masked sum, masked sum-of-squares,
    valid count), so every shard normalizes with the *whole bag's* moments —
    the reference's per-bag semantics, preserved across chips.
    """

    eps: float = 1e-5
    param_dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None) -> Array:
        c = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones_init(), (c,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (c,), self.param_dtype
        )
        red_axes = tuple(range(x.ndim - 1))  # all but channel
        # Statistics in >= float32 (bfloat16 inputs are promoted; float64
        # parity runs keep their precision).
        stats_dtype = jnp.promote_types(x.dtype, jnp.float32)
        xf = x.astype(stats_dtype)
        if self.axis_name is not None:
            # Cross-shard moments: local masked sums, one fused psum.
            if mask is None:
                m = jnp.ones(xf.shape[:1] + (1,) * (xf.ndim - 1), stats_dtype)
            else:
                m = mask.astype(stats_dtype).reshape(
                    mask.shape + (1,) * (x.ndim - mask.ndim)
                )
            n_valid = jnp.sum(m)
            s1 = jnp.sum(xf * m, axis=red_axes)
            s2 = jnp.sum(jnp.square(xf) * m, axis=red_axes)
            s1, s2, n_valid = jax.lax.psum((s1, s2, n_valid), self.axis_name)
            count = jnp.maximum(n_valid * (xf[0].size // c), 1.0)
            mean = s1 / count
            var = s2 / count - jnp.square(mean)
            xf = xf * jnp.minimum(n_valid, 1.0)
        elif mask is None:
            mean = jnp.mean(xf, axis=red_axes)
            var = jnp.mean(jnp.square(xf), axis=red_axes) - jnp.square(mean)
        else:
            # mask: (N,) over the leading axis; weight every pixel of an
            # instance identically.
            m = mask.astype(stats_dtype).reshape(
                mask.shape + (1,) * (x.ndim - mask.ndim)
            )
            n_valid = jnp.sum(m)
            count = jnp.maximum(n_valid * (xf[0].size // c), 1.0)
            mean = jnp.sum(xf * m, axis=red_axes) / count
            var = jnp.sum(jnp.square(xf) * m, axis=red_axes) / count - jnp.square(
                mean
            )
            # Degenerate all-masked bag: zero the output instead of
            # amplifying by rsqrt(eps) at every layer (which overflows
            # through a deep net).  Downstream attention masks make the
            # result unused either way; this keeps it finite.
            xf = xf * jnp.minimum(n_valid, 1.0)
        inv = jax.lax.rsqrt(var + self.eps)
        # Affines in the stats dtype: promotes bf16, but never DEMOTES a
        # float64 run (an astype(float32) here costs ~1e-8 per layer, which
        # the f64 trajectory-parity tests would amplify chaotically).
        y = (xf - mean) * inv * scale.astype(stats_dtype) + bias.astype(stats_dtype)
        return y.astype(x.dtype)


def _conv(
    features: int, kernel: int, stride: int, pad: int, dtype, name: str
) -> nn.Conv:
    """torch-geometry Conv2d: explicit symmetric padding, no bias."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (r18/r34 block)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array, mask: Array | None) -> Array:
        residual = x
        y = _conv(self.features, 3, self.stride, 1, self.dtype, "conv1")(x)
        y = MaskedBatchStatsNorm(name="bn1", axis_name=self.bn_axis_name)(y, mask)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, 1, self.dtype, "conv2")(y)
        y = MaskedBatchStatsNorm(name="bn2", axis_name=self.bn_axis_name)(y, mask)
        if residual.shape != y.shape:
            residual = _conv(self.features, 1, self.stride, 0, self.dtype, "downsample_conv")(x)
            residual = MaskedBatchStatsNorm(name="downsample_bn", axis_name=self.bn_axis_name)(residual, mask)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 (x4 expansion) block (r50)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array, mask: Array | None) -> Array:
        out_features = self.features * self.expansion
        residual = x
        y = _conv(self.features, 1, 1, 0, self.dtype, "conv1")(x)
        y = MaskedBatchStatsNorm(name="bn1", axis_name=self.bn_axis_name)(y, mask)
        y = nn.relu(y)
        y = _conv(self.features, 3, self.stride, 1, self.dtype, "conv2")(y)
        y = MaskedBatchStatsNorm(name="bn2", axis_name=self.bn_axis_name)(y, mask)
        y = nn.relu(y)
        y = _conv(out_features, 1, 1, 0, self.dtype, "conv3")(y)
        y = MaskedBatchStatsNorm(name="bn3", axis_name=self.bn_axis_name)(y, mask)
        if residual.shape != y.shape:
            residual = _conv(out_features, 1, self.stride, 0, self.dtype, "downsample_conv")(x)
            residual = MaskedBatchStatsNorm(name="downsample_bn", axis_name=self.bn_axis_name)(residual, mask)
        return nn.relu(y + residual)


def s2d_stem_kernel(w7: Array) -> Array:
    """``(7, 7, C, 64)`` stem kernel → the exact ``(4, 4, 4C, 64)`` kernel
    of its space-to-depth form (derivation in :class:`SpaceToDepthStem`).

    Single source of truth for the rearrangement: the quantized int8 stem
    (``ops/quantized.py``) and the profiling harness reuse it — the channel
    grouping here MUST stay in lockstep with :func:`s2d_input`.
    """
    c = w7.shape[2]
    w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    return (
        w8.reshape(4, 2, 4, 2, c, 64)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * c, 64)
    )


def s2d_input(x: Array) -> Array:
    """``(N, H, W, C)`` → ``(N, H/2, W/2, 4C)`` 2×2 space-to-depth with the
    channel order matching :func:`s2d_stem_kernel`."""
    n, h, w, c = x.shape
    return (
        x.reshape(n, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 4 * c)
    )


class SpaceToDepthStem(nn.Module):
    """Exact transform of the 7x7-stride-2 stem conv into a 4x4-stride-1
    conv over 2x2 space-to-depth input (the MLPerf ResNet TPU optimization):
    large-spatial/small-channel convolutions are HBM-bound on TPU, and the
    s2d form moves the same arithmetic into a better-shaped contraction.

    The parameter keeps the torchvision ``(7, 7, 3, 64)`` layout — porting
    and checkpoints are unchanged; the kernel is rearranged at trace time.
    Derivation: out[o] = sum_k x[2o + k - 3] w7[k]  ==  sum_{k'} x[2o + k' - 4]
    w8[k'] with w8 = zero-pad w7 at the leading edge, which regroups into a
    4-tap stride-1 conv over s2d pairs with padding (2, 1).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        if h % 2 or w % 2:
            raise ValueError(f"space-to-depth stem needs even H, W; got {h}x{w}")
        w7 = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, c, 64), jnp.float32
        )
        wk = s2d_stem_kernel(w7).astype(self.dtype)
        x2 = s2d_input(x)
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype),
            wk,
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNetFeatures(nn.Module):
    """Headless ResNet: ``(N, H, W, 3) -> (N, L)`` global-pooled features.

    ``mask`` (N,) marks valid instances; BN statistics ignore padded ones.
    Architecture matches torchvision's stem/stage layout so that weights can
    be ported 1:1 (see ``models/port.py``).  ``space_to_depth=True`` swaps
    the stem conv for its exact s2d-transformed equivalent (same parameters,
    same math; faster on TPU for 224px inputs).
    """

    stage_sizes: Sequence[int]
    block_cls: type
    dtype: Any = jnp.float32
    space_to_depth: bool = False
    # Named mesh axis the instance dimension is sharded over (inside
    # shard_map): BN statistics then psum across shards.  None = local.
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None) -> Array:
        x = x.astype(self.dtype)
        if self.space_to_depth:
            x = SpaceToDepthStem(dtype=self.dtype, name="conv1")(x)
        else:
            x = _conv(64, 7, 2, 3, self.dtype, "conv1")(x)
        x = MaskedBatchStatsNorm(name="bn1", axis_name=self.bn_axis_name)(x, mask)
        x = nn.relu(x)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = self.block_cls(
                    features=64 * 2**stage,
                    stride=stride,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_{block}",
                )(x, mask)
        # Global average pool (torch AdaptiveAvgPool2d(1)); accumulate in
        # >= f32 (promote bf16, keep f64 — see MaskedBatchStatsNorm note).
        x = jnp.mean(x.astype(jnp.promote_types(x.dtype, jnp.float32)), axis=(1, 2))
        return x


_CONFIGS: dict[str, tuple[Sequence[int], type]] = {
    "r18": ((2, 2, 2, 2), BasicBlock),
    "r34": ((3, 4, 6, 3), BasicBlock),
    "r50": ((3, 4, 6, 3), Bottleneck),
}


def make_backbone(
    name: str,
    dtype: Any = jnp.float32,
    space_to_depth: bool = False,
    bn_axis_name: str | None = None,
) -> ResNetFeatures:
    """Backbone factory mirroring the reference's r18/r34/r50 switch
    (``/root/reference/model.py:42-50``).  ``bn_axis_name`` builds the
    instance-sharded variant (identical parameters; BN stats psum over the
    named mesh axis) for oversized-bag embedding under ``shard_map``."""
    if name not in _CONFIGS:
        raise ValueError(f"backbone must be one of {sorted(_CONFIGS)}, got {name!r}")
    sizes, block = _CONFIGS[name]
    return ResNetFeatures(
        stage_sizes=sizes, block_cls=block, dtype=dtype,
        space_to_depth=space_to_depth, bn_axis_name=bn_axis_name,
    )


def feature_dim(name: str) -> int:
    """L for a backbone. Note: the reference hardcodes L=512 and would crash
    for r50 (its own TODO at ``/root/reference/model.py:159``); here L follows
    the backbone (2048 for r50) — documented divergence."""
    if name not in FEATURE_DIMS:
        raise ValueError(f"unknown backbone {name!r}")
    return FEATURE_DIMS[name]
