"""Bag abstraction: padded fixed-size instance buckets with validity masks.

The reference feeds ragged bags — one ``(1, N, C, H, W)`` tensor per mammogram
with data-dependent N (``/root/reference/model.py:211-216``) — which forces
batch-size 1 and, under XLA, would trigger one recompile per distinct N.
Here a bag is a pytree of *static-shape* arrays: instances padded to a bucket
size drawn from a small registry, plus a boolean validity mask that every
downstream op (BatchNorm statistics, attention softmax, pooling, MC variance)
respects, so padded instances contribute exactly nothing.
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Bag:
    """One bag (or a leading-batched stack of bags) of image patches.

    Attributes:
      patches: ``(..., Nmax, ph, pw, C)`` float array, NHWC per instance
        (TPU-native layout; the reference uses NCHW at dataset.py:68-73).
        Padded slots hold zeros.
      mask: ``(..., Nmax)`` bool; True for real instances.
      label: ``(...,)`` int32; 1 iff class in {Malignant, Lymph_nodes}
        (reference: dataset.py:48).
      tile_indices: ``(..., Nmax)`` int32 row index into the tile grid for each
        instance (reference 'tiles_indices' metadata, dataset.py:73); padded
        slots hold 0 and must be read through ``mask``.
    """

    patches: jax.Array
    mask: jax.Array
    label: jax.Array
    tile_indices: jax.Array

    @property
    def num_instances(self) -> jax.Array:
        """Number of real instances (per bag if batched)."""
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @property
    def bucket(self) -> int:
        """Static padded size Nmax."""
        return self.patches.shape[-4]


@dataclass(frozen=True)
class BucketSpec:
    """Registry of allowed padded bag sizes.

    Bounds the number of distinct XLA programs: every bag is padded to the
    smallest bucket >= its instance count, so at most ``len(sizes)`` compiled
    variants exist per function (vs. one per distinct N in the reference).
    """

    sizes: tuple[int, ...] = (64, 128, 256, 512, 1024)

    def __post_init__(self):
        if not self.sizes:
            raise ValueError("BucketSpec needs at least one size")
        if list(self.sizes) != sorted(set(self.sizes)):
            raise ValueError(f"bucket sizes must be strictly increasing: {self.sizes}")

    def bucket_for(self, n: int) -> int:
        """Smallest bucket >= n; the largest bucket caps oversized bags."""
        if n <= 0:
            return self.sizes[0]
        i = bisect.bisect_left(self.sizes, n)
        return self.sizes[min(i, len(self.sizes) - 1)]

    def extended_bucket(self, n: int, multiple_of: int = 1) -> int:
        """Padded size for an OVERSIZED bag (``n > max_size``) that must not
        be truncated: the smallest multiple of ``lcm(max_size, multiple_of)``
        >= n.  Quantizing to ``max_size`` bounds the number of distinct XLA
        programs oversized bags can create (ceil(grid_tiles / max_size)
        variants at most); ``multiple_of`` additionally makes the size
        divisible by the instance-sharding mesh extent so
        ``parallel/instance.py`` can split it evenly across chips.  The
        reference keeps every above-threshold tile when ``bag_size`` is -1
        (``/root/reference/image_patcher.py:115-131``, ``config.yml:30-32``);
        this is the static-shape equivalent.
        """
        q = math.lcm(self.max_size, max(1, multiple_of))
        return -(-max(n, 1) // q) * q

    @property
    def max_size(self) -> int:
        return self.sizes[-1]


def pad_to_bucket(
    patches: np.ndarray,
    tile_indices: np.ndarray,
    label: int,
    bucket: int,
) -> Bag:
    """Pad host-side ragged instances ``(n, ph, pw, C)`` into a :class:`Bag`.

    If ``n > bucket`` the first ``bucket`` instances are kept (callers rank
    instances by fill fraction first, mirroring the reference's top-fill
    selection at image_patcher.py:115-126, so truncation drops the emptiest).
    """
    n = patches.shape[0]
    keep = min(n, bucket)
    ph, pw, c = patches.shape[1:]
    out = np.zeros((bucket, ph, pw, c), dtype=patches.dtype)
    out[:keep] = patches[:keep]
    idx = np.zeros((bucket,), dtype=np.int32)
    idx[:keep] = tile_indices[:keep]
    mask = np.zeros((bucket,), dtype=bool)
    mask[:keep] = True
    return Bag(
        patches=jnp.asarray(out),
        mask=jnp.asarray(mask),
        label=jnp.asarray(label, dtype=jnp.int32),
        tile_indices=jnp.asarray(idx),
    )


def stack_bags(bags: Sequence[Bag]) -> Bag:
    """Stack same-bucket bags along a new leading batch axis."""
    buckets = {b.bucket for b in bags}
    if len(buckets) != 1:
        raise ValueError(f"cannot stack bags from different buckets: {buckets}")
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *bags)
