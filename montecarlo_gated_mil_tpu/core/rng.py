"""PRNG-key plumbing.

The reference achieves reproducibility by globally seeding four RNGs and
forcing deterministic CUDA kernels (``/root/reference/main.py:43-54``).  JAX
is functionally pure: determinism comes free once every random op receives an
explicit key.  This module provides the small amount of structure needed to
derive independent, reproducible streams for data order, dropout, and the T
Monte-Carlo samples from one integer seed.
"""

from __future__ import annotations

from typing import Iterator

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def named_key(key: jax.Array, name: str) -> jax.Array:
    """Derive a stream key from a human-readable name (stable across runs)."""
    return jax.random.fold_in(key, _name_to_int(name))


def _name_to_int(name: str) -> int:
    # FNV-1a 32-bit: stable, dependency-free string hash (Python's hash() is
    # salted per process and would break run-to-run determinism).
    h = 0x811C9DC5
    for byte in name.encode():
        h = ((h ^ byte) * 0x01000193) & 0xFFFFFFFF
    return h


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    return jax.random.fold_in(key, epoch)


def mc_keys(key: jax.Array, n: int) -> jax.Array:
    """n independent keys for the T Monte-Carlo dropout samples."""
    return jax.random.split(key, n)


def key_iter(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys (host-side convenience for loops)."""
    count = 0
    while True:
        yield jax.random.fold_in(key, count)
        count += 1
