"""Property-based tests (hypothesis) for the framework's core invariants.

The repo-wide invariant is that bags are padded buckets + masks and every
reduction over the instance axis must ignore padded slots exactly
(CLAUDE.md).  The golden tests pin specific values; these pin the
*properties* over randomized inputs:

- masked reductions equal their numpy counterparts on the compacted valid
  subset, and are bitwise-invariant to garbage in padded slots;
- the tile-grid recurrence covers the image and matches the reference
  geometry rules (``/root/reference/image_patcher.py:16-28``);
- SAT fill scoring (with and without block pre-reduction) is exact vs the
  gathered-tile count for arbitrary images and grids;
- ``select_tiles`` keeps exactly the reference's count
  (``image_patcher.py:115-131``) and the highest-fill tiles;
- overlap-averaged reconstruction is the identity on a fully-covered
  image's own tiles;
- int8 kernel quantization round-trips within half a quantization step.

Everything runs eagerly on the CPU backend with small shapes; examples are
capped to keep the fast suite fast.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from montecarlo_gated_mil_tpu.ops import (
    compute_tile_grid,
    gather_tiles,
    masked_mean,
    masked_softmax,
    masked_var,
    select_tiles,
    tile_fill_scores,
    tile_fill_scores_sat,
)
from montecarlo_gated_mil_tpu.ops.patching import sat_block_size

SETTINGS = dict(max_examples=30, deadline=None)


# ---------------------------------------------------------------- helpers


def _rng(seed):
    return np.random.RandomState(seed)


masks = st.integers(0, 2**16 - 1)  # bitmask over up to 16 slots


def _mask_from_bits(bits: int, n: int) -> np.ndarray:
    return np.array([(bits >> i) & 1 for i in range(n)], bool)


# ---------------------------------------------------------------- masked ops


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), bits=masks, n=st.integers(1, 16))
def test_masked_softmax_properties(seed, bits, n):
    r = _rng(seed)
    mask = _mask_from_bits(bits, n)
    logits = r.randn(n).astype(np.float32) * 5
    out = np.asarray(masked_softmax(jnp.asarray(logits), jnp.asarray(mask)))
    # padded slots get EXACTLY zero
    assert np.all(out[~mask] == 0.0)
    if mask.any():
        # valid slots sum to 1 and match softmax over the compacted subset
        assert np.isclose(out.sum(), 1.0, atol=1e-5)
        sub = logits[mask]
        ref = np.exp(sub - sub.max())
        ref /= ref.sum()
        np.testing.assert_allclose(out[mask], ref, rtol=1e-5, atol=1e-6)
    else:
        # all-masked rows return zeros, never NaN
        assert np.all(out == 0.0)
    # bitwise invariance to garbage in padded slots (incl. inf/nan)
    garbage = logits.copy()
    garbage[~mask] = r.choice([1e30, -1e30, np.inf, np.nan], size=(~mask).sum())
    out2 = np.asarray(masked_softmax(jnp.asarray(garbage), jnp.asarray(mask)))
    np.testing.assert_array_equal(out, out2)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), bits=masks.filter(lambda b: b != 0),
       n=st.integers(1, 16))
def test_masked_mean_var_match_numpy_on_valid_subset(seed, bits, n):
    r = _rng(seed)
    mask = _mask_from_bits(bits, n)
    if not mask.any():
        mask[0] = True
    x = (r.randn(n, 3) * 10).astype(np.float32)
    m = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask[:, None]), axis=0))
    v = np.asarray(masked_var(jnp.asarray(x), jnp.asarray(mask[:, None]), axis=0))
    np.testing.assert_allclose(m, x[mask].mean(axis=0), rtol=1e-4, atol=1e-4)
    # ddof=0 (torch BN semantics; CLAUDE.md invariant)
    np.testing.assert_allclose(v, x[mask].var(axis=0, ddof=0), rtol=1e-3, atol=1e-3)
    # garbage invariance
    g = x.copy()
    g[~mask] = 1e20
    m2 = np.asarray(masked_mean(jnp.asarray(g), jnp.asarray(mask[:, None]), axis=0))
    np.testing.assert_array_equal(m, m2)


# ---------------------------------------------------------------- tile grid


grid_sizes = st.tuples(
    st.integers(32, 200),   # height
    st.integers(32, 200),   # width
    st.sampled_from([16, 24, 32]),  # patch
    st.sampled_from([0.0, 0.25, 0.5, 0.75]),  # overlap
).filter(lambda t: t[0] >= t[2] and t[1] >= t[2])


@settings(**SETTINGS)
@given(hw=grid_sizes)
def test_tile_grid_geometry(hw):
    h, w, p, ov = hw
    grid = compute_tile_grid(h, w, p, ov)
    tiles = grid.tiles_array()
    stride = int(p * (1 - ov))
    ys = np.unique(tiles[:, 0])
    xs = np.unique(tiles[:, 1])
    # every tile inside the image; borders covered on both axes
    assert tiles[:, 0].min() == 0 and tiles[:, 1].min() == 0
    assert tiles[:, 0].max() == h - p and tiles[:, 1].max() == w - p
    assert np.all(tiles[:, 0] + p <= h) and np.all(tiles[:, 1] + p <= w)
    # reference recurrence: consecutive starts step by the stride except the
    # final border snap, which never *exceeds* a stride step
    for starts, size in ((ys, h), (xs, w)):
        diffs = np.diff(starts)
        assert np.all(diffs > 0)
        assert np.all(diffs[:-1] == stride)
        assert len(diffs) == 0 or 0 < diffs[-1] <= stride
    # row-major enumeration with dense (i, j) indices
    assert tiles.shape[0] == len(ys) * len(xs)
    np.testing.assert_array_equal(tiles[:, 4], np.repeat(np.arange(len(ys)), len(xs)))
    np.testing.assert_array_equal(tiles[:, 5], np.tile(np.arange(len(xs)), len(ys)))


@settings(max_examples=12, deadline=None)  # per-shape jit: costliest test here
@given(hw=grid_sizes, seed=st.integers(0, 2**31 - 1),
       density=st.floats(0.05, 0.95))
def test_sat_fill_scores_exact_vs_gathered(hw, seed, density):
    h, w, p, ov = hw
    grid = compute_tile_grid(h, w, p, ov)
    starts = jnp.asarray(grid.tiles_array()[:, :2])
    img = (_rng(seed).rand(h, w) < density).astype(np.float32)
    img *= _rng(seed + 1).rand(h, w).astype(np.float32) + 0.01  # nonzero values
    gathered = gather_tiles(jnp.asarray(img)[..., None], starts, p)
    want = np.asarray(tile_fill_scores(gathered))
    got = np.asarray(tile_fill_scores_sat(jnp.asarray(img), starts, p))
    np.testing.assert_allclose(got, want, atol=1e-4)
    block = sat_block_size(grid)
    got_b = np.asarray(
        tile_fill_scores_sat(jnp.asarray(img), starts, p, block=block)
    )
    np.testing.assert_allclose(got_b, want, atol=1e-4)
    # the block must divide every start and the patch (sat_block_size contract)
    assert p % block == 0
    assert all(int(y) % block == 0 and int(x) % block == 0
               for y, x, *_ in grid.tiles)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), k=st.integers(1, 40),
       bucket=st.sampled_from([8, 16]), thresh=st.floats(0.0, 0.9),
       bag_size=st.sampled_from([-1, 3, 8]))
def test_select_tiles_matches_reference_rules(seed, k, bucket, thresh, bag_size):
    scores = (_rng(seed).rand(k) * 100).astype(np.float32)
    idx, mask = select_tiles(jnp.asarray(scores), bucket, thresh, bag_size)
    idx, mask = np.asarray(idx), np.asarray(mask)
    assert idx.shape == (bucket,) and mask.shape == (bucket,)
    # kept count = reference rule: above-threshold, capped by bag_size/bucket
    n_above = int((scores > thresh * 100.0).sum())
    want_n = min(n_above, bucket) if bag_size <= 0 else min(n_above, bucket, bag_size)
    assert mask.sum() == want_n
    # mask is a prefix (rank order) and kept tiles are the top-fill ones
    assert np.all(mask[: want_n]) and not mask[want_n:].any()
    if want_n:
        kept = np.sort(scores[idx[:want_n]])[::-1]
        best = np.sort(scores)[::-1][:want_n]
        np.testing.assert_allclose(kept, best, atol=0)


# ---------------------------------------------------------------- viz


@settings(max_examples=10, deadline=None)
@given(hw=grid_sizes, seed=st.integers(0, 2**31 - 1))
def test_reconstruction_is_identity_on_own_tiles(hw, seed):
    from montecarlo_gated_mil_tpu.viz.attention import (
        reconstruct_image_from_patches,
    )

    h, w, p, ov = hw
    grid = compute_tile_grid(h, w, p, ov)
    img = _rng(seed).rand(h, w, 1).astype(np.float32)
    starts = jnp.asarray(grid.tiles_array()[:, :2])
    patches = gather_tiles(jnp.asarray(img), starts, p)
    n = grid.num_tiles
    rec = reconstruct_image_from_patches(
        patches, jnp.arange(n), jnp.ones((n,), bool), grid
    )
    # overlap-averaging identical pixels is the identity wherever covered;
    # the reference grid always covers the full image (border snap)
    np.testing.assert_allclose(np.asarray(rec), img, atol=1e-5)


# ---------------------------------------------------------------- quantize


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1), scale=st.floats(1e-3, 1e3))
def test_quantize_kernel_roundtrip_bound(seed, scale):
    from montecarlo_gated_mil_tpu.ops.quantized import quantize_kernel

    w = (_rng(seed).randn(3, 3, 4, 8) * scale).astype(np.float32)
    q = quantize_kernel(jnp.asarray(w))
    deq = np.asarray(q["w"], np.float32) * np.asarray(q["s"])
    # error within half a quantization step per output channel
    step = np.asarray(q["s"])
    assert np.all(np.abs(deq - w) <= step[None, None, None, :] * 0.5 + 1e-7)
    # int8 range fully used, never exceeded
    assert np.abs(np.asarray(q["w"], np.int32)).max() <= 127


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
