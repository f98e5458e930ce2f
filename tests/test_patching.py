"""Tiling geometry and bag-selection semantics (spec:
``/root/reference/image_patcher.py:16-59,115-131``)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.ops.patching import (
    _start_points,
    compute_tile_grid,
    extract_bag_on_device,
    gather_tiles,
    select_tiles,
    tile_fill_scores,
)


def _reference_start_points(size, split, overlap):
    """Direct transcription of the published grid recurrence for golden
    comparison: stride steps, final point snapped to size - split."""
    points = [0]
    stride = int(split * (1 - overlap))
    counter = 1
    while True:
        pt = stride * counter
        if pt + split >= size:
            points.append(size - split)
            break
        points.append(pt)
        counter += 1
    return points


@pytest.mark.parametrize(
    "size,split,overlap",
    [(7036, 224, 0.5), (2800, 224, 0.75), (448, 224, 0.5), (225, 224, 0.0)],
)
def test_start_points_match_reference_recurrence(size, split, overlap):
    assert _start_points(size, split, overlap) == _reference_start_points(
        size, split, overlap
    )


def test_size_equals_patch_single_tile():
    """Intentional divergence (see _start_points docstring): the reference
    emits a duplicated start [0, 0] when a dimension equals the patch size;
    here the border snap is deduped so an exact one-patch image is one tile."""
    assert _start_points(224, 224, 0.5) == [0]
    assert compute_tile_grid(224, 224, 224, 0.5).num_tiles == 1


def test_grid_row_major_and_tile_records():
    g = compute_tile_grid(448, 336, 224, 0.5)
    tiles = g.tiles_array()
    # row-major: y outer, x inner (reference get_tiles loop order)
    assert tiles[0].tolist() == [0, 0, 224, 224, 0, 0]
    assert tiles[1][1] > 0 and tiles[1][0] == 0  # second tile moves in x
    # (i, j) grid coordinates recorded per tile
    n_cols = len(_start_points(336, 224, 0.5))
    assert tiles[n_cols][4] == 1 and tiles[n_cols][5] == 0


def test_full_scale_grid_size():
    # reference-scale mammogram: 7036x2800 @ 224, 50% overlap
    g = compute_tile_grid(7036, 2800, 224, 0.5)
    ys = _reference_start_points(7036, 224, 0.5)
    xs = _reference_start_points(2800, 224, 0.5)
    assert g.num_tiles == len(ys) * len(xs)


def test_fill_scores_percent_nonzero():
    patches = np.zeros((3, 4, 4, 3), np.float32)
    patches[0] = 1.0  # 100%
    patches[1, :2] = 1.0  # 50%
    scores = np.asarray(tile_fill_scores(jnp.asarray(patches)))
    np.testing.assert_allclose(scores, [100.0, 50.0, 0.0])


def test_sat_scores_match_gathered_scores():
    """Integral-image fill scores are exactly the gathered-tile scores,
    including on images with zero (background) regions and snapped border
    tiles."""
    from montecarlo_gated_mil_tpu.ops.patching import tile_fill_scores_sat

    rng = np.random.default_rng(3)
    img = rng.random((150, 110)).astype(np.float32)
    img[:40] = 0.0           # empty top band
    img[:, 80:] = 0.0        # empty right band
    img[60:70, 10:30] = 0.0  # hole
    g = compute_tile_grid(150, 110, 32, 0.5)
    starts = jnp.asarray(g.tiles_array()[:, :2])
    gathered = tile_fill_scores(
        gather_tiles(jnp.asarray(img)[..., None], starts, 32)
    )
    sat = tile_fill_scores_sat(jnp.asarray(img), starts, 32)
    np.testing.assert_allclose(np.asarray(sat), np.asarray(gathered), atol=1e-5)


def test_select_tiles_threshold_and_cap():
    scores = jnp.asarray([10.0, 90.0, 50.0, 95.0, 20.0, 80.0])
    # threshold 0.6 -> three tiles above 60%: ids 3, 1, 5 by fill desc
    idx, mask = select_tiles(scores, bucket=4, empty_threshold=0.6)
    kept = np.asarray(idx)[np.asarray(mask)]
    assert set(kept) == {3, 1, 5}
    assert np.asarray(idx)[:3].tolist() == [3, 1, 5]  # ranked by fill
    # bag_size caps below the threshold count
    idx2, mask2 = select_tiles(scores, bucket=4, empty_threshold=0.6, bag_size=2)
    assert int(mask2.sum()) == 2
    assert set(np.asarray(idx2)[np.asarray(mask2)]) == {3, 1}
    # bucket caps everything
    idx3, mask3 = select_tiles(scores, bucket=2, empty_threshold=0.0)
    assert int(mask3.sum()) == 2


def test_gather_tiles_matches_numpy_crops():
    rng = np.random.default_rng(0)
    img = rng.random((64, 96, 3)).astype(np.float32)
    g = compute_tile_grid(64, 96, 32, 0.5)
    starts = jnp.asarray(g.tiles_array()[:, :2])
    tiles = np.asarray(gather_tiles(jnp.asarray(img), starts, 32))
    for k, (y, x, *_rest) in enumerate(g.tiles):
        np.testing.assert_array_equal(tiles[k], img[y : y + 32, x : x + 32])


def test_extract_bag_respects_bag_size():
    img = jnp.ones((256, 256, 3))
    g = compute_tile_grid(256, 256, 64, 0.0)
    bag = extract_bag_on_device(img, g, bucket=16, empty_threshold=0.5, bag_size=5)
    assert int(bag.num_instances) == 5


class TestDmaGather:
    """Pallas DMA-ring tile gather vs the vmapped dynamic-slice form.

    CPU runs the kernel in interpret mode (same-step copies); the pipelined
    ring + 40x speedup are validated on hardware (docs/PERFORMANCE.md
    §DMA gather, bit-exact equality asserted there too)."""

    @pytest.mark.parametrize(
        "h,w,p,overlap",
        [
            (703, 280, 224, 0.75),  # production-like: border remainders
            (150, 150, 48, 0.5),    # multiple x phases
            (128, 128, 64, 0.0),    # exact grid, no remainders
        ],
    )
    def test_interpret_matches_vmap_gather(self, h, w, p, overlap):
        from montecarlo_gated_mil_tpu.ops.patching import (
            gather_remainders,
            gather_tiles_dma,
            pad_for_dma_gather,
        )

        grid = compute_tile_grid(h, w, p, overlap)
        y_rems, x_rems = gather_remainders(grid)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((h, w), np.float32))
        starts = jnp.asarray(grid.tiles_array()[:, :2])
        want = gather_tiles(img[..., None], starts, p)[..., 0]
        got = gather_tiles_dma(
            pad_for_dma_gather(img, p), starts, p, y_rems, x_rems, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_remainder_phases_and_eligibility(self):
        from montecarlo_gated_mil_tpu.ops.patching import (
            _dma_gather_eligible,
            gather_remainders,
        )

        grid = compute_tile_grid(7036, 2800, 224, 0.75)
        y_rems, x_rems = gather_remainders(grid)
        # stride 56: all starts are multiples of 56 except the border snap
        assert set(y_rems) <= set(range(8)) and 0 in y_rems
        assert all(x % 8 == 0 for x in x_rems)
        assert _dma_gather_eligible(grid, 1)
        assert not _dma_gather_eligible(grid, 3)
        # a stride-19 grid hits every sublane phase: over the branch budget
        dense = compute_tile_grid(300, 260, 48, 0.6)
        assert not _dma_gather_eligible(dense, 1)

    def test_gather_selected_falls_back_off_tpu(self):
        from montecarlo_gated_mil_tpu.ops.patching import gather_selected

        grid = compute_tile_grid(128, 128, 64, 0.0)
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((128, 128), np.float32))
        starts = jnp.asarray(grid.tiles_array()[:, :2])
        got = gather_selected(img, starts, 64, grid)  # vmap path on CPU
        want = gather_tiles(img[..., None], starts, 64)[..., 0]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="pipelined DMA ring requires hardware (MCGMIL_TEST_TPU=1)",
    )
    def test_hardware_ring_matches_vmap_gather(self):
        """The cross-step DMA ring (hardware-only; interpret uses same-step
        copies) is bit-exact vs the vmap gather at the production grid."""
        from montecarlo_gated_mil_tpu.ops.patching import gather_selected

        grid = compute_tile_grid(7036, 2800, 224, 0.75)
        rng = np.random.default_rng(0)
        img = jnp.asarray(
            rng.random((7036, 2800), np.float32) ** 2, jnp.bfloat16
        )
        starts = jnp.asarray(grid.tiles_array()[:, :2])[
            jnp.asarray(rng.choice(grid.num_tiles, 256, replace=False))
        ]
        want = gather_tiles(img[..., None], starts, 224)[..., 0]
        got = gather_selected(img, starts, 224, grid)
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(want.astype(jnp.float32)),
        )


def test_blocked_sat_scores_match_plain():
    """Blocked SAT (block = gcd of starts and patch) is exact; production
    and border-snap geometries."""
    from montecarlo_gated_mil_tpu.ops.patching import (
        sat_block_size,
        tile_fill_scores_sat,
    )

    for h, w, p, overlap in [(703, 280, 224, 0.75), (150, 150, 48, 0.5),
                             (128, 128, 64, 0.0)]:
        grid = compute_tile_grid(h, w, p, overlap)
        block = sat_block_size(grid)
        assert block >= 1 and p % block == 0
        tiles = grid.tiles_array()
        assert all(int(v) % block == 0 for v in tiles[:, 0])
        assert all(int(v) % block == 0 for v in tiles[:, 1])
        rng = np.random.default_rng(0)
        img = jnp.asarray((rng.random((h, w)) > 0.4).astype(np.float32))
        starts = jnp.asarray(tiles[:, :2])
        plain = tile_fill_scores_sat(img, starts, p)
        blocked = tile_fill_scores_sat(img, starts, p, block=block)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(blocked))


def test_sat_block_size_production_grid():
    from montecarlo_gated_mil_tpu.ops.patching import sat_block_size

    # stride-56 grid with border snaps at 6812/2576: gcd collapses to 4
    assert sat_block_size(compute_tile_grid(7036, 2800, 224, 0.75)) == 4
    # no border snap: pure multiples of the stride
    assert sat_block_size(compute_tile_grid(448, 448, 224, 0.5)) == 112
