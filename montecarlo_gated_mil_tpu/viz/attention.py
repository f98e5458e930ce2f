"""Attention-map reconstruction: bag attention -> full-resolution maps.

Capability spec (``/root/reference/image_patcher.py:83-110``): paint each
instance's attention back over its tile rectangle, average overlaps, then
normalize by the per-(pass, class) maximum.

TPU-native design: the reference loops over patches on the host.  Because
tiles form a regular (row, col) grid of equal rectangles, the paint-back is
**separable**: scatter attention onto the tile grid ``(T, C, R, S)``, then

    map[t, c, y, x] = sum_{r,s} RowMask[y, r] * a_grid[t, c, r, s] * ColMask[x, s]

— two small 0/1 membership matmuls that run on the MXU, no loop, no host.
Overlap counts use the same contraction with a 0/1 grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_gated_mil_tpu.ops.patching import TileGrid

Array = jax.Array


def _membership(points: np.ndarray, size: int, patch: int) -> np.ndarray:
    """0/1 matrix M[pixel, tile_row]: pixel covered by that row's rectangle."""
    m = np.zeros((size, len(points)), np.float32)
    for j, p in enumerate(points):
        m[p : p + patch, j] = 1.0
    return m


def membership_matrices(grid: TileGrid) -> tuple[np.ndarray, np.ndarray]:
    """(RowMask (H, R), ColMask (W, S)) for a tile grid."""
    tiles = grid.tiles_array()
    ys = np.unique(tiles[:, 0])
    xs = np.unique(tiles[:, 1])
    return (
        _membership(ys, grid.height, grid.patch_size),
        _membership(xs, grid.width, grid.patch_size),
    )


def _reconstruct_body(
    attention: Array,  # (T, C, N)
    tile_indices: Array,  # (N,)
    mask: Array,  # (N,) bool
    row_m: Array,  # (H, R)
    col_m: Array,  # (W, S)
    n_rows: int,
    n_cols: int,
) -> Array:
    t, c, n = attention.shape
    rows = tile_indices // n_cols
    cols = tile_indices % n_cols
    att = jnp.where(mask, attention, 0.0)
    a_grid = jnp.zeros((t, c, n_rows, n_cols), attention.dtype)
    a_grid = a_grid.at[:, :, rows, cols].add(att, mode="drop")
    ones = jnp.zeros((n_rows, n_cols), jnp.float32).at[rows, cols].add(
        mask.astype(jnp.float32), mode="drop"
    )
    maps = jnp.einsum("hr,tcrs,ws->tchw", row_m, a_grid, col_m)
    counts = jnp.einsum("hr,rs,ws->hw", row_m, ones, col_m)
    maps = maps / jnp.maximum(counts, 1.0)
    peak = jnp.max(maps, axis=(-2, -1), keepdims=True)
    return maps / jnp.where(peak > 0, peak, 1.0)


_reconstruct = partial(jax.jit, static_argnames=("n_rows", "n_cols"))(
    _reconstruct_body
)


def _box_mean(maps: Array, factor: int) -> Array:
    """Exact box-average downsample of ``(..., H, W)`` by ``factor``.

    Two 1-D ``reduce_window`` passes (a reshape-based block reduction on
    the lane axis measures ~4x slower on TPU — Mosaic relayout); zero
    padding with per-axis true-pixel counts keeps partial edge windows an
    exact mean over the pixels they actually cover.
    """
    if factor == 1:
        return maps
    h, w = maps.shape[-2], maps.shape[-1]
    nd = maps.ndim

    def pool(x, axis, size):
        window = [1] * nd
        strides = [1] * nd
        window[axis] = strides[axis] = factor
        pad = [(0, 0)] * nd
        pad[axis] = (0, -size % factor)
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, window, strides, pad
        )

    sums = pool(pool(maps, -2, h), -1, w)
    ch = pool(jnp.ones((1,) * (nd - 2) + (h, 1), maps.dtype), -2, h)
    cw = pool(jnp.ones((1,) * (nd - 2) + (1, w), maps.dtype), -1, w)
    return sums / (ch * cw)


@partial(jax.jit, static_argnames=("n_rows", "n_cols", "factor", "ddof"))
def _map_stats(attention, tile_indices, mask, row_m, col_m, n_rows, n_cols,
               factor, ddof):
    maps = _reconstruct_body(
        attention, tile_indices, mask, row_m, col_m, n_rows, n_cols
    )
    mean = jnp.mean(maps, axis=0)
    std = (
        jnp.std(maps, axis=0, ddof=ddof)
        if maps.shape[0] > ddof
        else jnp.zeros_like(mean)
    )
    return _box_mean(mean, factor), _box_mean(std, factor)


def attention_map_stats(
    attention: Array,
    tile_indices: Array,
    mask: Array,
    grid: TileGrid,
    *,
    downsample: int = 1,
    ddof: int = 1,
) -> tuple[Array, Array]:
    """Per-class (mean, std-over-T) attention maps, optionally box-averaged
    down by ``downsample`` — one jitted program, so serving requests avoid
    eager post-jit ops (each costs an op-by-op compile on cold runtimes).

    Full-resolution maps are 2x~158 MB f32 at production size (~35 s to
    fetch through the tunneled runtime); ``downsample=8`` ships the same
    information for a viewer at 1/64 the bytes.  The downsampled map is the
    exact box mean of the full-resolution one (asserted in
    tests/test_serve.py).  ``std`` uses ddof=1, the torch convention the
    reference's figure path follows (``/root/reference/infer.py:212-219``).
    """
    if downsample < 1:
        raise ValueError(f"downsample must be >= 1, got {downsample}")
    tiles = grid.tiles_array()
    n_rows = len(np.unique(tiles[:, 0]))
    n_cols = len(np.unique(tiles[:, 1]))
    row_m, col_m = membership_matrices(grid)
    return _map_stats(
        attention, tile_indices, mask, jnp.asarray(row_m), jnp.asarray(col_m),
        n_rows, n_cols, downsample, ddof,
    )


def reconstruct_attention_maps(
    attention: Array, tile_indices: Array, mask: Array, grid: TileGrid
) -> Array:
    """``(T, C, N)`` attention -> ``(T, C, H, W)`` maps (per-pass/class
    max-normalized, overlap-averaged; padded slots contribute nothing)."""
    tiles = grid.tiles_array()
    n_rows = len(np.unique(tiles[:, 0]))
    n_cols = len(np.unique(tiles[:, 1]))
    row_m, col_m = membership_matrices(grid)
    return _reconstruct(
        attention,
        tile_indices,
        mask,
        jnp.asarray(row_m),
        jnp.asarray(col_m),
        n_rows,
        n_cols,
    )


@partial(jax.jit, static_argnames=("height", "width"))
def _reconstruct_image(
    patches: Array,  # (N, p, p, C)
    starts: Array,  # (N, 2) y, x
    mask: Array,  # (N,)
    height: int,
    width: int,
) -> Array:
    c = patches.shape[-1]
    p = patches.shape[1]

    def body(carry, inp):
        canvas, counts = carry
        patch, start, valid = inp
        v = valid.astype(patches.dtype)
        cur = jax.lax.dynamic_slice(canvas, (start[0], start[1], 0), (p, p, c))
        canvas = jax.lax.dynamic_update_slice(
            canvas, cur + patch * v, (start[0], start[1], 0)
        )
        cur_n = jax.lax.dynamic_slice(counts, (start[0], start[1], 0), (p, p, 1))
        counts = jax.lax.dynamic_update_slice(
            counts, cur_n + v, (start[0], start[1], 0)
        )
        return (canvas, counts), None

    canvas = jnp.zeros((height, width, c), patches.dtype)
    counts = jnp.zeros((height, width, 1), patches.dtype)
    (canvas, counts), _ = jax.lax.scan(body, (canvas, counts), (patches, starts, mask))
    return canvas / jnp.maximum(counts, 1.0)


def reconstruct_image_from_patches(
    patches: Array, tile_indices: Array, mask: Array, grid: TileGrid
) -> Array:
    """Overlap-averaged image reconstruction
    (spec: ``image_patcher.py:62-80``), NHWC."""
    tiles = jnp.asarray(grid.tiles_array()[:, :2])
    starts = tiles[tile_indices]
    return _reconstruct_image(patches, starts, mask, grid.height, grid.width)
