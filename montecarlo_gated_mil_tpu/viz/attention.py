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


@partial(jax.jit, static_argnames=("n_rows", "n_cols"))
def _reconstruct(
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
