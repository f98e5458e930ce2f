"""Attention-map reconstruction parity vs a direct numpy implementation of
the reference formula, plus figure smoke test."""

import numpy as np
import jax.numpy as jnp

from montecarlo_gated_mil_tpu.mcdo.sampling import predictive_stats
from montecarlo_gated_mil_tpu.ops.patching import compute_tile_grid
from montecarlo_gated_mil_tpu.viz import (
    plot_attention_and_density,
    reconstruct_attention_maps,
    reconstruct_image_from_patches,
)


def _numpy_reference(attention, instance_ids, tiles, h, w):
    """Direct transcription of the reference formula
    (image_patcher.py:83-110): scatter-add, overlap-count divide, then
    per-(pass,class) max normalize."""
    t, c, n = attention.shape
    out = np.zeros((t, c, h, w), np.float32)
    count = np.zeros((h, w), np.float32)
    for item in range(n):
        y, x, dh, dw = tiles[instance_ids[item]][:4]
        out[:, :, y : y + dh, x : x + dw] += attention[:, :, item][..., None, None]
        count[y : y + dh, x : x + dw] += 1
    count = np.where(count == 0, 1, count)
    out = out / count
    peak = out.max(axis=(-2, -1), keepdims=True)
    return out / np.where(peak > 0, peak, 1)


def test_reconstruction_matches_reference_formula():
    rng = np.random.default_rng(0)
    grid = compute_tile_grid(96, 128, 32, 0.5)
    k = grid.num_tiles
    n, t, c = 8, 3, 2
    ids = rng.choice(k, size=n, replace=False).astype(np.int32)
    att = rng.random((t, c, n)).astype(np.float32)
    att /= att.sum(-1, keepdims=True)
    mask = np.ones(n, bool)
    got = np.asarray(
        reconstruct_attention_maps(
            jnp.asarray(att), jnp.asarray(ids), jnp.asarray(mask), grid
        )
    )
    ref = _numpy_reference(att, ids, grid.tiles_array(), 96, 128)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_reconstruction_ignores_padding():
    rng = np.random.default_rng(1)
    grid = compute_tile_grid(64, 64, 32, 0.0)
    ids = np.array([0, 1, 0, 0], np.int32)  # padded slots point at tile 0
    att = rng.random((2, 2, 4)).astype(np.float32)
    mask = np.array([True, True, False, False])
    got = np.asarray(
        reconstruct_attention_maps(
            jnp.asarray(att), jnp.asarray(ids), jnp.asarray(mask), grid
        )
    )
    ref = _numpy_reference(att[:, :, :2], ids[:2], grid.tiles_array(), 64, 64)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_image_reconstruction_overlap_average():
    grid = compute_tile_grid(32, 48, 16, 0.5)
    k = grid.num_tiles
    patches = np.ones((k, 16, 16, 3), np.float32) * 2.0
    ids = np.arange(k, dtype=np.int32)
    mask = np.ones(k, bool)
    img = np.asarray(
        reconstruct_image_from_patches(
            jnp.asarray(patches), jnp.asarray(ids), jnp.asarray(mask), grid
        )
    )
    # constant patches overlap-average back to the constant
    np.testing.assert_allclose(img, 2.0, atol=1e-6)


def test_figure_smoke(tmp_path):
    rng = np.random.default_rng(2)
    stats = predictive_stats(jnp.asarray(rng.normal(size=(10, 2)), jnp.float32))
    path = plot_attention_and_density(
        rng.random((64, 64)),
        rng.random((64, 64)),
        rng.random((64, 64)) * 0.1,
        rng.random((64, 64)),
        rng.random((64, 64)) * 0.1,
        stats,
        title_class="Malignant",
        num_samples=10,
        save_path=str(tmp_path / "fig"),
        dpi=72,
    )
    assert (tmp_path / "fig.png").exists() and (tmp_path / "fig.pdf").exists()
