"""On-device image -> Bag preprocessing pipeline.

Capability spec (``/root/reference/dataset.py:34-77``): per item the reference
(on CPU, in DataLoader worker processes) mirrors right-laterality images to
left, translates by -20 px in x to kill border strips, resizes to the config
H x W, tiles into patches, keeps filled tiles, then per-patch applies random
H/V flips (train) and ImageNet normalization.

TPU-native design: everything after the raw pixel read runs as ONE jitted
XLA program on device — flip, translate, resize, integral-image fill
scoring of every candidate tile (no tile materialization), top-k selection,
a single gather of the selected tiles (vmapped dynamic slices), per-patch
augmentation from an explicit PRNG key, and normalization.  Static shapes:
one compiled program per (image size, grid, bucket) combination.  The reference's unseeded bag
shuffle (``image_patcher.py:131``) is dropped — attention pooling is
permutation-invariant and data order randomness lives in the loader PRNG.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, replace
from functools import partial
from typing import Callable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_gated_mil_tpu.core.bag import Bag, BucketSpec
from montecarlo_gated_mil_tpu.data.records import BagRecord
from montecarlo_gated_mil_tpu.ops.patching import (
    TileGrid,
    _dma_gather_eligible,
    compute_tile_grid,
    gather_selected,
    gather_tiles,
    pad_for_dma_gather,
    sat_block_size,
    select_tiles,
    tile_fill_scores_sat,
)

# ImageNet statistics (reference transforms, /root/reference/utils.py:48).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
BORDER_TRANSLATE_PX = 20  # reference dataset.py:66


@dataclass(frozen=True)
class PipelineConfig:
    """Static preprocessing parameters (hashable; keys one XLA program)."""

    height: int
    width: int
    patch_size: int = 224
    overlap: float = 0.5
    empty_threshold: float = 0.75
    bag_size: int = -1
    bucket: int = 256
    augment: bool = False  # train-time random per-patch H/V flips
    # Storage dtype of the emitted patches.  The backbone casts to its
    # compute dtype on entry, so 'bfloat16' here is value-identical for
    # bf16 models while halving bag HBM footprint and host->device bytes.
    dtype: str = "float32"

    def grid(self) -> TileGrid:
        return compute_tile_grid(self.height, self.width, self.patch_size, self.overlap)


def canonicalize_image(
    image: jax.Array, flip_horizontal: jax.Array, out_hw: tuple[int, int]
) -> jax.Array:
    """Laterality mirror + border translate + resize, on device.

    image: ``(H, W)`` grayscale in [0, 1].  ``flip_horizontal``: traced bool
    (True for right-laterality, reference ``dataset.py:62-64``).  The -20 px
    x-translate shifts content left and zero-fills the right edge
    (reference ``dataset.py:66``).  Resize is total (the reference's
    ``and``-joined condition at ``dataset.py:43`` skips single-axis
    mismatches — a documented bug; the intended semantics is resize-on-any-
    mismatch, and resizing to the same size is the identity).
    """
    img = jnp.where(flip_horizontal, image[:, ::-1], image)
    # translate=(-20, 0): content moves LEFT by 20 px — the left-edge film
    # strips leave the frame, the right edge zero-fills.
    img = jnp.pad(img, ((0, 0), (0, BORDER_TRANSLATE_PX)))[:, BORDER_TRANSLATE_PX:]
    if img.shape != out_hw:
        img = jax.image.resize(img, out_hw, method="bilinear", antialias=True)
    return img


def stack_multimodal(img_cc: jax.Array, img_mlo: jax.Array) -> jax.Array:
    """Vertical MLO-over-CC composite (reference ``dataset.py:101``)."""
    return jnp.concatenate([img_mlo, img_cc], axis=0)


@partial(jax.jit, static_argnames=("cfg",))
def image_to_bag(
    image: jax.Array,
    flip_horizontal: jax.Array,
    label: jax.Array,
    key: jax.Array,
    starts: jax.Array,
    cfg: PipelineConfig,
) -> Bag:
    """Full on-device pipeline: grayscale image -> augmented, normalized Bag.

    Fill scores are computed on raw (pre-normalization) pixels as in the
    reference (tiling happens before transforms, ``dataset.py:68-71``).
    """
    img = canonicalize_image(image, flip_horizontal, (cfg.height, cfg.width))
    # On the DMA-gather path, pad once up front and run BOTH the fill
    # scoring and the gather on the padded image — the pad is zeros beyond
    # every tile window, so SAT counts are unchanged, and the gather's own
    # ~39 MB pad copy disappears from the hot path (round-2 ROADMAP item 2).
    grid = cfg.grid()
    dma = jax.default_backend() == "tpu" and _dma_gather_eligible(grid, 1)
    if dma:
        img = pad_for_dma_gather(img, cfg.patch_size)
    # Candidate tiles are scored via the integral image (exact, no tile
    # materialization — ops/patching.py::tile_fill_scores_sat); only the
    # selected bucket is ever gathered, single-channel.  RGB replication
    # happens in the final normalize broadcast (channels differ only by the
    # ImageNet affine).
    scores = tile_fill_scores_sat(
        img, starts, cfg.patch_size, block=sat_block_size(grid)
    )
    idx, mask = select_tiles(scores, cfg.bucket, cfg.empty_threshold, cfg.bag_size)
    # (bucket, p, p, 1); on TPU the gather is the Pallas DMA-ring kernel
    # (ops/patching.py::gather_selected, 40x the XLA dynamic-slice form).
    patches = gather_selected(
        img, starts[idx], cfg.patch_size, grid, image_padded=dma
    )[..., None]
    if cfg.augment:
        kh, kv = jax.random.split(key)
        flip_h = jax.random.bernoulli(kh, 0.5, (cfg.bucket,))
        flip_v = jax.random.bernoulli(kv, 0.5, (cfg.bucket,))
        patches = jnp.where(flip_h[:, None, None, None], patches[:, :, ::-1], patches)
        patches = jnp.where(flip_v[:, None, None, None], patches[:, ::-1, :], patches)
    mean = jnp.asarray(IMAGENET_MEAN, patches.dtype)
    std = jnp.asarray(IMAGENET_STD, patches.dtype)
    patches = (patches - mean) / std  # (bucket, p, p, 1) -> (bucket, p, p, 3)
    patches = jnp.where(mask[:, None, None, None], patches, 0.0)
    patches = patches.astype(jnp.dtype(cfg.dtype))
    return Bag(
        patches=patches,
        mask=mask,
        label=jnp.asarray(label, jnp.int32),
        tile_indices=jnp.where(mask, idx, 0),
    )


@partial(jax.jit, static_argnames=("cfg",))
def count_valid_tiles(
    image: jax.Array, flip_horizontal: jax.Array, starts: jax.Array,
    cfg: PipelineConfig,
) -> jax.Array:
    """Number of tiles a bag would keep (fill > threshold, capped at
    bag_size) — used to pick the smallest sufficient bucket per bag."""
    img = canonicalize_image(image, flip_horizontal, (cfg.height, cfg.width))
    scores = tile_fill_scores_sat(
        img, starts, cfg.patch_size, block=sat_block_size(cfg.grid())
    )
    n = jnp.sum((scores > cfg.empty_threshold * 100.0).astype(jnp.int32))
    if cfg.bag_size > 0:
        n = jnp.minimum(n, cfg.bag_size)
    return n


# Generous second margin for the estimator's uncertainty band: a bucket
# decision that flips between ``margin`` and ``margin_hi`` is borderline —
# the stride-4 subsample could be hiding enough fill to cross a boundary
# (content-affecting: a too-small bucket drops tiles via top-k selection).
# Callers resolve the band with an exact device count (loader) or by taking
# the larger bucket (serving, padding-only cost).
ESTIMATE_MARGIN_HI = 0.10


def estimate_valid_tiles(
    image: np.ndarray,
    flip: bool,
    starts: np.ndarray,
    cfg: PipelineConfig,
    *,
    subsample: int = 4,
    margin: float = 0.03,
    margin_hi: float | None = None,
) -> int | tuple[int, int] | None:
    """Host-side conservative estimate of :func:`count_valid_tiles`.

    Serving needs the per-request bucket *before* dispatching the jitted
    program, and a device-side count costs a blocking scalar readback (~25 ms
    tunnel RTT on this runtime).  This estimator reproduces the fill metric
    on the host from a stride-``subsample`` pixel subsample (a summed-area
    table over the subsampled nonzero map; ~5 ms at the 7036x2800 production
    size vs ~200 ms for a full-resolution host pass), counting tiles whose
    estimated fill exceeds ``empty_threshold - margin``.

    The ``margin`` makes the estimate overshoot on borderline tiles, so the
    chosen bucket is almost always >= the exact count's.  A subsample can
    still undershoot in principle (nonzeros concentrated off the sample
    grid), so callers that make content-affecting decisions from the count
    pass ``margin_hi`` (typically :data:`ESTIMATE_MARGIN_HI`) to ALSO get a
    generous-margin count back as ``(n, n_hi)`` — computed from the same
    fill pass, ~free.  When the two counts land on different bucket
    decisions the subsample is untrustworthy for this image: resolve with
    the exact device count (loader) or round up (serving).

    Returns None when ``image.shape`` differs from the pipeline size (the
    canonical path would resize; the subsampled geometry no longer maps) —
    callers then skip adaptivity instead of paying a device sync.
    """
    arr = np.asarray(image)
    if arr.shape != (cfg.height, cfg.width):
        return None
    d = subsample
    while cfg.patch_size % d:
        d -= 1
    # Mirror canonicalize_image's flip-then-translate on free numpy views:
    # canonical pixel (y, x) is view[y, x] with the right edge zero-filled.
    view = arr[:, ::-1] if flip else arr
    view = view[:, BORDER_TRANSLATE_PX:]
    nz = view[::d, ::d] != 0
    sat = np.zeros((nz.shape[0] + 1, nz.shape[1] + 1), np.int32)
    sat[1:, 1:] = nz.cumsum(0, dtype=np.int32).cumsum(1)
    pb = cfg.patch_size // d
    starts = np.asarray(starts)
    y0 = np.minimum(np.round(starts[:, 0] / d).astype(np.int64), nz.shape[0])
    x0 = np.minimum(np.round(starts[:, 1] / d).astype(np.int64), nz.shape[1])
    # Clipping the window to the translated view is exact: the canonical
    # image is zero there, so the truncated window holds the same count.
    y1 = np.minimum(y0 + pb, nz.shape[0])
    x1 = np.minimum(x0 + pb, nz.shape[1])
    counts = sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0]
    fill = counts / float(pb * pb)
    # Thresholds clamp at zero: a sampled-all-zero tile never counts
    # (mammogram background is exact zero), but ANY sampled fill keeps a
    # tile once the margin exceeds the threshold.  Both margins clamp the
    # same way, so for tiny empty_thresholds n == n_hi instead of the
    # unclamped n permanently exceeding n_hi (which would force the
    # band-ambiguity fallback on every single bag).
    n = int(np.sum(fill > max(cfg.empty_threshold - margin, 0.0)))
    if cfg.bag_size > 0:
        n = min(n, cfg.bag_size)
    if margin_hi is None:
        return n
    n_hi = int(np.sum(fill > max(cfg.empty_threshold - margin_hi, 0.0)))
    if cfg.bag_size > 0:
        n_hi = min(n_hi, cfg.bag_size)
    return n, n_hi


class BagLoader:
    """Host loop: read raw pixels, run the on-device pipeline, prefetch.

    Replaces the reference's 8-process ``DataLoader`` (``utils.py:96-116``):
    the per-tile Python work that forced multiprocessing there runs on the
    TPU here, so the host only decodes files.  A background thread keeps
    ``prefetch`` bags in flight so device work overlaps the next read;
    ``io_workers > 1`` additionally fans the raw reads (file IO + DICOM
    decode) over a thread pool — the counterpart of the reference's
    ``num_workers`` (``config.yml:43``), threads sufficing because the
    decoder is C and releases the GIL.  Device-side pipeline dispatch stays
    on one thread either way; yielded order is always the epoch order.

    ``reader`` maps a :class:`BagRecord` to a grayscale float image (or a
    (CC, MLO) pair in multimodal mode) in [0, 1].

    With ``bucket_spec`` set, the loader picks the smallest registry bucket
    that fits each bag's valid-tile count (a host-side subsampled fill
    estimate — no device work on the hot path — then the per-bucket extract
    program) instead of always padding to ``cfg.bucket`` — sparse mammograms
    then skip most of the padded embedding compute.  XLA program count stays
    bounded by ``len(bucket_spec.sizes)`` per stage.  Data-parallel
    evaluation groups bags per bucket before stacking
    (``evaluation/dp_eval.py``), so mixed buckets compose with sharded eval.

    ``oversized`` controls bags whose valid-tile count exceeds ``cfg.bucket``
    (the reference keeps EVERY above-threshold tile when ``bag_size`` is -1,
    ``/root/reference/image_patcher.py:115-131``): ``'extend'`` (default)
    pads them to a quantized extended bucket (``BucketSpec.extended_bucket``,
    divisible by the local device count so evaluation can instance-shard
    them); ``'truncate'`` caps at ``cfg.bucket``, dropping the lowest-fill
    tiles — with a warning and a ``truncated_bags`` counter, never silently.
    """

    def __init__(
        self,
        records: Sequence[BagRecord],
        reader: Callable[[BagRecord], np.ndarray | tuple[np.ndarray, np.ndarray]],
        cfg: PipelineConfig,
        *,
        multimodal: bool = False,
        seed: int = 0,
        shuffle: bool = False,
        sample_order: np.ndarray | None = None,
        sample_weights: Sequence[float] | None = None,
        prefetch: int = 2,
        io_workers: int = 1,
        bucket_spec: "BucketSpec | None" = None,
        oversized: str = "extend",
    ):
        if sample_order is not None and sample_weights is not None:
            raise ValueError("pass sample_order or sample_weights, not both")
        if io_workers < 1:
            raise ValueError(f"io_workers must be >= 1, got {io_workers}")
        if oversized not in ("extend", "truncate"):
            raise ValueError(
                f"oversized must be 'extend' or 'truncate', got {oversized!r}"
            )
        self.records = list(records)
        self.reader = reader
        self.cfg = cfg
        self.multimodal = multimodal
        self.seed = seed
        self.shuffle = shuffle
        self.sample_order = sample_order
        self.sample_weights = sample_weights
        self.prefetch = prefetch
        self.io_workers = io_workers
        self.bucket_spec = bucket_spec
        self.oversized = oversized
        self.truncated_bags = 0  # bags that lost tiles under 'truncate'
        self._warned_truncation = False
        self._starts_np = cfg.grid().tiles_array()[:, :2]
        self._starts = jnp.asarray(self._starts_np)
        self._num_candidates = cfg.grid().num_tiles

    def __len__(self) -> int:
        if self.sample_order is not None:
            return len(self.sample_order)
        return len(self.records)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        if self.sample_order is not None:
            return np.asarray(self.sample_order)
        if self.sample_weights is not None:
            # Fresh with-replacement draw every epoch, like the reference's
            # WeightedRandomSampler (/root/reference/utils.py:217, redrawn by
            # the DataLoader at each epoch); epoch folds into the seed.
            from montecarlo_gated_mil_tpu.data.splits import weighted_sample_order

            return weighted_sample_order(
                self.sample_weights, len(self.records), self.seed + epoch
            )
        order = np.arange(len(self.records))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        return order

    def _make_bag(self, i: int, epoch: int, raw=None) -> tuple[Bag, BagRecord]:
        from dataclasses import replace as dc_replace

        from montecarlo_gated_mil_tpu.data.records import PixelData

        rec = self.records[i]
        if raw is None:  # io_workers > 1 pre-reads in the pool
            raw = self.reader(rec)
        if isinstance(raw, PixelData):
            # DICOM readers carry header metadata: the ImageLaterality tag
            # supersedes the table heuristic (reference dataset.py:57,62) and
            # patient_id/age enrich the yielded record (dataset.py:51-64).
            meta = raw.meta
            if meta is not None:
                rec = dc_replace(
                    rec,
                    laterality=getattr(meta, "laterality", "") or rec.laterality,
                    patient_id=getattr(meta, "patient_id", "") or rec.patient_id,
                    age=meta.age if getattr(meta, "age", -1) >= 0 else rec.age,
                )
            raw = raw.images if len(raw.images) > 1 else raw.images[0]
        if self.multimodal:
            cc, mlo = raw
            image = np.concatenate([np.asarray(mlo), np.asarray(cc)], axis=0)
        else:
            image = np.asarray(raw)
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(self.seed), epoch), i
        )
        img = jnp.asarray(image, jnp.float32)
        flip = jnp.asarray(rec.laterality == "R")
        cfg = replace(self.cfg, bucket=self._pick_bucket(image, rec, img, flip))
        bag = image_to_bag(img, flip, rec.label, key, self._starts, cfg)
        return bag, rec

    def _pick_bucket(self, image: np.ndarray, rec, img, flip) -> int:
        """Per-bag bucket from a host-side valid-tile estimate.

        No blocking device readback on the hot path: the subsampled-SAT
        estimator (:func:`estimate_valid_tiles`, ~5 ms at production size,
        margin-safe) replaces the exact device count the round-3 loader
        paid ~25 ms tunnel RTT per bag for; the exact count is only used
        when the image shape mismatches the pipeline (the resize path,
        where the subsampled geometry no longer maps) or when the bucket
        decision flips inside the estimator's uncertainty band (rare,
        content-affecting either way — never truncate on a guess).
        """
        cfg = self.cfg
        # Can this bag even exceed the cap?  Only when the grid offers more
        # candidates than the cap bucket and bag_size doesn't already cap
        # below it (positive bag_size <= bucket mirrors the reference cap,
        # image_patcher.py:127-128).
        may_overflow = self._num_candidates > cfg.bucket and (
            cfg.bag_size <= 0 or cfg.bag_size > cfg.bucket
        )
        if self.bucket_spec is None and not may_overflow:
            return cfg.bucket
        est = estimate_valid_tiles(
            image, rec.laterality == "R", self._starts_np, cfg,
            margin_hi=ESTIMATE_MARGIN_HI,
        )
        if est is None:
            n = int(count_valid_tiles(img, flip, self._starts, cfg))
        else:
            n, n_hi = est
            if self._decide(n, may_overflow) != self._decide(n_hi, may_overflow):
                # Borderline bag: the subsample could be hiding enough fill
                # to cross a bucket boundary — content-affecting, a too-small
                # bucket drops tiles via top-k.  Pay the exact device count
                # (~25 ms once; typical bags never land in the band).
                n = int(count_valid_tiles(img, flip, self._starts, cfg))
        bucket, overflowed = self._decide(n, may_overflow)
        if overflowed and self.oversized != "extend":
            self.truncated_bags += 1
            if not self._warned_truncation:
                self._warned_truncation = True
                import warnings

                warnings.warn(
                    f"bag with ~{n} valid tiles truncated to bucket "
                    f"{cfg.bucket} (lowest-fill tiles dropped; "
                    "tpu.oversized_bags='truncate'); set "
                    "oversized_bags='extend' to keep every tile",
                    stacklevel=3,
                )
        return bucket

    def _decide(self, n: int, may_overflow: bool) -> tuple[int, bool]:
        """Map a valid-tile count to ``(bucket, overflowed)`` under the
        loader's oversize policy — pure, so ``_pick_bucket`` can compare the
        decision at two estimator margins."""
        cfg = self.cfg
        if may_overflow and n > cfg.bucket:
            if self.oversized == "extend":
                spec = self.bucket_spec or BucketSpec((cfg.bucket,))
                # Divisible by the local device count so the oversized bag
                # can instance-shard across the mesh (parallel/instance.py).
                mult = jax.device_count() if jax.process_count() == 1 else 1
                return spec.extended_bucket(n, multiple_of=mult), True
            return cfg.bucket, True
        if self.bucket_spec is not None:
            return min(self.bucket_spec.bucket_for(n), cfg.bucket), False
        return cfg.bucket, False

    def epoch(self, epoch: int = 0) -> Iterator[tuple[Bag, BagRecord]]:
        """Yield ``(Bag, record)`` with background prefetch."""
        order = self._epoch_order(epoch)
        q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
        stop = object()

        def produce_serial():
            for i in order:
                q.put(self._make_bag(int(i), epoch))

        def produce_pooled():
            # Raw reads (file IO + DICOM decode, the host-side cost — a
            # compressed mammogram is ~260 ms) fan out over a thread pool,
            # order-preserving with a bounded in-flight window; the
            # device-side pipeline stays on this single thread.  The
            # reference gets the same concurrency from its num_workers=8
            # DataLoader processes (/root/reference/utils.py:99,
            # config.yml:43); threads suffice here because the decoder is
            # C (ctypes releases the GIL).
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.io_workers) as ex:
                pending: deque = deque()
                it = iter(order)

                def submit_next() -> bool:
                    try:
                        i = int(next(it))
                    except StopIteration:
                        return False
                    pending.append((i, ex.submit(self.reader, self.records[i])))
                    return True

                # In-flight window = io_workers exactly: each pending future
                # holds a full decoded image (~80-160 MB at production
                # size), so the window bounds peak host RAM at ~io_workers
                # raw images — the inherent cost of N-way decode, not more.
                for _ in range(self.io_workers):
                    if not submit_next():
                        break
                while pending:
                    i, fut = pending.popleft()
                    raw = fut.result()
                    q.put(self._make_bag(i, epoch, raw=raw))
                    submit_next()

        def producer():
            try:
                if self.io_workers > 1:
                    produce_pooled()
                else:
                    produce_serial()
            except BaseException as e:  # surface errors to the consumer
                q.put(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def __iter__(self):
        return self.epoch(0)
