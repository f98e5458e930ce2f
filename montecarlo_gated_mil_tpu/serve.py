"""Production serving: raw mammogram in, uncertainty-aware prediction out.

The reference has no serving story (research scripts only); this module
packages the whole inference path — on-device preprocessing, one feature
pass, T fused Monte-Carlo samples, on-device uncertainty reductions and
optional full-resolution attention maps — behind one warm, reusable
predictor with static shapes (compile once per bucket, then every request is
a single dispatch).

    predictor = MCDOPredictor.from_config(cfg, params)
    result = predictor.predict(image, laterality="R")
    result.prediction, result.stats.mean, result.attention_mean  # ...
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_gated_mil_tpu.core.config import Config
from montecarlo_gated_mil_tpu.data.pipeline import PipelineConfig, image_to_bag
from montecarlo_gated_mil_tpu.mcdo.sampling import (
    AttentionStats,
    PredictiveStats,
    attention_stats,
    mc_head,
    predictive_stats,
)
from montecarlo_gated_mil_tpu.ops.gated_attention import (
    GatedAttentionParams,
    mc_gated_attention_fused,
)
from montecarlo_gated_mil_tpu.viz.attention import attention_map_stats

Array = jax.Array


def _prepare_image(image, pixel_max: float | None):
    """(host array to ship, device-side 1/max scale).

    Integer arrays ship as-is (1-2 bytes/px) and normalize on device by
    ``pixel_max`` (default: dtype max; pass ``2**bits_stored - 1`` for raw
    DICOM pixels, matching ``/root/reference/dataset.py:176-180``).  Float
    arrays are assumed already in [0, 1] unless ``pixel_max`` says otherwise.
    """
    arr = np.asarray(image)
    if arr.dtype.kind in "ui":
        mx = float(np.iinfo(arr.dtype).max) if pixel_max is None else float(pixel_max)
        return arr, np.float32(1.0 / mx)
    arr = np.asarray(arr, np.float32)
    return arr, np.float32(1.0 if pixel_max is None else 1.0 / float(pixel_max))


@dataclass(frozen=True)
class PredictionResult:
    """One bag's uncertainty-aware prediction."""

    prediction: int  # argmax of MC-mean class probabilities
    stats: PredictiveStats
    attention: AttentionStats  # per-instance over T samples
    num_instances: int
    attention_mean_maps: np.ndarray | None = None  # (C, H, W) if requested
    attention_std_maps: np.ndarray | None = None


def _tunneled_runtime() -> bool:
    """True when the device backend is the experimental axon stdio tunnel
    (single relay process; concurrent device traffic from multiple host
    threads wedges it — §Round 5c).  Standard PJRT runtimes return False."""
    try:
        dev = jax.devices()[0]
        probes = (
            getattr(dev.client, "platform_version", ""),
            getattr(dev, "device_kind", ""),
            type(dev).__name__,
            type(dev.client).__name__,
        )
        return any("axon" in str(p).lower() for p in probes)
    except Exception:  # pragma: no cover — no backend at all
        return False


class MCDOPredictor:
    """Warm end-to-end MCDO inference engine for one pipeline configuration.

    Thread-SAFE for concurrent request loops.  On standard PJRT runtimes
    (CPU, PCIe TPU) host-side prep (pixel normalization, the subsampled
    bucket estimate) and the host->device image upload run concurrently
    across caller threads — the next request's ~79 MB image streams while
    the current one computes — and only device execution serializes,
    behind an internal bounded gate (``max_inflight``, default 1: the
    HBM envelope in docs/PERFORMANCE.md §Round 5b is per in-flight
    program).  On the experimental axon stdio tunnel (auto-detected;
    ``pipelined_uploads`` overrides) everything from prep onward rides
    inside the gate: concurrent device traffic wedges the relay outright,
    and even concurrent host prep costs ~30% sustained throughput because
    the relay is itself a host process (both measured —
    docs/PERFORMANCE.md §Round 5c).  Each call derives its PRNG stream
    from a per-request seed.  With a ``bucket_spec``, requests embed at
    the smallest sufficient bucket (see ``__init__``).
    """

    def __init__(
        self,
        model,
        params,
        pipeline: PipelineConfig,
        *,
        num_samples: int = 30,
        use_pallas: bool | None = None,
        quantized: bool = False,
        bucket_spec=None,
        oversized: str = "extend",
        max_inflight: int = 1,
        pipelined_uploads: bool | None = None,
    ):
        if oversized not in ("extend", "truncate"):
            raise ValueError(
                f"oversized must be 'extend' or 'truncate', got {oversized!r}"
            )
        self.oversized = oversized
        # Oversized requests capped under oversized='truncate' — truncation
        # is never silent (loud warning on first occurrence + this counter,
        # mirroring BagLoader.truncated_bags).
        self.truncated_requests = 0
        self._warned_truncation = False
        self.model = model
        self.params = params
        self.pipeline = pipeline
        self.num_samples = num_samples
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        elif use_pallas and jax.default_backend() != "tpu":
            # The serving path runs the kernel compiled only (no interpret
            # fallback like train/loops._allow_pallas): off-TPU it cannot
            # honor use_pallas=True, so fall back to the jnp head.
            use_pallas = False
        self.use_pallas = use_pallas
        self.quantized = quantized
        # With a BucketSpec, each request embeds at the smallest registry
        # bucket that fits its valid-tile count (the serving analogue of
        # BagLoader's adaptive buckets; sparse mammograms skip most of the
        # padded embed compute — measured 10.5x for 100-tile bags).  The
        # bucket is picked by a host-side subsampled fill estimate
        # (pipeline.estimate_valid_tiles) so the request path has NO
        # blocking device readback; pipeline.bucket caps it.
        self.bucket_spec = bucket_spec
        self._grid = pipeline.grid()
        self._starts = jnp.asarray(self._grid.tiles_array()[:, :2])
        self._kernel_params = (
            GatedAttentionParams.from_model_params(params) if use_pallas else None
        )
        self._qparams = None
        if quantized:
            from montecarlo_gated_mil_tpu.ops.quantized import (
                quantize_backbone_static,
            )

            self._qparams = quantize_backbone_static(
                params["features"], model.backbone
            )

        self._infers: dict[int, object] = {}
        # (bucket, dtype name) -> AOT-compiled executable (aot_warmup)
        self._aot: dict[tuple[int, str], object] = {}
        self._bag_fn = self._build_bag_fn()  # built once: predict_many stays warm
        self._starts_np = self._grid.tiles_array()[:, :2]
        self._warming = False  # set while a background warmup thread runs
        # Buckets whose program has FINISHED compiling.  ``self._infers``
        # registers the jit wrapper *before* its first call compiles it, so
        # membership there does not mean "won't stall"; this set is updated
        # only after a compile returns.  It is an immutable frozenset
        # replaced atomically, so readers never iterate a mutating
        # container; the replacement itself is a read-modify-write from
        # both the warmup thread and request threads, so it goes through
        # ``_mark_compiled``'s lock (a lost update would only cost extra
        # padding, but there is no reason to allow one).
        import threading as _threading

        self._compiled: frozenset[int] = frozenset()
        # Small-state lock: _compiled snapshot swaps, _infers build-once,
        # and the truncation counter.  Never held across device work.
        self._compiled_lock = _threading.Lock()
        if max_inflight < 1:
            raise ValueError(f"max_inflight must be >= 1, got {max_inflight}")
        # Serializes device EXECUTION only (uploads overlap; see class
        # docstring).  >1 lets a compute overlap a fetch at the cost of
        # one more program's transient HBM per extra slot.
        self._execute_gate = _threading.BoundedSemaphore(max_inflight)
        if pipelined_uploads is None:
            # Concurrent device traffic from multiple host threads WEDGES
            # the experimental axon stdio tunnel (measured: 2 requests
            # served, then every device op hangs for tens of minutes —
            # docs/PERFORMANCE.md §Round 5c), so prep + upload + execute +
            # fetch all ride inside the execute gate there (see
            # ``predict``).  Standard PJRT runtimes (CPU, PCIe TPU) take
            # the pipelined path: JAX dispatch is thread-safe and the
            # next request's image streams during the current request's
            # compute.
            pipelined_uploads = not _tunneled_runtime()
        self._pipelined_uploads = pipelined_uploads

    def _mark_compiled(self, bucket: int) -> None:
        with self._compiled_lock:
            self._compiled = self._compiled | {bucket}

    def _pick_bucket(self, arr, laterality: str) -> int:
        """Smallest sufficient registry bucket for a request, from the
        host-side subsampled fill estimate — no device work, no readback
        (the round-2 request path paid a full device canonicalize+SAT pass
        plus a blocking ~25 ms scalar sync here).  Off-size images (the
        resize path) and spec-less predictors use the full bucket.

        OVERSIZED requests — more valid tiles than the cap bucket, possible
        at dense high-overlap geometries — extend past the cap under
        ``oversized='extend'`` (quantized sizes via
        ``BucketSpec.extended_bucket``; every tile kept, matching the
        reference's ``bag_size: -1``); under ``'truncate'`` they count into
        ``self.truncated_requests`` and warn once — truncation is a policy
        here, never a silent event (core/config.py's documented contract).

        When the bucket decision flips inside the estimator's uncertainty
        band the request takes the LARGER bucket: serving never blocks on a
        device count, and rounding up costs only padding, never tiles."""
        cap = self.pipeline.bucket
        may_overflow = self._grid.num_tiles > cap and (
            self.pipeline.bag_size <= 0 or self.pipeline.bag_size > cap
        )
        if self.bucket_spec is None and not may_overflow:
            return cap
        from montecarlo_gated_mil_tpu.data.pipeline import (
            ESTIMATE_MARGIN_HI,
            estimate_valid_tiles,
        )

        est = estimate_valid_tiles(
            arr, laterality == "R", self._starts_np, self.pipeline,
            margin_hi=ESTIMATE_MARGIN_HI,
        )
        if est is None:
            return cap
        n, n_hi = est
        bucket_lo, over_lo = self._decide_bucket(n, may_overflow)
        bucket_hi, _ = self._decide_bucket(n_hi, may_overflow)
        # Ambiguous band -> the LARGER bucket (padding-only cost); but the
        # truncation counter/warning fire only on the CONFIDENT
        # (standard-margin) overflow — counting band-ambiguous requests
        # would report phantom truncations for bags that in fact fit.
        bucket = max(bucket_lo, bucket_hi)
        if over_lo and self.oversized != "extend":
            with self._compiled_lock:
                self.truncated_requests += 1
                warn_now = not self._warned_truncation
                self._warned_truncation = True
            if warn_now:
                import warnings

                warnings.warn(
                    f"request with ~{n} valid tiles truncated to bucket "
                    f"{cap} (lowest-fill tiles dropped; oversized="
                    "'truncate'); use oversized='extend' to keep every tile",
                    stacklevel=3,
                )
        return bucket

    def _decide_bucket(self, n: int, may_overflow: bool) -> tuple[int, bool]:
        """Map a valid-tile count to ``(bucket, overflowed)`` under the
        predictor's oversize policy (the serving twin of
        ``BagLoader._decide``)."""
        cap = self.pipeline.bucket
        if may_overflow and n > cap:
            if self.oversized == "extend":
                from montecarlo_gated_mil_tpu.core.bag import BucketSpec

                spec = self.bucket_spec or BucketSpec((cap,))
                mult = jax.device_count() if jax.process_count() == 1 else 1
                return spec.extended_bucket(n, multiple_of=mult), True
            return cap, True
        if self.bucket_spec is None:
            return cap, False
        return min(self.bucket_spec.bucket_for(n), cap), False

    def _infer_for(self, bucket: int):
        """The jitted end-to-end request program for one bag bucket.

        Buckets past the pipeline cap (oversized requests under
        ``oversized='extend'``) run the instance-sharded embed + MC head
        over all local devices when the mesh divides them
        (``parallel/instance.py``; float path — the fused-kernel and int8
        variants are single-chip programs); on one device they run whole.
        """
        fn = self._infers.get(bucket)
        if fn is not None:
            return fn
        # Build-once under the small-state lock: two request threads
        # racing the miss path would otherwise create two distinct jit
        # wrappers for the same bucket — two separate XLA compiles of an
        # identical program.  The build only constructs the (untraced)
        # wrapper; compilation happens at first call, outside this lock.
        with self._compiled_lock:
            fn = self._infers.get(bucket)
            if fn is not None:
                return fn
            fn = self._build_infer(bucket)
            self._infers[bucket] = fn
            return fn

    def _build_infer(self, bucket: int):
        from dataclasses import replace

        pipe = replace(self.pipeline, bucket=bucket)
        inst_mesh = None
        if (
            bucket > self.pipeline.bucket
            and jax.process_count() == 1
            and jax.device_count() > 1
            and bucket % jax.device_count() == 0
        ):
            from montecarlo_gated_mil_tpu.parallel.mesh import make_mesh

            inst_mesh = make_mesh(data=1, inst=jax.device_count())

        @jax.jit
        def _infer(image, flip, seed, inv_max):
            # Integer pixels (raw DICOM uint16/uint8) normalize on device —
            # the reference's 2^BitsStored-1 scaling (dataset.py:176-180) —
            # so the host->device transfer ships 1-2 bytes/px, not 4.
            image = image.astype(jnp.float32) * inv_max
            bag = image_to_bag(
                image, flip, jnp.asarray(0), jax.random.key(seed), self._starts,
                pipe,
            )
            if inst_mesh is not None:
                from montecarlo_gated_mil_tpu.parallel.instance import (
                    mc_inference_sharded,
                )

                y, a = mc_inference_sharded(
                    self.model, self.params, bag.patches, bag.mask,
                    self.num_samples, jax.random.key(seed), inst_mesh,
                )
                return (
                    bag, y, a, predictive_stats(y),
                    attention_stats(a, bag.mask),
                )
            H = self._embed(bag.patches, bag.mask)
            from montecarlo_gated_mil_tpu.ops.gated_attention import (
                FUSED_HEAD_MAX_N,
            )

            # static-shape condition: past the kernel's VMEM ceiling the
            # fused program would be refused at compile time — jnp head
            if (
                self._kernel_params is not None
                and bag.patches.shape[0] <= FUSED_HEAD_MAX_N
            ):
                y, a = mc_gated_attention_fused(
                    H,
                    bag.mask,
                    self._kernel_params,
                    self.num_samples,
                    seed,
                    self.model.feature_dropout,
                    self.model.attention_dropout,
                )
            else:
                out = mc_head(
                    self.model,
                    {"params": self.params},
                    H,
                    bag.mask,
                    self.num_samples,
                    jax.random.key(seed),
                )
                y, a = out.predictions, out.attention
            # The uncertainty reductions live INSIDE the program: as eager
            # post-jit ops they cost dozens of op-by-op compiles on the
            # first request (~50 s on this tunneled runtime, measured in
            # tools/measure_coldstart.py), and inside they ride the AOT
            # executable cache like everything else.
            return bag, y, a, predictive_stats(y), attention_stats(a, bag.mask)

        return _infer

    def _build_bag_fn(self):
        @jax.jit
        def _bag_fn(image, flip, bag_seed, inv_max):
            image = image.astype(jnp.float32) * inv_max
            return image_to_bag(
                image, flip, jnp.asarray(0), jax.random.key(bag_seed),
                self._starts, self.pipeline,
            )

        return _bag_fn

    def _embed(self, patches, mask):
        """Patch features: the float backbone, or the int8 PTQ path
        (ops/quantized.py) when ``quantized=True``."""
        if self._qparams is not None:
            from montecarlo_gated_mil_tpu.ops.quantized import (
                quantized_embed_static,
            )

            return quantized_embed_static(
                self._qparams, patches, mask, backbone=self.model.backbone
            )
        return self.model.apply(
            {"params": self.params}, patches, mask, method="embed"
        )

    @classmethod
    def from_config(
        cls, cfg: Config, params, *, train_overlap: bool = False, **kw
    ) -> "MCDOPredictor":
        from montecarlo_gated_mil_tpu.core.bag import BucketSpec
        from montecarlo_gated_mil_tpu.experiment import build_model
        from montecarlo_gated_mil_tpu.ops.patching import compute_tile_grid

        d = cfg.data
        overlap = d.overlap_train if train_overlap else d.overlap_val_test
        grid = compute_tile_grid(d.H, d.W, d.patch_size, overlap)
        pipeline = PipelineConfig(
            height=d.H,
            width=d.W,
            patch_size=d.patch_size,
            overlap=overlap,
            empty_threshold=d.empty_threshold,
            bag_size=d.bag_size_val_test,
            bucket=BucketSpec(cfg.tpu.buckets).bucket_for(grid.num_tiles),
            augment=False,
            dtype=cfg.tpu.compute_dtype,
        )
        kw.setdefault("num_samples", cfg.N)
        # config True -> auto (kernel on TPU); config False -> forced off
        kw.setdefault(
            "use_pallas", None if cfg.tpu.use_pallas_attention else False
        )
        kw.setdefault("quantized", cfg.tpu.quantized_inference)
        kw.setdefault("oversized", cfg.tpu.oversized_bags)
        if len(cfg.tpu.buckets) > 1:
            kw.setdefault("bucket_spec", BucketSpec(cfg.tpu.buckets))
        return cls(build_model(cfg), params, pipeline, **kw)

    def _aot_args(self, dtype):
        hw = (self.pipeline.height, self.pipeline.width)
        zero, inv_max = _prepare_image(np.zeros(hw, dtype), None)
        return (
            jnp.asarray(zero),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(inv_max),
        )

    def aot_warmup(self, directory: str, dtypes=(np.float32, np.uint16)) -> int:
        """Warm every (bucket, dtype) program through an on-disk executable
        cache — the serving cold-start fix for runtimes where the XLA
        compilation cache is unusable (the axon plugin hangs with
        ``jax_compilation_cache_dir``; docs/ROADMAP.md item 4).

        ``jax.experimental.serialize_executable`` round-trips compiled
        executables on this runtime (probed: 173 KB, deserialize+run 0.05 s
        — ``tools/measure_coldstart.py``).  First launch compiles and
        serializes each program; every later launch deserializes in
        seconds instead of recompiling for minutes.  Parameters are baked
        into the executable, so the cache directory must be per-checkpoint
        (stale-weight safety: key the directory by checkpoint name).
        Returns the number of programs loaded from cache.
        """
        import pickle

        from jax.experimental import serialize_executable as se

        os.makedirs(directory, exist_ok=True)
        buckets = [self.pipeline.bucket]
        if self.bucket_spec is not None:
            buckets += [
                b for b in self.bucket_spec.sizes if b <= self.pipeline.bucket
            ]
        hits = 0
        for dtype in dtypes:
            args = self._aot_args(dtype)
            for b in dict.fromkeys(buckets):
                # v2: the program's out_tree grew the in-jit stats bundle —
                # stale v1 files must miss, not deserialize to a 3-tuple.
                name = f"infer_b{b}_{np.dtype(dtype).name}_v2.jaxexec"
                path = os.path.join(directory, name)
                key = (b, np.dtype(dtype).name)
                if os.path.exists(path):
                    try:
                        with open(path, "rb") as f:
                            payload, in_tree, out_tree = pickle.load(f)
                        # pin the single serving device: without this,
                        # loading on a multi-local-device backend (the 8-CPU
                        # test mesh) builds an executable expecting one
                        # shard per device
                        self._aot[key] = se.deserialize_and_load(
                            payload, in_tree, out_tree,
                            execution_devices=[jax.devices()[0]],
                        )
                        hits += 1
                        self._mark_compiled(b)
                        continue
                    except Exception:  # noqa: BLE001
                        # Stale or version-incompatible cache file (e.g. a
                        # jax/jaxlib upgrade — the filename versions the
                        # out_tree, not the runtime): drop it and fall
                        # through to a fresh compile instead of killing
                        # server startup.
                        self._aot.pop(key, None)
                        try:
                            os.remove(path)
                        except OSError:
                            pass
                compiled = self._infer_for(b).lower(*args).compile()
                self._aot[key] = compiled
                self._mark_compiled(b)
                with open(path + ".tmp", "wb") as f:
                    pickle.dump(se.serialize(compiled), f)
                os.replace(path + ".tmp", path)
        self.absorb_first_fetch()
        return hits

    def absorb_first_fetch(self) -> None:
        """Pay the tunnel's first device->host fetch stall NOW, inside
        startup, so the first user request doesn't.

        On the tunneled runtime the first buffer read of a process stalls
        1-4 minutes and serializes every other tunnel op behind it; every
        later fetch is milliseconds.  Measured path-independent — plain
        ``device_get``, cross-backend ``device_put`` to the CPU backend,
        and XLA ``pinned_host`` out_shardings all hit it (tools/
        measure_coldstart.py; docs/PERFORMANCE.md cold-start section) — so
        it cannot be dodged, only scheduled.  No-op on CPU backends and
        after the first fetch."""
        if jax.default_backend() == "cpu":
            return
        np.asarray(jax.device_put(np.zeros(1, np.float32), jax.devices()[0]))

    def warmup(
        self, dtypes=(np.float32, np.uint16), *, background: bool = False
    ):
        """Trigger all compilations with dummy requests: every registry
        bucket (with adaptive buckets) x every expected input dtype — each
        input dtype is a distinct XLA program, and a cold compile on the
        first real DICOM-wire uint16 request would stall it for minutes on
        this runtime.

        ``background=True`` cuts cold start to ONE compile: the cap bucket
        for the first dtype compiles synchronously (the predictor can serve
        as soon as this returns — any request can run at the cap bucket,
        just with more padding), and the remaining (bucket, dtype) programs
        compile in a daemon thread while requests are being served; a
        request needing a not-yet-compiled bucket simply pays its compile
        (or, if ``_pick_bucket`` would choose one, runs at the smallest
        *already-compiled* sufficient bucket — see ``predict``).  Returns
        the background thread (or None) so callers/tests can join it.
        """
        hw = (self.pipeline.height, self.pipeline.width)
        buckets = [self.pipeline.bucket]
        if self.bucket_spec is not None:
            buckets += [
                b for b in self.bucket_spec.sizes if b <= self.pipeline.bucket
            ]
        flip = jnp.asarray(False)
        seed = jnp.asarray(0, jnp.int32)

        def compile_one(dtype, b):
            zero, inv_max = _prepare_image(np.zeros(hw, dtype), None)
            self._infer_for(b)(zero, flip, seed, inv_max)
            # Only now is bucket b safe to route requests to without a
            # compile stall (see ``self._compiled`` in __init__).
            self._mark_compiled(b)

        combos = [(d, b) for d in dtypes for b in dict.fromkeys(buckets)]
        if not background:
            for d, b in combos:
                compile_one(d, b)
            self.absorb_first_fetch()
            return None
        compile_one(*combos[0])  # cap bucket, first dtype: ready to serve
        self.absorb_first_fetch()

        import threading

        self._warming = True

        def rest():
            try:
                for d, b in combos[1:]:
                    try:
                        compile_one(d, b)
                    except Exception:  # noqa: BLE001 — warmup is best-effort
                        pass
            finally:
                self._warming = False

        t = threading.Thread(target=rest, daemon=True, name="mcgmil-warmup")
        t.start()
        return t

    def predict(
        self,
        image: np.ndarray,
        laterality: str = "L",
        *,
        seed: int = 0,
        return_maps: bool = False,
        map_downsample: int = 1,
        pixel_max: float | None = None,
    ) -> PredictionResult:
        """Classify one grayscale mammogram.

        ``image`` is float in [0, 1], or a raw integer pixel array (uint8/
        uint16) normalized on device by ``pixel_max`` (default: dtype max;
        pass ``2**bits_stored - 1`` for DICOM) — integer input halves the
        host->device transfer.  ``return_maps`` additionally reconstructs
        full-resolution mean/std attention maps (the infer.py figure inputs);
        ``map_downsample=k`` box-averages them down k-fold on device before
        the fetch — full-resolution maps are 2x~158 MB f32 at production
        size (~35 s through a tunneled runtime), a viewer-resolution k=8
        map is 1/64 of that.
        """
        if self._pipelined_uploads:
            arr, inv_max = _prepare_image(image, pixel_max)
            return self._predict_prepared(
                arr, inv_max, laterality, seed=seed,
                return_maps=return_maps, map_downsample=map_downsample,
            )
        # Tunneled runtime: the per-request host prep (a full-image numpy
        # pass + the SAT bucket estimate) rides INSIDE the gate too.  The
        # relay is a host process, so concurrent host work inflates
        # in-flight device time (CLAUDE.md methodology item 3); measured
        # at concurrency 8 on the full 7036x2800 geometry, concurrent
        # prep costs ~30% sustained throughput (0.23 vs 0.33 req/s —
        # docs/PERFORMANCE.md §Round 5c).  Request decode (np.load /
        # JSON) still overlaps in the handler threads.
        with self._execute_gate:
            arr, inv_max = _prepare_image(image, pixel_max)
            return self._predict_prepared(
                arr, inv_max, laterality, seed=seed,
                return_maps=return_maps, map_downsample=map_downsample,
                _pre_gated=True,
            )

    def _predict_prepared(
        self,
        arr,
        inv_max,
        laterality: str,
        *,
        seed: int,
        return_maps: bool = False,
        map_downsample: int = 1,
        bucket: int | None = None,
        _pre_gated: bool = False,
    ) -> PredictionResult:
        """``predict`` after host-side image prep.  ``predict_many``'s
        oversized detour enters here so the prepared array and the bucket
        estimate (a full-image host pass + ~5 ms SAT at production size)
        are not redone per request.  ``_pre_gated``: the caller already
        holds the execute gate (tunneled-runtime ``predict``) — don't
        re-acquire it (the semaphore is not reentrant)."""
        flip = jnp.asarray(laterality == "R")
        if bucket is None:
            bucket = self._pick_bucket(arr, laterality)
        if getattr(self, "_warming", False) and bucket not in self._compiled:
            # Background warmup in progress: round up to the smallest
            # FINISHED-compiling sufficient bucket (same result, more
            # padding) instead of stalling this request on a cold — or
            # worse, in-progress — compile.  ``self._compiled`` is an
            # immutable snapshot, safe to iterate while the warmup thread
            # publishes new buckets.
            done = sorted(b for b in self._compiled if b >= bucket)
            if done:
                bucket = done[0]
        # Pipelined runtimes: start the host->device image upload BEFORE
        # taking the execute gate — device_put enqueues the transfer and
        # returns, so under concurrent callers request B's ~79 MB image
        # streams while request A computes.  Tunneled runtimes (axon):
        # ship the host array and let the gated call upload it — any
        # device traffic outside the gate wedges the relay (§Round 5c).
        dev = jax.device_put(arr) if self._pipelined_uploads else arr
        if _pre_gated:
            import contextlib

            gate = contextlib.nullcontext()
        else:
            gate = self._execute_gate
        with gate:
            # AOT-cached executable when one matches (exact shape +
            # dtype); the jitted program otherwise.
            aot = self._aot.get((bucket, arr.dtype.name))
            if aot is not None and arr.shape == (
                self.pipeline.height, self.pipeline.width
            ):
                bag, y, a, stats, att = aot(
                    jnp.asarray(dev),
                    flip,
                    jnp.asarray(seed, jnp.int32),
                    jnp.asarray(inv_max),
                )
            else:
                bag, y, a, stats, att = self._infer_for(bucket)(
                    dev,
                    flip,
                    jnp.asarray(seed, jnp.int32),
                    inv_max,
                )
                self._mark_compiled(bucket)
            maps = None
            if return_maps:
                maps = attention_map_stats(
                    a, bag.tile_indices, bag.mask, self._grid,
                    downsample=map_downsample,
                )
            if not self._pipelined_uploads:
                # Tunneled runtime: the readback is device traffic too —
                # keep it inside the gate (see __init__).
                stats, att, n_inst, maps = jax.device_get(
                    (stats, att, bag.num_instances, maps)
                )
        if self._pipelined_uploads:
            # One batched host fetch: each device_get is a full round trip
            # (~25 ms on tunneled runtimes), so everything the result
            # needs comes back in a single transfer.  Outside the gate —
            # the next request's compute overlaps this one's readback.
            stats, att, n_inst, maps = jax.device_get(
                (stats, att, bag.num_instances, maps)
            )
        return PredictionResult(
            prediction=int(stats.prediction),
            stats=stats,
            attention=att,
            num_instances=int(n_inst),
            attention_mean_maps=None if maps is None else np.asarray(maps[0]),
            attention_std_maps=None if maps is None else np.asarray(maps[1]),
        )

    def predict_many(
        self,
        images,
        lateralities=None,
        *,
        seed: int = 0,
        seeds: list[int] | None = None,
        pixel_maxes: list[float | None] | None = None,
        dp: bool | None = None,
    ) -> list[PredictionResult]:
        """Batch prediction.  With more than one device (``dp=None`` auto,
        ``dp=True`` forced) requests are stacked into mesh-sized batches and
        evaluated data-parallel over the ``data`` axis — one SPMD dispatch
        per group instead of one per image.  Per-request PRNG keys match the
        sequential path (``key(seed + i)``) and the embedding honors
        ``quantized``, so predictions match ``predict``.  Caveats: the
        sharded path always uses the vmap MC head (the fused kernel's
        hardware-PRNG dropout is per-core), and with ``quantized`` the
        batched compilation's f32 reduction order can flip values sitting
        on int8 rounding boundaries — both statistically equivalent rather
        than bitwise-identical.

        ``seeds`` gives each request its own PRNG seed (overriding the
        default ``seed + i`` convention) — the JSONL serving front-end
        passes client-chosen seeds through it."""
        lateralities = lateralities or ["L"] * len(images)
        if seeds is None:
            seeds = [seed + i for i in range(len(images))]
        if len(seeds) != len(images):
            raise ValueError(f"{len(seeds)} seeds for {len(images)} images")
        pixel_maxes = pixel_maxes or [None] * len(images)
        if len(pixel_maxes) != len(images):
            raise ValueError(
                f"{len(pixel_maxes)} pixel_maxes for {len(images)} images"
            )
        if dp is None:
            dp = jax.device_count() > 1 and len(images) > 1
        if not dp:
            return [
                self.predict(img, lat, seed=s, pixel_max=pm)
                for (img, lat, s, pm) in zip(
                    images, lateralities, seeds, pixel_maxes
                )
            ]
        from montecarlo_gated_mil_tpu.parallel.dp import (
            make_dp_mc_eval,
            pad_group_to_batch,
        )
        from montecarlo_gated_mil_tpu.parallel.mesh import make_mesh

        if not hasattr(self, "_dp_state"):
            mesh = make_mesh()
            self._dp_state = (
                mesh,
                make_dp_mc_eval(
                    self.model, mesh, self.num_samples, self.quantized
                ),
            )
        mesh, eval_step = self._dp_state
        batch = int(mesh.shape["data"])
        results: list[PredictionResult | None] = [None] * len(images)
        for lo in range(0, len(images), batch):
            # Build bags per mesh-sized group: at production shape a bag is
            # ~300 MB, so materializing every request's bag up front would
            # exhaust HBM on long request lists.
            group = []
            group_js = []
            for j in range(min(batch, len(images) - lo)):
                arr, inv_max = _prepare_image(
                    images[lo + j], pixel_maxes[lo + j]
                )
                # Oversized requests (more valid tiles than the cap bucket,
                # oversized='extend') cannot ride the fixed-bucket dp batch
                # — run them instance-sharded/whole instead of letting
                # ``_bag_fn``'s cap truncate them (prepared array + bucket
                # reused, not recomputed).
                bucket = self._pick_bucket(arr, lateralities[lo + j])
                if bucket > self.pipeline.bucket:
                    results[lo + j] = self._predict_prepared(
                        arr, inv_max, lateralities[lo + j],
                        seed=seeds[lo + j], bucket=bucket,
                    )
                    continue
                group_js.append(j)
                group.append(
                    self._bag_fn(
                        arr,
                        jnp.asarray(lateralities[lo + j] == "R"),
                        jnp.asarray(seeds[lo + j], jnp.int32),
                        inv_max,
                    )
                )
            if not group:
                continue
            stacked, keys, n_real = pad_group_to_batch(
                mesh, group,
                [jax.random.key(seeds[lo + j]) for j in group_js],
            )
            ys, atts = eval_step(self.params, stacked, keys)
            # One batched host fetch per group (not per result): each
            # device_get is a full tunnel round trip (~25 ms).
            fetched = jax.device_get(
                [
                    (
                        predictive_stats(ys[j]),
                        attention_stats(atts[j], group[j].mask),
                        group[j].num_instances,
                    )
                    for j in range(n_real)
                ]
            )
            for j, (stats, att, n_inst) in enumerate(fetched):
                results[lo + group_js[j]] = PredictionResult(
                    prediction=int(stats.prediction),
                    stats=stats,
                    attention=att,
                    num_instances=int(n_inst),
                )
        return results
