"""Serving front-ends for :class:`~montecarlo_gated_mil_tpu.serve.MCDOPredictor`.

The reference repo has no serving story (four research ``__main__`` scripts
only; SURVEY §0) — this module is the production entry point the rebuild
adds on top of the warm predictor: a JSONL batch mode for offline scoring
and a minimal stdlib HTTP server for online requests.  Both emit the same
result schema, which mirrors the figure-caption statistics of
``/root/reference/infer.py:47-74`` (mean/std/median/IQR/range of P(cancer),
mean predictive entropy + verbal bucket).

JSONL request line::

    {"image": "scan_001.npy", "laterality": "R", "seed": 3, "maps": false}

``image`` is a path to a ``(H, W)`` float array in [0, 1] (``.npy``).
Requests without ``maps`` are grouped through ``predict_many`` in bounded
chunks — one SPMD dispatch per mesh-sized group when more than one device
is available — while map requests take the single-bag path that also
reconstructs full-resolution mean/std attention maps.  Maps are written
as ``.npy`` artifacts (paths in the result) in both modes; at production
size they are hundreds of MB each and are never inlined over HTTP.
``"map_downsample": k`` box-averages the maps k-fold on device before the
fetch (viewer resolution at 1/k² the bytes; exact box mean of the
full-resolution map).

HTTP mode (stdlib ``http.server``; one process, threaded — device
execution gated inside the predictor, uploads overlap)::

    GET  /healthz            -> {"status": "ok", ...}
    POST /predict            <- {"image": [[...]] | "image_path": "...",
                                 "laterality": "L", "seed": 0, "maps": false}
"""

from __future__ import annotations

import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np

from montecarlo_gated_mil_tpu.core.config import Config
from montecarlo_gated_mil_tpu.mcdo.sampling import interpret_entropy
from montecarlo_gated_mil_tpu.serve import MCDOPredictor, PredictionResult


def build_predictor(
    cfg: Config, checkpoint: str | None = None, **kw
) -> MCDOPredictor:
    """Predictor from a config + optional Orbax params checkpoint.

    Without ``checkpoint`` the model is freshly initialized (smoke tests,
    throughput probes); with it, parameters are restored the same way
    ``run_cv_eval`` reloads fold models (runners.py).
    """
    import jax

    from montecarlo_gated_mil_tpu.experiment import build_model
    from montecarlo_gated_mil_tpu.runners import init_params
    from montecarlo_gated_mil_tpu.train.state import Checkpointer

    model = build_model(cfg)
    if jax.default_backend() != "cpu":
        # Initialize on the in-process CPU backend and keep the parameters
        # HOST-RESIDENT (numpy).  Two measured reasons (tools/
        # measure_coldstart.py, docs/PERFORMANCE.md cold-start section):
        # the init jit costs ~10 s over the tunneled TPU runtime vs ~1 s on
        # host, and — decisive — any device->host readback of TPU-resident
        # params later (the quantization plan builder pulls them) hits the
        # tunnel's first-fetch stall (1-4 min, serializes all traffic).
        # Host numpy params are ordinary jit constants: XLA ships them
        # device-ward at compile time, which is the only direction the
        # tunnel transfers fast.
        import numpy as np

        with jax.default_device(jax.devices("cpu")[0]):
            params = init_params(model, jax.random.key(cfg.seed))
        params = jax.tree.map(np.asarray, params)
    else:
        params = init_params(model, jax.random.key(cfg.seed))
    if checkpoint:
        store = Checkpointer(cfg.model_path)
        try:
            params = store.restore_params(checkpoint, params)
        finally:
            store.close()
    return MCDOPredictor.from_config(cfg, params, **kw)


def result_to_dict(
    r: PredictionResult, *, maps_prefix: str | None = None
) -> dict:
    """JSON-safe result record (schema shared by both front-ends)."""
    s = r.stats
    out = {
        "prediction": int(r.prediction),
        "mean_probs": np.asarray(s.mean_probs, np.float64).tolist(),
        "p_mean": float(s.mean),
        "p_std": float(s.std),
        "p_median": float(s.median),
        "p_iqr": float(s.iqr),
        "p_low": float(s.low),
        "p_high": float(s.high),
        "mean_entropy": float(s.mean_entropy),
        "entropy_bucket": interpret_entropy(s.mean_entropy),
        "num_instances": int(r.num_instances),
    }
    if r.attention_mean_maps is not None:
        if maps_prefix is not None:
            mean_path = f"{maps_prefix}_attention_mean.npy"
            std_path = f"{maps_prefix}_attention_std.npy"
            np.save(mean_path, r.attention_mean_maps)
            np.save(std_path, r.attention_std_maps)
            out["attention_mean_maps"] = mean_path
            out["attention_std_maps"] = std_path
        else:
            out["attention_mean_maps"] = np.asarray(
                r.attention_mean_maps, np.float64
            ).tolist()
            out["attention_std_maps"] = np.asarray(
                r.attention_std_maps, np.float64
            ).tolist()
    return out


def _load_image(path: str) -> np.ndarray:
    """Load a 2-D grayscale array, preserving integer dtypes (raw DICOM
    pixels ship to the device as 1-2 bytes/px and normalize there)."""
    img = np.load(path)
    if img.ndim != 2:
        raise ValueError(f"{path}: expected a 2-D grayscale array, got {img.shape}")
    if img.dtype.kind in "ui":
        return img
    return np.asarray(img, np.float32)


def _validate_request(req: dict) -> None:
    """Reject malformed optional fields up front so one bad line costs one
    ``{"error": ...}`` record, not the whole batch.  Shared by the JSONL
    loop and the HTTP handler's 400 path, so both front-ends enforce the
    same contract (a float or bool ``map_downsample`` is rejected, never
    silently truncated)."""
    seed = req.get("seed", 0)
    if isinstance(seed, bool) or not isinstance(seed, int):
        raise ValueError(f"seed must be an integer, got {seed!r}")
    pm = req.get("pixel_max")
    if pm is not None and (
        isinstance(pm, bool) or not isinstance(pm, (int, float))
    ):
        raise ValueError(f"pixel_max must be a number, got {pm!r}")
    k = req.get("map_downsample", 1)
    if isinstance(k, bool) or not isinstance(k, int) or k < 1:
        raise ValueError(f"map_downsample must be an integer >= 1, got {k!r}")


def serve_jsonl(
    predictor: MCDOPredictor,
    in_stream,
    out_stream,
    *,
    maps_dir: str | None = None,
) -> int:
    """Score JSONL requests from ``in_stream`` to ``out_stream`` in order.

    Map-free requests are grouped through ``predict_many`` (SPMD over the
    mesh when available); map requests run per-bag.  Returns the number of
    results written.  A malformed line produces an ``{"error": ...}`` line
    at its position instead of aborting the batch.

    Requests are processed strictly in stream order and every finished
    result is flushed to ``out_stream`` as soon as its turn comes — a crash
    or OOM mid-batch loses at most the current in-flight chunk, not the
    whole run (the reason the batch is chunked in the first place).
    """
    requests: list[tuple[int, dict] | tuple[int, Exception]] = []
    for i, line in enumerate(in_stream):
        line = line.strip()
        if not line:
            continue
        try:
            requests.append((i, json.loads(line)))
        except json.JSONDecodeError as e:
            requests.append((i, e))

    n = 0

    def emit(record: dict) -> None:
        nonlocal n
        out_stream.write(json.dumps(record) + "\n")
        n += 1

    # Map-free requests score through predict_many in bounded chunks: a
    # production mammogram is ~80 MB on the host, so loading the whole
    # batch up front (like predict_many's own per-group bag building
    # avoids on device) would exhaust host RAM on long request lists.
    # A chunk's results land in a dict keyed by position, then flush in
    # order before the next chunk starts.
    chunk = max(16, jax.device_count())
    pending: list[tuple[int, dict]] = []

    def flush_pending() -> None:
        if not pending:
            return
        results: dict[int, dict] = {}
        loaded: list[tuple[int, dict, np.ndarray]] = []
        for i, req in pending:
            try:
                _validate_request(req)
                loaded.append((i, req, _load_image(req["image"])))
            except (KeyError, OSError, ValueError, TypeError) as e:
                results[i] = {"error": str(e)}
        if loaded:
            rs = predictor.predict_many(
                [img for _, _, img in loaded],
                [req.get("laterality", "L") for _, req, _ in loaded],
                seeds=[int(req.get("seed", 0)) for _, req, _ in loaded],
                pixel_maxes=[req.get("pixel_max") for _, req, _ in loaded],
            )
            for (i, _, _), r in zip(loaded, rs):
                results[i] = result_to_dict(r)
        for i in sorted(results):
            emit(results[i])
        out_stream.flush()
        pending.clear()

    for i, req in requests:
        if isinstance(req, Exception):
            flush_pending()  # keep output in stream order
            emit({"error": f"bad request line: {req}"})
            continue
        if req.get("maps"):
            flush_pending()
            try:
                _validate_request(req)
                img = _load_image(req["image"])
            except (KeyError, OSError, ValueError, TypeError) as e:
                emit({"error": str(e)})
                continue
            prefix = None
            if maps_dir is not None:
                os.makedirs(maps_dir, exist_ok=True)
                prefix = os.path.join(maps_dir, f"request_{i:05d}")
            r = predictor.predict(
                img,
                req.get("laterality", "L"),
                seed=int(req.get("seed", 0)),
                return_maps=True,
                map_downsample=int(req.get("map_downsample", 1)),
                pixel_max=req.get("pixel_max"),
            )
            emit(result_to_dict(r, maps_prefix=prefix))
            out_stream.flush()
        else:
            pending.append((i, req))
            if len(pending) >= chunk:
                flush_pending()
    flush_pending()
    out_stream.flush()
    return n


class _Handler(BaseHTTPRequestHandler):
    predictor: MCDOPredictor = None  # set by make_server
    maps_dir: str = None
    counter = None  # itertools.count, set by make_server
    data_root: str = None  # image_path requests allowed only under this root

    def log_message(self, *args):  # quiet by default
        pass

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            p = self.predictor
            self._reply(
                200,
                {
                    "status": "ok",
                    "num_samples": p.num_samples,
                    "quantized": p.quantized,
                    "bucket": int(p.pipeline.bucket),
                },
            )
        else:
            self._reply(404, {"error": "unknown path"})

    def do_POST(self):
        if self.path != "/predict":
            self._reply(404, {"error": "unknown path"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            if "image" in req:
                img = np.asarray(req["image"], np.float32)
                if img.ndim != 2:
                    raise ValueError(f"expected 2-D image, got {img.shape}")
            else:
                # Trust model: HTTP clients may only reference files under
                # the configured data root — an unrestricted np.load of a
                # client-supplied path would be an arbitrary-file-read/probe
                # vector on the production entry point.  (The offline JSONL
                # mode keeps free-path access: its request file is operator-
                # supplied, not network input.)
                if self.data_root is None:
                    raise ValueError(
                        "image_path requests are disabled: start the server "
                        "with a data root (cli: serve --data-root DIR) or "
                        "send inline pixel data"
                    )
                path = os.path.realpath(str(req["image_path"]))
                root = os.path.realpath(self.data_root)
                if os.path.commonpath([path, root]) != root:
                    raise ValueError("image_path outside the configured data root")
                img = _load_image(path)
            _validate_request(req)  # same contract as the JSONL front-end
            pixel_max = req.get("pixel_max")
            seed = req.get("seed", 0)
            map_downsample = req.get("map_downsample", 1)
        except (KeyError, ValueError, TypeError, json.JSONDecodeError, OSError) as e:
            self._reply(400, {"error": str(e)})
            return
        want_maps = bool(req.get("maps", False))
        try:
            # No lock here: MCDOPredictor is thread-safe and gates device
            # execution internally (serve.py ``max_inflight``), so request
            # threads overlap host decode + image upload with the current
            # request's device work instead of serializing end-to-end
            # (docs/PERFORMANCE.md §Round 5c).
            r = self.predictor.predict(
                img,
                req.get("laterality", "L"),
                seed=seed,
                return_maps=want_maps,
                map_downsample=map_downsample,
                pixel_max=pixel_max,
            )
            prefix = None
            if want_maps:
                # Maps are full-resolution (hundreds of MB at production
                # size): always written as server-side .npy artifacts,
                # never inlined into the JSON response.
                os.makedirs(self.maps_dir, exist_ok=True)
                prefix = os.path.join(
                    self.maps_dir, f"request_{next(self.counter):05d}"
                )
            payload = result_to_dict(r, maps_prefix=prefix)
        except Exception as e:  # noqa: BLE001 — client gets JSON, not a dropped socket
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            return
        self._reply(200, payload)


def make_server(
    predictor: MCDOPredictor,
    port: int,
    host: str = "127.0.0.1",
    maps_dir: str | None = None,
    data_root: str | None = None,
) -> ThreadingHTTPServer:
    """HTTP server wrapping a warm predictor (call ``serve_forever`` on it).

    Request threads run concurrently: the predictor is thread-safe and
    serializes device execution internally behind its ``max_inflight``
    gate, so under load the host-side decode and the ~79 MB image upload
    of queued requests overlap the in-flight request's device work
    (measured sustained throughput + latency: docs/PERFORMANCE.md
    §Round 5c).
    Attention maps requested via ``"maps": true`` are written to
    ``maps_dir`` (default: a fresh temp directory) as ``.npy`` artifacts,
    with the paths in the response.  ``data_root`` confines ``image_path``
    requests to files under that directory; without it they are rejected
    (inline ``image`` pixel data always works).
    """
    import itertools
    import tempfile

    if maps_dir is None:
        maps_dir = tempfile.mkdtemp(prefix="mcgmil_maps_")
    handler = type(
        "Handler", (_Handler,),
        {
            "predictor": predictor,
            "maps_dir": maps_dir,
            "counter": itertools.count(),
            "data_root": data_root,
        },
    )
    return ThreadingHTTPServer((host, port), handler)


def run_server(
    cfg: Config,
    *,
    checkpoint: str | None = None,
    port: int = 8000,
    host: str = "127.0.0.1",
    warmup: bool = True,
    background_warmup: bool = False,
    aot_cache: str | None = None,
    maps_dir: str | None = None,
    data_root: str | None = None,
) -> None:
    """``background_warmup=True`` compiles only the cap-bucket program
    before listening (one compile instead of buckets x dtypes) and warms
    the rest in a daemon thread — requests arriving meanwhile run at the
    smallest already-compiled sufficient bucket (same results, more
    padding).  ``aot_cache`` warms through an on-disk serialized-executable
    cache instead: the first launch compiles and saves, every restart
    deserializes in seconds (keep the directory per-checkpoint — weights
    are baked into the executables)."""
    predictor = build_predictor(cfg, checkpoint)
    if aot_cache:
        hits = predictor.aot_warmup(aot_cache)
        print(f"aot cache {aot_cache}: {hits} program(s) loaded, rest compiled+saved")
    elif warmup:
        predictor.warmup(background=background_warmup)
    srv = make_server(predictor, port, host, maps_dir, data_root)
    print(f"serving on http://{host}:{port} (POST /predict, GET /healthz)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
