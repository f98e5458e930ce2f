"""Serving front-ends (server.py): JSONL batch scoring + HTTP server.

No reference counterpart (the reference ships research scripts only);
the result schema mirrors the figure-caption statistics of
``/root/reference/infer.py:47-74``.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
import jax

from montecarlo_gated_mil_tpu.core.config import config_from_dict
from montecarlo_gated_mil_tpu.data.synthetic import synthetic_image
from montecarlo_gated_mil_tpu.server import (
    build_predictor,
    make_server,
    result_to_dict,
    serve_jsonl,
)


def _cfg(**tpu_overrides):
    tpu = {"buckets": [8], "use_pallas_attention": False}
    tpu.update(tpu_overrides)
    return config_from_dict(
        {
            "N": 3,
            "seed": 0,
            "data": {
                "H": 128, "W": 128, "patch_size": 64,
                "overlap_train": 0.0, "overlap_val_test": 0.0,
                "empty_threshold": 0.05, "synthetic_count": 1,
            },
            "tpu": tpu,
        }
    )


@pytest.fixture(scope="module")
def predictor():
    return build_predictor(_cfg())


def _write_requests(tmp_path, reqs):
    paths = []
    for i, r in enumerate(reqs):
        img = synthetic_image(128, 128, positive=bool(i % 2), seed=20 + i)
        p = tmp_path / f"img_{i}.npy"
        np.save(p, np.asarray(img))
        r = dict(r)
        r["image"] = str(p)
        paths.append(r)
    return "\n".join(json.dumps(r) for r in paths) + "\n"


@pytest.mark.slow
def test_serve_jsonl_matches_predict(predictor, tmp_path):
    text = _write_requests(
        tmp_path,
        [{"seed": 5}, {"seed": 9, "laterality": "R"}, {"seed": 2}],
    )
    out = io.StringIO()
    n = serve_jsonl(predictor, io.StringIO(text), out)
    assert n == 3
    lines = [json.loads(line) for line in out.getvalue().splitlines()]
    for i, (req, got) in enumerate(
        zip((json.loads(t) for t in text.splitlines()), lines)
    ):
        img = np.load(req["image"])
        want = predictor.predict(
            img, req.get("laterality", "L"), seed=req["seed"]
        )
        assert got["prediction"] == want.prediction
        np.testing.assert_allclose(got["p_mean"], float(want.stats.mean), atol=1e-5)
        assert got["num_instances"] == want.num_instances
        assert got["entropy_bucket"] in ("very low", "low", "moderate", "high")
        assert "attention_mean_maps" not in got


@pytest.mark.slow
def test_serve_jsonl_maps_and_errors(predictor, tmp_path):
    good = _write_requests(tmp_path, [{"seed": 1, "maps": True}])
    img_path = json.loads(good)["image"]
    # malformed optional fields must cost ONE error line each, not the batch
    bad_fields = [
        {"image": img_path, "maps": True, "map_downsample": "full"},
        {"image": img_path, "seed": None},
        {"image": img_path, "pixel_max": "x"},
        {"image": img_path, "map_downsample": 0},
    ]
    text = (
        good + 'not json\n' + json.dumps({"image": "/nope.npy"}) + "\n"
        + "".join(json.dumps(r) + "\n" for r in bad_fields)
        + good  # a good request AFTER the bad ones still scores
    )
    out = io.StringIO()
    n = serve_jsonl(
        predictor, io.StringIO(text), out, maps_dir=str(tmp_path / "maps")
    )
    assert n == 8
    lines = [json.loads(line) for line in out.getvalue().splitlines()]
    assert "attention_mean_maps" in lines[0]
    maps = np.load(lines[0]["attention_mean_maps"])
    assert maps.shape == (2, 128, 128)
    assert np.load(lines[0]["attention_std_maps"]).shape == (2, 128, 128)
    assert "error" in lines[1]
    assert "error" in lines[2]
    for bad in lines[3:7]:
        assert "error" in bad
    assert lines[7]["prediction"] == lines[0]["prediction"]


@pytest.mark.slow
def test_result_to_dict_inline_maps(predictor):
    img = synthetic_image(128, 128, positive=True, seed=3)
    r = predictor.predict(img, return_maps=True)
    d = result_to_dict(r)
    assert np.asarray(d["attention_mean_maps"]).shape == (2, 128, 128)
    assert json.loads(json.dumps(d))  # fully JSON-serializable


@pytest.mark.slow
def test_http_server(predictor):
    srv = make_server(predictor, port=0)  # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["num_samples"] == predictor.num_samples

        img = synthetic_image(128, 128, positive=True, seed=4)
        body = json.dumps(
            {"image": np.asarray(img).tolist(), "seed": 6}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            got = json.loads(resp.read())
        want = predictor.predict(img, seed=6)
        assert got["prediction"] == want.prediction
        np.testing.assert_allclose(got["p_mean"], float(want.stats.mean), atol=1e-5)

        # maps over HTTP are written server-side as .npy artifacts (never
        # inlined: full-res maps are hundreds of MB at production size)
        req_m = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(
                {"image": np.asarray(img).tolist(), "maps": True}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req_m, timeout=120) as resp:
            got_m = json.loads(resp.read())
        assert got_m["attention_mean_maps"].endswith(".npy")
        assert np.load(got_m["attention_mean_maps"]).shape == (2, 128, 128)

        # malformed request -> 400, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b'{"nope": 1}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(bad, timeout=30)
        assert exc_info.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_http_server_concurrent_requests_are_correct(predictor, tmp_path):
    """N threads hammering /predict concurrently each get the exact answer
    the serial ``predict()`` gives for their (image, seed) — i.e. the
    predictor's internal execute gate really does protect device state,
    and the threaded front-end drops nothing under contention (soak
    counterpart: ``tools/measure_serving.py --concurrency``)."""
    import http.client

    imgs = {}
    for i in range(2):
        img = synthetic_image(128, 128, positive=bool(i), seed=30 + i)
        np.save(tmp_path / f"img_{i}.npy", np.asarray(img))
        imgs[str(tmp_path / f"img_{i}.npy")] = img

    srv = make_server(predictor, port=0, data_root=str(tmp_path))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    paths = sorted(imgs)
    results: dict[int, dict] = {}
    errors: list[str] = []

    def client(ci: int) -> None:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        try:
            for r in range(3):
                seed = ci * 10 + r
                body = json.dumps(
                    {"image_path": paths[seed % 2], "seed": seed}
                ).encode()
                conn.request(
                    "POST", "/predict", body,
                    {"Content-Type": "application/json"},
                )
                resp = conn.getresponse()
                payload = json.loads(resp.read())
                if resp.status != 200:
                    errors.append(f"seed {seed}: {resp.status} {payload}")
                else:
                    results[seed] = payload
        except Exception as e:  # noqa: BLE001 — surface in the main thread
            errors.append(f"client {ci}: {type(e).__name__}: {e}")
        finally:
            conn.close()

    try:
        threads = [
            threading.Thread(target=client, args=(ci,)) for ci in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert len(results) == 24
        for seed, got in results.items():
            want = predictor.predict(imgs[paths[seed % 2]], seed=seed)
            assert got["prediction"] == want.prediction, seed
            np.testing.assert_allclose(
                got["p_mean"], float(want.stats.mean), atol=1e-6
            )
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_gated_upload_branch_matches_pipelined(predictor):
    """The tunneled-runtime branch (all device traffic inside the execute
    gate, ``pipelined_uploads=False``) returns bit-identical results to
    the default pipelined branch — the two code paths differ only in
    WHERE the upload/readback happen, never in what is computed."""
    gated = build_predictor(_cfg(), pipelined_uploads=False, max_inflight=2)
    assert gated._pipelined_uploads is False
    img = synthetic_image(128, 128, positive=True, seed=41)
    want = predictor.predict(img, seed=7, return_maps=True)
    got = gated.predict(img, seed=7, return_maps=True)
    assert got.prediction == want.prediction
    assert got.num_instances == want.num_instances
    np.testing.assert_array_equal(
        np.asarray(got.stats.mean), np.asarray(want.stats.mean)
    )
    np.testing.assert_array_equal(
        np.asarray(got.attention_mean_maps),
        np.asarray(want.attention_mean_maps),
    )


def test_max_inflight_validated():
    from montecarlo_gated_mil_tpu.serve import _tunneled_runtime

    with pytest.raises(ValueError, match="max_inflight"):
        build_predictor(_cfg(), max_inflight=0)
    # On the CPU test backend the tunnel heuristic must say False —
    # otherwise every CPU test above would silently run the gated branch.
    assert _tunneled_runtime() is False


@pytest.mark.slow
def test_cli_serve_jsonl(tmp_path):
    import yaml

    from montecarlo_gated_mil_tpu.cli import main
    from montecarlo_gated_mil_tpu.core.config import config_to_dict

    cfg_path = tmp_path / "config.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config_to_dict(_cfg()), f)
    in_path = tmp_path / "requests.jsonl"
    in_path.write_text(_write_requests(tmp_path, [{"seed": 0}, {"seed": 1}]))
    out_path = tmp_path / "results.jsonl"
    rc = main(
        [
            "serve", "--config", str(cfg_path), "--input", str(in_path),
            "--output", str(out_path), "--no-warmup",
        ]
    )
    assert rc == 0
    lines = [json.loads(line) for line in out_path.read_text().splitlines()]
    assert len(lines) == 2
    assert all(r["prediction"] in (0, 1) for r in lines)


@pytest.mark.slow
def test_build_predictor_restores_checkpoint(tmp_path):
    """build_predictor(checkpoint=...) reloads saved params (the serving
    analogue of run_cv_eval's reload path)."""
    from montecarlo_gated_mil_tpu.experiment import build_model
    from montecarlo_gated_mil_tpu.runners import init_params
    import dataclasses

    from montecarlo_gated_mil_tpu.train.state import Checkpointer

    cfg = dataclasses.replace(_cfg(), model_path=str(tmp_path / "models"))
    model = build_model(cfg)
    params = init_params(model, jax.random.key(42))
    store = Checkpointer(cfg.model_path)
    store.save_params("served", params)
    store.close()

    p = build_predictor(cfg, "served")
    img = synthetic_image(128, 128, positive=False, seed=7)
    got = p.predict(img, seed=1)

    from montecarlo_gated_mil_tpu.serve import MCDOPredictor

    want = MCDOPredictor.from_config(cfg, params).predict(img, seed=1)
    assert got.prediction == want.prediction
    np.testing.assert_allclose(
        np.asarray(got.stats.mean), np.asarray(want.stats.mean), atol=1e-6
    )
