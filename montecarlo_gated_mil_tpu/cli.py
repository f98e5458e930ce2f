"""Command-line entry points.

Reference: four ``python <script>.py --config <path.yml>`` entry scripts
(``main.py``, ``cross_validation.py``, ``cross_val_eval.py``, ``infer.py``;
arg parser at ``/root/reference/utils.py:14-23``).  Here one console tool
with subcommands:

    python -m montecarlo_gated_mil_tpu.cli train --config config.yml
    python -m montecarlo_gated_mil_tpu.cli cv --config config.yml
    python -m montecarlo_gated_mil_tpu.cli cv-eval --config config.yml
    python -m montecarlo_gated_mil_tpu.cli infer --config config.yml --out DIR
    python -m montecarlo_gated_mil_tpu.cli bench --config config.yml
    python -m montecarlo_gated_mil_tpu.cli serve --config config.yml \
        [--checkpoint NAME] [--input requests.jsonl | --port 8000]

``serve`` has no reference counterpart (the reference ships research
scripts only); it fronts the warm ``MCDOPredictor`` with JSONL batch
scoring or a minimal HTTP server (``server.py``).
"""

from __future__ import annotations

import argparse
import sys


def get_args_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="montecarlo_gated_mil_tpu",
        description="TPU-native Monte Carlo Gated-Attention MIL framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    for name, help_ in (
        ("train", "single-split training with early stopping + final test"),
        ("cv", "k-fold cross-validation training"),
        ("cv-eval", "re-evaluate saved CV fold models (MC vs deterministic)"),
        ("infer", "MCDO inference with attention/uncertainty figures"),
        ("bench", "MCDO throughput benchmark"),
        ("serve", "serving front-end: JSONL batch scoring or HTTP server"),
    ):
        p = sub.add_parser(name, help=help_)
        p.add_argument(
            "--config", type=str, required=True,
            help="path to .yml config file specifying datasets/training params",
        )
        p.add_argument(
            "--tensorboard", type=str, default=None, metavar="DIR",
            help="also log metrics as TensorBoard event files under DIR",
        )
        if name == "train":
            p.add_argument(
                "--resume", action="store_true",
                help="resume from the latest training-state checkpoint",
            )
        if name == "cv":
            p.add_argument(
                "--resume", action="store_true",
                help="skip folds already completed by a crashed run "
                "(cv_progress.json)",
            )
        if name == "cv-eval":
            p.add_argument("--manifest", type=str, default=None)
            p.add_argument(
                "--ensemble", action="store_true",
                help="also score the stacked fold ensemble (pooled MC "
                "samples) on the shared test split",
            )
        if name == "infer":
            p.add_argument("--out", type=str, default="figures")
            p.add_argument("--manifest", type=str, default=None)
            p.add_argument("--max-items", type=int, default=0)
            p.add_argument(
                "--ensemble", action="store_true",
                help="one pooled fold-ensemble figure per item instead of "
                "one per fold",
            )
        if name == "bench":
            p.add_argument("--samples", type=int, default=30)
        if name == "serve":
            p.add_argument(
                "--checkpoint", type=str, default=None,
                help="Orbax params checkpoint (name under model_path or "
                "absolute path); fresh init if omitted",
            )
            p.add_argument(
                "--input", type=str, default=None,
                help="JSONL request file ('-' for stdin); omits HTTP mode",
            )
            p.add_argument(
                "--output", type=str, default=None,
                help="JSONL result file (default stdout)",
            )
            p.add_argument("--maps-dir", type=str, default=None)
            p.add_argument("--port", type=int, default=8000)
            p.add_argument("--host", type=str, default="127.0.0.1")
            p.add_argument("--no-warmup", action="store_true")
            p.add_argument(
                "--background-warmup", action="store_true",
                help="HTTP mode: listen after one cap-bucket compile and "
                "warm the remaining buckets in a background thread",
            )
            p.add_argument(
                "--aot-cache", type=str, default=None, metavar="DIR",
                help="warm via an on-disk serialized-executable cache: "
                "first launch compiles+saves, restarts load in seconds "
                "(use one directory per checkpoint)",
            )
            p.add_argument(
                "--data-root", type=str, default=None,
                help="directory HTTP image_path requests may read from "
                "(omitted: image_path requests are rejected in HTTP mode)",
            )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = get_args_parser().parse_args(argv)
    # NOTE: jax_compilation_cache_dir is deliberately NOT enabled here — the
    # axon TPU plugin in this image hangs when the persistent compilation
    # cache is active (verified empirically); fresh processes recompile.
    from montecarlo_gated_mil_tpu.core.config import load_config
    from montecarlo_gated_mil_tpu.utils.metrics import Metrics, StdoutSink

    cfg = load_config(args.config)
    if cfg.tpu.coordinator_address:
        # Multi-process (multi-slice) mode: bring up the distributed runtime
        # before first jax use; CV folds then fan out over processes.
        from montecarlo_gated_mil_tpu.parallel.distributed import initialize

        initialize(
            cfg.tpu.coordinator_address,
            cfg.tpu.num_processes,
            cfg.tpu.process_id,
        )
    metrics = Metrics([StdoutSink()])
    if args.tensorboard:
        from montecarlo_gated_mil_tpu.utils.metrics import TensorBoardSink

        metrics.sinks.append(TensorBoardSink(args.tensorboard))
    if cfg.neptune:
        try:
            import neptune

            from montecarlo_gated_mil_tpu.utils.metrics import NeptuneSink

            run = neptune.init_run()
            run["config"] = {"yml": args.config}
            metrics.sinks.append(NeptuneSink(run))
        except ImportError:
            print("neptune not installed; continuing with stdout metrics")

    if args.command == "train":
        from montecarlo_gated_mil_tpu.runners import run_training

        run_training(cfg, metrics, resume=args.resume)
    elif args.command == "cv":
        from montecarlo_gated_mil_tpu.runners import run_cross_validation

        run_cross_validation(cfg, metrics, resume=args.resume)
    elif args.command == "cv-eval":
        from montecarlo_gated_mil_tpu.runners import run_cv_eval

        run_cv_eval(cfg, args.manifest, metrics, ensemble=args.ensemble)
    elif args.command == "infer":
        from montecarlo_gated_mil_tpu.viz.infer import run_inference

        run_inference(cfg, out_dir=args.out, manifest_path=args.manifest,
                      max_items=args.max_items, ensemble=args.ensemble)
    elif args.command == "bench":
        import json

        from montecarlo_gated_mil_tpu.bench import run_bench

        print(json.dumps(run_bench(cfg, num_samples=args.samples)))
    elif args.command == "serve":
        from montecarlo_gated_mil_tpu.server import (
            build_predictor,
            run_server,
            serve_jsonl,
        )

        if args.input is not None:
            predictor = build_predictor(cfg, args.checkpoint)
            if not args.no_warmup:
                predictor.warmup()
            fin = sys.stdin if args.input == "-" else open(args.input)
            fout = sys.stdout if args.output is None else open(args.output, "w")
            try:
                serve_jsonl(predictor, fin, fout, maps_dir=args.maps_dir)
            finally:
                if fin is not sys.stdin:
                    fin.close()
                if fout is not sys.stdout:
                    fout.close()
        else:
            run_server(
                cfg,
                checkpoint=args.checkpoint,
                port=args.port,
                host=args.host,
                warmup=not args.no_warmup,
                background_warmup=args.background_warmup,
                aot_cache=args.aot_cache,
                maps_dir=args.maps_dir,
                data_root=args.data_root,
            )
    metrics.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
