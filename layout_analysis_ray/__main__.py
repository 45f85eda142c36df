"""CLI entry point — the `ray job submit` surface of the engine.

    # extract with resumable, lineage-manifested output (rerun to resume):
    python -m layout_analysis_ray extract \
        --sf-dir /root/testdata/sf0.01 --out /tmp/extract_out --partitions 64

    # plain streaming extraction (no checkpoint layout):
    python -m layout_analysis_ray extract --sf-dir ... --out ... --no-resume

    # evaluate two extraction outputs (corpus dice / positional accuracy):
    python -m layout_analysis_ray evaluate --a /tmp/out_a --b /tmp/out_b

    # resumable corpus prep (clean -> dedup -> near-dup filter -> pack);
    # rerun after a kill: committed tokenize partitions are skipped:
    python -m layout_analysis_ray corpus \
        --sf-dir /root/testdata/sf0.01 --out /tmp/corpus_out --partitions 64

Analogue of the reference's `detect_paragraphs.py` CLI
(`/root/reference/src/detect_paragraphs.py:28-41`), re-shaped for a cluster:
the unit of restart is an output partition, not a process.

This is the one module that may own a Ray session (guarded: the driver /
tests initialise Ray themselves and never import __main__).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import os

    import ray

    if not ray.is_initialized():
        kwargs = {}
        if os.environ.get("RAY_GRAFT_CPUS"):
            kwargs["num_cpus"] = int(os.environ["RAY_GRAFT_CPUS"])
        ray.init(
            address="local", include_dashboard=False, logging_level="ERROR", **kwargs
        )
    return ray


def cmd_extract(args) -> int:
    _ensure_ray()
    import functools

    from .pipelines.extract import extract_pipeline
    from .sources.synth import docs_from_parquet
    from .state.checkpoint import resumable_write

    pipeline = functools.partial(
        extract_pipeline,
        order_strategy=args.order_strategy,
        model_weights=args.model_weights,
    )
    docs = docs_from_parquet(args.sf_dir, num_blocks=args.num_blocks)
    if args.validate:
        from .sources.validate import validate_docs

        docs = validate_docs(docs)
    if args.no_resume:
        pipeline(docs).write_parquet(args.out)
        print(json.dumps({"out": args.out, "resume": False}))
        return 0
    job = resumable_write(
        docs, args.out, num_partitions=args.partitions, pipeline=pipeline
    )
    print(json.dumps(job))
    return 0


def _read_extraction(path: str):
    """Read a plain parquet dir OR a checkpointed (manifested) output."""
    import os

    import ray.data as rd

    from .state.checkpoint import MANIFEST_DIR, read_output

    if os.path.isdir(os.path.join(path, MANIFEST_DIR)):
        return read_output(path)
    return rd.read_parquet(path)


def cmd_evaluate(args) -> int:
    _ensure_ray()
    from .functions.evaluate import corpus_summary, evaluate_extraction

    summary = corpus_summary(
        evaluate_extraction(_read_extraction(args.a), _read_extraction(args.b))
    )
    print(json.dumps(summary))
    return 0


def cmd_compact(args) -> int:
    """Small-file compaction: many tiny fragments (e.g. a 64-partition
    checkpointed run at low SF) -> ~target-MB output files.  One
    ``repartition`` sized from the INPUT bytes on disk; rows stream through
    — nothing materializes on the driver."""
    _ensure_ray()
    import math
    import os

    import ray.data as rd

    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(args.in_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (args.target_mb << 20)))
    ds = rd.read_parquet(args.in_dir)
    n_rows = ds.count()
    ds.repartition(n_files).write_parquet(args.out)
    out_files = [f for f in os.listdir(args.out) if f.endswith(".parquet")]
    print(
        json.dumps(
            {
                "in_bytes": total,
                "rows": n_rows,
                "target_mb": args.target_mb,
                "out_files": len(out_files),
            }
        )
    )
    return 0


def cmd_media(args) -> int:
    """Media featurize / frame-sample pipeline -> parquet.

    ``--decoder demo|png|jpeg`` injects a real byte-decode kernel so the
    end-to-end ``decode_mode == "real"`` path — payload fetch into a
    ``media_bytes`` binary column, actual byte decode (RAW8 header
    parse, PNG inflate + un-filter, or JPEG Huffman + IDCT) in the
    actor pool — is reachable from the CLI, not just pytest; the
    default uses the deterministic stub (no media libs in this
    sandbox)."""
    _ensure_ray()
    from .stages.media import (
        demo_bytes_decoder,
        encode_jpeg_payloads,
        encode_png_payloads,
        frame_sample,
        jpeg_bytes_decoder,
        media_features,
        png_bytes_decoder,
    )

    decoder = {
        "demo": demo_bytes_decoder,
        "png": png_bytes_decoder,
        "jpeg": jpeg_bytes_decoder,
    }.get(args.decoder)
    kwargs = {"decoder": decoder}
    if args.decoder == "png":
        kwargs["fetch"] = encode_png_payloads
    elif args.decoder == "jpeg":
        kwargs["fetch"] = encode_jpeg_payloads
    if args.frames:
        ds = frame_sample(args.sf_dir, k=args.frames, **kwargs)
    else:
        ds = media_features(args.sf_dir, **kwargs)
    ds.write_parquet(args.out)
    import ray.data as rd

    out = rd.read_parquet(args.out)
    modes = (
        sorted({r["decode_mode"] for r in out.select_columns(["decode_mode"]).take_all()})
        if not args.frames
        else []
    )
    print(
        json.dumps(
            {
                "out": args.out,
                "rows": out.count(),
                "decoder": args.decoder,
                "decode_modes": modes,
            }
        )
    )
    return 0


def cmd_corpus(args) -> int:
    """Checkpointed pretraining-prep run (clean -> dedup -> near-dup
    filter -> pack): rerun after a kill and committed tokenize partitions
    are SKIPPED, not recomputed (the global dedup/pack tail reruns from
    the ~1000x-smaller narrow checkpoint)."""
    _ensure_ray()
    from .pipelines.corpus import corpus_prepare_resumable

    job = corpus_prepare_resumable(
        args.sf_dir,
        args.out,
        num_partitions=args.partitions,
        n_subparts=args.n_subparts,
    )
    print(json.dumps(job))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="layout_analysis_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="run the extraction pipeline")
    pe.add_argument("--sf-dir", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--partitions", type=int, default=64)
    pe.add_argument("--num-blocks", type=int, default=None)
    pe.add_argument("--no-resume", action="store_true")
    pe.add_argument(
        "--order-strategy",
        default="xycut",
        choices=["xycut", "cluster", "flood"],
        help="block-ordering strategy (stages.strategies registry)",
    )
    pe.add_argument(
        "--model-weights",
        default=None,
        help="optional npz logistic scorer weights (see SpanScorer)",
    )
    pe.add_argument(
        "--validate",
        action="store_true",
        help="fail fast on docs-table schema violations at ingest",
    )
    pe.set_defaults(fn=cmd_extract)

    pv = sub.add_parser("evaluate", help="compare two extraction outputs")
    pv.add_argument("--a", required=True)
    pv.add_argument("--b", required=True)
    pv.set_defaults(fn=cmd_evaluate)

    pm = sub.add_parser(
        "media",
        help="featurize media spans (optionally frame-sample) to parquet",
    )
    pm.add_argument("--sf-dir", required=True)
    pm.add_argument("--out", required=True)
    pm.add_argument(
        "--decoder",
        default="stub",
        choices=["stub", "demo", "png", "jpeg"],
        help="'demo' injects the RAW8 real-decode kernel; 'png'/'jpeg' "
        "the pure-Python compressed-image ones (all decode_mode=real)",
    )
    pm.add_argument(
        "--frames",
        type=int,
        default=0,
        help="if >0, emit uniform-stride frame samples (k per item)",
    )
    pm.set_defaults(fn=cmd_media)

    pcp = sub.add_parser(
        "corpus",
        help="resumable corpus prep (clean/dedup/pack) with a checkpointed"
        " tokenize stage",
    )
    pcp.add_argument("--sf-dir", required=True)
    pcp.add_argument("--out", required=True)
    pcp.add_argument("--partitions", type=int, default=64)
    pcp.add_argument("--n-subparts", type=int, default=None)
    pcp.set_defaults(fn=cmd_corpus)

    pc_ = sub.add_parser(
        "compact",
        help="rewrite a parquet directory into ~target-size output files",
    )
    pc_.add_argument("--in", dest="in_dir", required=True)
    pc_.add_argument("--out", required=True)
    pc_.add_argument("--target-mb", type=int, default=128)
    pc_.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
