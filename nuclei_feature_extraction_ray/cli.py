"""CLI entrypoint: ``python -m nuclei_feature_extraction_ray.cli`` —
the ``ray job submit`` surface (reference main binary CLI,
``src/args.rs`` + env-config driver ``run.sh:43-55`` recast; the
folder-loop of run.sh dissolves into one Dataset over all input files).

This module OWNS a Ray session (guarded init) — the library never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    import os

    # env-config fallbacks — the reference's Docker driver surface
    # (EXTRACTION_FEATURES / EXTRACTION_OUT_EXT, run.sh:48 +
    # Dockerfile:16) recast as NFX_* variables; explicit flags win.
    env_features = os.environ.get("NFX_FEATURES")
    env_fmt = os.environ.get("NFX_OUTPUT_FORMAT", "parquet")

    p = argparse.ArgumentParser(
        prog="nuclei-feature-extraction-ray",
        description="Point-in-time windowed feature extraction over a "
                    "Common-Crawl-style pages table, on Ray Data.")
    p.add_argument("--input", required=True,
                   help="pages parquet file/dir (url, warc_ts, html, lang)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--features", nargs="+",
                   default=(env_features.split() if env_features
                            else ["all"]),
                   help="feature families / aliases (see config.FAMILIES; "
                        "env NFX_FEATURES)")
    p.add_argument("--partitions", type=int, default=32)
    p.add_argument("--output-format", default=env_fmt,
                   choices=["parquet", "csv", "json", "ipc", "feather"])
    p.add_argument("--hot-threshold", type=int, default=None,
                   help="rows per url above which the url is salted "
                        "across time buckets (default: library's "
                        "HOT_THRESHOLD; 0 disables detection)")
    p.add_argument("--probes", default=None,
                   help="optional (url, query_ts) parquet for as-of serve")
    p.add_argument("--probe-output", default=None)
    p.add_argument("--single-file", action="store_true",
                   help="coalesce the probe output into ONE file "
                        "(streamed; for driver-sized results)")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="skip partitions with committed manifests")
    p.add_argument("--num-cpus", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from .config import expand_families
    expand_families(args.features)          # fail fast on unknown names

    from .sources.io import check_output
    check_output(args.output, args.overwrite, args.resume)

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        import ray.data as rd

        from .pipelines.pages_features import (
            HOT_THRESHOLD, probe_features_from_checkpoint,
            run_checkpointed)
        from .state.manifest import summarize

        hot = HOT_THRESHOLD if args.hot_threshold is None \
            else (args.hot_threshold or None)
        pages = rd.read_parquet(
            args.input, columns=["url", "warc_ts", "html", "lang"])
        run_checkpointed(pages, args.output,
                         num_partitions=args.partitions,
                         resume=args.resume,
                         families=args.features,
                         hot_threshold=hot).materialize()
        summary = summarize(args.output)

        if args.probes:
            from .sources.io import write_table
            probe_out = args.probe_output or args.output + "_probes"
            check_output(probe_out, args.overwrite)
            write_table(
                probe_features_from_checkpoint(
                    args.output, rd.read_parquet(args.probes),
                    num_partitions=args.partitions),
                probe_out, args.output_format,
                single_file=args.single_file)
            summary["probe_output"] = probe_out
        print(json.dumps(summary))
        return 0
    finally:
        if owns_session:     # never tear down a caller-owned session
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
