"""Standalone dataset-slice CLI — the reference's second binary
``filter-geojson`` recast (``src/filter_geojson.rs:16-67``: read ->
drop records outside the window -> rebase coordinates by -offset ->
write). Here the window is a ``warc_ts`` time range (and optionally a
domain set), and the rebase shifts timestamps to seconds-from-window-
start, exactly like the ``time_slice`` query operator.

    python -m nuclei_feature_extraction_ray.filter_cli \
        --input <pages parquet> --output <dir> \
        --from 2024-01-10 --to 2024-01-20 [--rebase] \
        [--domains example.org ...] [--output-format parquet]

This module OWNS a Ray session (guarded init) — the library never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nfx-filter",
        description="Slice a pages table by time window (and domains), "
                    "optionally rebasing timestamps — the filter-geojson "
                    "analog.")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--from", dest="ts_from", required=True,
                   help="inclusive ISO timestamp lower bound")
    p.add_argument("--to", dest="ts_to", required=True,
                   help="exclusive ISO timestamp upper bound")
    p.add_argument("--rebase", action="store_true",
                   help="replace warc_ts with ts_rebased_sec "
                        "(seconds from --from; the -offset shift)")
    p.add_argument("--domains", nargs="*", default=None,
                   help="keep only urls whose host is in this set")
    p.add_argument("--output-format", default="parquet",
                   choices=["parquet", "csv", "json", "ipc", "feather"])
    p.add_argument("--single-file", action="store_true",
                   help="write ONE output file instead of a part-file "
                        "directory (streamed; for driver-sized slices)")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    return p


def slice_pages(ds, ts_from, ts_to, rebase: bool = False,
                domains: list[str] | None = None):
    """The M7 operator as a reusable stage: predicate + optional
    domain filter + optional coordinate rebase, all vectorized."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.window import us_seconds

    dom_set = pa.array(sorted(set(domains)), pa.string()) \
        if domains else None

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["warc_ts"],
                                     pa.scalar(ts_from)),
                    pc.less(batch["warc_ts"], pa.scalar(ts_to)))
        b = batch.filter(m)
        if dom_set is not None:
            # path-less urls ("https://example.org") must match too, so
            # everything after the host is optional
            hosts = pc.replace_substring_regex(
                b["url"], pattern=r"^[a-z]+://([^/]*).*$",
                replacement=r"\1")
            b = b.filter(pc.is_in(hosts, value_set=dom_set))
        if rebase:
            us = pc.cast(pc.subtract(b["warc_ts"],
                                     pa.scalar(ts_from)),
                         pa.int64()).to_numpy(zero_copy_only=False)
            b = b.drop_columns(["warc_ts"]).append_column(
                "ts_rebased_sec", pa.array(us_seconds(us)))
        return b

    return ds.map_batches(fn, batch_format="pyarrow")


def main(argv: list[str] | None = None) -> int:
    from datetime import datetime

    args = build_parser().parse_args(argv)
    ts_from = datetime.fromisoformat(args.ts_from)
    ts_to = datetime.fromisoformat(args.ts_to)

    from .sources.io import check_output, write_table
    check_output(args.output, args.overwrite)

    import ray
    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    try:
        import ray.data as rd
        ds = rd.read_parquet(args.input)
        out = slice_pages(ds, ts_from, ts_to, rebase=args.rebase,
                          domains=args.domains)
        write_table(out, args.output, args.output_format,
                    single_file=args.single_file)
        n = rd.read_parquet(args.output).count() \
            if args.output_format == "parquet" else -1
        print(json.dumps({"output": args.output, "rows": n}))
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
