"""Ray-Data-native point-in-time feature-engineering engine.

A from-scratch re-expression of the capabilities of
``oxabz/nuclei-feature-extraction`` (see ``SURVEY.md``): per-record
feature kernels + windowed/as-of temporal operators over a
Common-Crawl-style pages table ``(url, warc_ts, html, text, lang)``,
built as ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches, hash partitioning with skew salting,
per-partition sort, and checkpointed partitioned Parquet sinks.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` —
sessions are owned by the caller (driver, tests, bench.py).
"""

__version__ = "0.1.0"
