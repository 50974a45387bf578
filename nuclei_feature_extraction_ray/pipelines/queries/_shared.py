"""Query registry: every operator/pipeline from SURVEY.md §2 (plus the
training-data ops) as a ``(sf_dir) -> Dataset|DataFrame`` callable, with
a DuckDB oracle SQL string wherever the semantics are SQL-expressible.

Float policy for oracle comparison (every oracle row is bit-exact
under STRICT float equality at sf0.001/sf0.01):
1. sums that must match exactly are computed on integers (cents, cell
   counts) with ONE final division — order-exact in both engines;
2. inexact-weight folds run in the SAME explicit order on both sides
   (texture.py 64-term folds), and rounding uses one shared
   half-away-from-zero formula (texture.r6/_sql_r6) — numpy's
   half-even differs exactly on dyadic boundaries;
3. seconds columns mirror DuckDB's ``epoch(interval)`` float path
   (days*86400.0 + micros/1e6; stages/window.us_seconds), which
   differs from pandas total_seconds in the last ulp;
4. generated SQL CASTs all literals/aggregates to DOUBLE — DuckDB
   parses bare decimals as DECIMAL and its exact decimal arithmetic
   rounds differently from the engine's doubles.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ...functions.hashing import winnow_fingerprint
from ...functions.langid import langid_frame, langid_sql
from ...functions.quality import quality_frame, quality_sql
from ...functions.text_stats import text_stats_frame, text_stats_sql
from ...functions.texture import (cooc_sql, runlen_sql, spectrum_sql,
                                 texture_frame)
from ...stages import ann as ann_mod
from ...stages import dedup as dedup_mod
from ...stages.asof import asof_join
from ...stages.multimodal import DecodeMedia, make_payload
from ...stages import partition as partition_stage
from ...stages.partition import partition_map, partitioned_apply
from ...stages.rangejoin import range_join
from ...stages.window import (add_backfill, add_ewma_rows, add_lag_lead,
                             add_rolling_quantiles, add_rolling_rows,
                             add_session_ids, concurrency_sweep,
                             session_aggregate)
from ...util import configure_context

QUERIES: dict = {}
ORACLE: dict[str, str] = {}

SESSION_GAP_SEC = 8 * 3600          # events sessionize threshold
JACCARD_NGRAM = 2
JACCARD_TAU = 0.08
COSINE_TAU = 0.35
ANN_K = 5
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
EVENTS_P = 16                        # hash partitions for events ops

_EVW = "PARTITION BY user_id ORDER BY ts, event_id"


def register(name: str, sql: str | None = None):
    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapped(sf_dir: str):
            # Must run BEFORE any Dataset is created: each Dataset
            # snapshots the DataContext at creation time.
            configure_context()
            # Fresh input-size hint for this query's build: the read
            # helpers (_path / _pages_path) append input bytes; the
            # exchanges clamp their width to the accumulated size
            # (stages.partition.clamped_parts). Cleared again on exit
            # so pipelines built OUTSIDE the registry (bench headline)
            # never see a stale hint.
            partition_stage.INPUT_SIZE_HINT.clear()
            try:
                return fn(sf_dir)
            finally:
                partition_stage.INPUT_SIZE_HINT.clear()

        QUERIES[name] = wrapped
        if sql is not None:
            ORACLE[name] = sql
        return wrapped
    return deco


def _path(sf_dir: str, table: str) -> str:
    p = os.path.join(sf_dir, table + ".parquet")
    try:
        partition_stage.INPUT_SIZE_HINT.append(os.path.getsize(p))
    except OSError:
        pass
    return p


def _pages_path(d: str) -> str:
    """Corpus pages directory, with its byte size fed to the same
    exchange-width hint as _path (see stages.partition.clamped_parts)."""
    p = os.path.join(d, "pages")
    try:
        partition_stage.INPUT_SIZE_HINT.append(sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)))
    except OSError:
        pass
    return p


def _events(sf_dir: str, columns=None):
    return rd.read_parquet(_path(sf_dir, "events"), columns=columns)


def _r6(df: pd.DataFrame, cols) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].round(6)
    return df



#: driver-side combine is only sane for bounded-cardinality keys;
#: fail loudly rather than OOM the driver if a caller exceeds this.
_COMBINE_MAX_ROWS = 1_000_000

#: decontaminate: cap on per-batch DISTINCT-gram partial rows pulled
#: for the exact benchmark broadcast (the holdout side is benchmark-
#: sized by definition; above this, use the Bloom tier).
_BENCH_GRAM_MAX = 2_000_000

#: Broadcast-dimension guard: a J2 lookup join may pull a dimension
#: table onto the driver only while it is dimension-SIZED. Checked on
#: parquet METADATA before any bytes are read.
_DIM_MAX_ROWS = 5_000_000

#: decontaminate_semantic: cap on benchmark embedding rows pulled for
#: the exact broadcast matrix.
_BENCH_VEC_MAX = 1_000_000


def _read_dim(path: str, columns: list[str],
              max_rows: int = _DIM_MAX_ROWS) -> pd.DataFrame:
    """Guarded driver-side read of a BROADCAST dimension table:
    raises on the parquet row count before reading a byte, so an
    accidentally fact-sized input can never materialize on the
    driver (the _combine_partials limit+raise contract, applied to
    the broadcast side of lookup joins). Accepts a sharded parquet
    DIRECTORY too (real deployments shard dimensions as well — the
    r5 sf1 stress input does): the guard sums footer row counts
    across shards, still before reading a data byte."""
    if os.path.isdir(path):
        files = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.endswith(".parquet"))
        nr = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    else:
        nr = pq.ParquetFile(path).metadata.num_rows
    if nr > max_rows:
        raise ValueError(
            "_read_dim: %s has %d rows > %d — too large to broadcast; "
            "use a hash exchange (stages.partition.partition_map) or "
            "pre-aggregate the dimension" % (path, nr, max_rows))
    return pq.read_table(path, columns=columns).to_pandas()


def _sorted_member(sorted_vals: np.ndarray,
                   probe: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``probe`` in an already-SORTED unique
    array: one searchsorted + one equality pass. For object (string)
    arrays this is ~n log m Python compares total, vs np.isin's
    re-sort of the member set on EVERY call."""
    if not len(sorted_vals):
        return np.zeros(len(probe), bool)
    pos = np.searchsorted(sorted_vals, probe)
    pos[pos == len(sorted_vals)] = len(sorted_vals) - 1
    return sorted_vals[pos] == probe


def _combine_partials(partials_ds, keys: list[str],
                      sums: list[str],
                      exact_int: bool = False) -> pd.DataFrame:
    """Final combine of per-batch partial aggregates. The partials are
    tiny by construction (distinct keys x blocks), so the combine runs
    on the driver — Ray's aggregate operator was measured to cost
    3-14 s of fixed overhead even on ~100 partial rows. Guarded: above
    ``_COMBINE_MAX_ROWS`` partial rows this raises instead of pulling
    an unbounded frame onto the driver — use a hash exchange
    (stages/partition.partition_map) for high-cardinality keys, as
    top_spenders does.

    ``exact_int=True`` folds the sum columns as arbitrary-precision
    Python ints (object dtype) instead of int64 — required whenever a
    caller claims an overflow-free driver fold (micro-unit product
    partials like embedding_covariance's sij reach ~1e12 per row, so
    an int64 fold would silently wrap around ~1e7 corpus rows)."""
    pdf = partials_ds.limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(pdf) > _COMBINE_MAX_ROWS:
        raise ValueError(
            "_combine_partials: > %d partial rows for keys %r — key "
            "cardinality is too high for a driver-side combine; use "
            "stages.partition.partition_map (one hash exchange + "
            "vectorized per-partition combine) instead"
            % (_COMBINE_MAX_ROWS, keys))
    if pdf.empty and not set(keys) <= set(pdf.columns):
        # a fully-empty partials Dataset loses its schema through
        # to_pandas; give callers an empty frame with the right
        # columns (they coerce dtypes on their own outputs)
        return pd.DataFrame({c: [] for c in [*keys, *sums]})
    if exact_int:
        pdf = pdf.copy()
        for c in sums:
            pdf[c] = pdf[c].map(int).astype(object)
    return pdf.groupby(keys, as_index=False)[sums].sum()
