"""Flagship pipeline (north_star): Common-Crawl-style pages ->
point-in-time windowed feature table, end-to-end on Ray Data.

    read_parquet(url, warc_ts, html, lang)           [prune: no text col]
    -> map_batches(ExtractText, actor pool)           html -> text (byte-
       identical invariant; unparseable nulled + counted)
    -> drop html (carry only an 8-byte html_hash for dedup tie-breaks —
       the shuffle never moves raw HTML)
    -> hash-partition by url (stages/partition.py)    [THE shuffle]
    -> per-partition: sort (url, warc_ts) -> exact dedup (url, warc_ts)
       keep deterministic winner -> per-row text-stat kernels ->
       lag/lead -> rolling 30-day window (vectorized deque-equivalent)
       -> gap sessionize -> language-stability  [all trailing-only:
       zero temporal leakage by construction]
    -> optional checkpointed sink: per-partition atomic Parquet commit
       + lineage manifest; resume filters committed partitions BEFORE
       the shuffle.

As-of probe serving: ``probe_features`` joins a (url, query_ts) probe
table against the feature table with the sort-merge as-of join
(stages/asof.py), co-partitioned on the same url-hash so the join adds
no extra shuffle.

Graft lineage: per-record kernels mirror the reference's feature
families (SURVEY.md §2.7); the dedup/window/as-of machinery is the
north_rule extension the reference lacks (SURVEY.md §2.4, §2.8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64
from ..functions.text_extract import ExtractText
from ..functions.text_stats import STAT_COLUMNS, text_stats_frame
from ..functions.texture import TEXTURE_COLUMNS, texture_frame
from ..stages.partition import PART_COL, with_partition
from ..stages.asof import asof_join
from ..state.manifest import commit_partition, committed_parts

SESSION_GAP = pd.Timedelta(days=30)
ROLLING_SPAN = pd.Timedelta(days=30)
LANG_STAB_K = 5

#: Deterministic output schema (config-derived, like the reference's
#: constant feature grids, src/features/texture.rs:82-157).
FEATURE_COLUMNS = (
    ["url", "warc_ts", "lang"] + STAT_COLUMNS +
    ["snap_idx", "gap_sec", "delta_n_chars", "days_since_first",
     "r30_min", "r30_max", "r30_mean", "r30_count",
     "session_id", "lang_changed", "lang_stab_5"] + TEXTURE_COLUMNS
)


#: Module-level extractor: regexes compile once per worker process at
#: import. An actor POOL here was measured to HURT: pool actors hold
#: their CPU reservation while idle, starving the downstream stat
#: kernels (37% cluster utilization). A plain function fuses with the
#: read and stats into one elastic task chain. Use an actor pool only
#: for genuinely heavy per-worker state (models, indexes) — see
#: stages/multimodal.DecodeMedia for that pattern.
_EXTRACTOR = ExtractText()


def extract_stage(pages_ds, concurrency: int | None = None,
                  batch_size: int = 256, texture: bool = True):
    """html -> extracted_text (+ok flag, +html_hash); html dropped.

    ``concurrency``: None (default) = elastic task pool; an int opts
    into an actor pool of that size. ``texture`` also computes the
    GLCM/GLRLM/Gabor-analog columns (pre-shuffle, like the stats).
    """
    if concurrency:
        ds = pages_ds.map_batches(
            ExtractText, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency)
    else:
        ds = pages_ds.map_batches(
            lambda b: _EXTRACTOR(b), batch_format="pyarrow",
            batch_size=batch_size)

    def slim(batch: pa.Table) -> pa.Table:
        hh = hash64(batch["html"].to_numpy(zero_copy_only=False))
        batch = batch.append_column(
            "html_hash", pa.array(hh.astype(np.int64)))
        return batch.drop_columns(["html"])

    ds = ds.map_batches(slim, batch_format="pyarrow")
    return ds.map_batches(
        lambda g: add_text_stats(g, texture=texture),
        batch_format="pandas")


def add_text_stats(g: pd.DataFrame, texture: bool = True) -> pd.DataFrame:
    """Per-row stat kernels (stateless). Run BEFORE the shuffle so the
    exchange moves numeric feature columns instead of kilobyte text
    bodies — the windowed operators never need the text itself."""
    parts = [text_stats_frame(g["extracted_text"])]
    if texture:
        parts.append(texture_frame(g["extracted_text"]))
    g = g.drop(columns=["extracted_text"])
    return pd.concat([g] + parts, axis=1)


def partition_features(g: pd.DataFrame,
                       families: list[str] | None = None) -> pd.DataFrame:
    """One hash partition (many urls) -> feature rows. ``g`` carries
    (url, warc_ts, lang, extract_ok, html_hash) + STAT_COLUMNS (or raw
    ``extracted_text``, computed here for single-process callers).

    ``families`` selects feature families (config.FAMILIES with alias
    expansion); selected families are computed over the sorted frame
    and column-concatenated in one pass — the reference's per-batch
    hstack of FeatureSets (src/main.rs:76-87)."""
    from ..config import expand_families, feature_schema
    fams = expand_families(families or ["all"])
    out_cols = feature_schema(families or ["all"])

    if "extracted_text" in g.columns:
        g = add_text_stats(g, texture=_needs_texture(families))
    g = g.sort_values(["url", "warc_ts", "html_hash"], kind="mergesort")
    # Exact dedup on (url, warc_ts): deterministic winner = min html_hash.
    g = g.drop_duplicates(["url", "warc_ts"], keep="first")
    dropped = int((~g["extract_ok"]).sum())
    g = g[g["extract_ok"]].reset_index(drop=True)
    if len(g) == 0:
        out = pd.DataFrame({c: [] for c in out_cols})
        out.attrs["dropped"] = dropped
        return out

    parts = [g[["url", "warc_ts", "lang"]]]
    parts.extend(fam.compute(g) for fam in fams)
    out = pd.concat(parts, axis=1)[out_cols]
    out.attrs["dropped"] = dropped
    return out


def _needs_texture(families: list[str] | None) -> bool:
    from ..config import TEXTURE_FAMILY_NAMES, expand_families
    fams = expand_families(families or ["all"])
    return any(f.name in TEXTURE_FAMILY_NAMES for f in fams)


def compute_features(pages_ds, num_partitions: int = 32,
                     concurrency: int | None = None,
                     families: list[str] | None = None):
    """Feature Dataset (no sink) — the flagship transform."""
    from ..stages.partition import partition_map
    from ..util import configure_context
    configure_context()
    ds = extract_stage(pages_ds, concurrency=concurrency,
                       texture=_needs_texture(families))
    ds = with_partition(ds, "url", num_partitions)
    return partition_map(
        ds, [PART_COL],
        lambda g: partition_features(g, families=families),
        num_partitions)


def run_checkpointed(pages_ds, out_dir: str, num_partitions: int = 32,
                     resume: bool = True,
                     concurrency: int | None = None,
                     emit: str = "manifest",
                     families: list[str] | None = None):
    """Flagship with the checkpointed sink: each partition commits its
    Parquet + lineage manifest atomically inside the partition task;
    the job's output Dataset is the (tiny) manifest table. On resume,
    committed partitions are filtered out right after partitioning —
    before the shuffle moves their rows.

    ``emit="features"`` makes the sink ALSO stream the committed
    feature rows downstream, so a consumer (e.g. the as-of probe join)
    overlaps with feature computation instead of re-reading the
    checkpoint after a barrier. NOTE: under resume, already-committed
    partitions are skipped and thus not re-emitted — use
    ``state.manifest.read_output`` for the complete table."""
    from ..util import configure_context
    configure_context()
    done = committed_parts(out_dir) if resume else set()

    ds = extract_stage(pages_ds, concurrency=concurrency,
                       texture=_needs_texture(families))
    ds = with_partition(ds, "url", num_partitions)
    if done:
        import ray
        done_ref = ray.put(frozenset(done))

        def drop_done(batch: pa.Table) -> pa.Table:
            import ray as _r
            d = _r.get(done_ref)
            mask = pa.array([p not in d for p in
                             batch[PART_COL].to_numpy()])
            return batch.filter(mask)

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    from ..stages.partition import partition_map

    def sink(g: pd.DataFrame) -> pd.DataFrame:
        # One block may hold several (whole) hash partitions; each is
        # committed independently so resume granularity stays per-part.
        rows = []
        feats = []
        for part, gp in g.groupby(PART_COL, sort=True):
            out = partition_features(gp.drop(columns=[PART_COL]),
                                     families=families)
            dropped = out.attrs.get("dropped", 0)
            watermark = (str(out["warc_ts"].max()) if len(out) else None)
            man = commit_partition(
                out_dir, int(part),
                pa.Table.from_pandas(out, preserve_index=False),
                key_cols=["url", "warc_ts"], dropped_rows=dropped,
                extra={"watermark": watermark})
            rows.append({"partition": np.int64(part),
                         "rows": np.int64(man["rows"]),
                         "dropped_rows": np.int64(man["dropped_rows"]),
                         "key_checksum": man["key_checksum"]})
            if emit == "features":
                feats.append(out)
        if emit == "features":
            if not feats:
                from ..config import feature_schema
                return pd.DataFrame(
                    {c: [] for c in feature_schema(families or ["all"])})
            return pd.concat(feats, ignore_index=True)
        if not rows:
            return pd.DataFrame({
                "partition": pd.Series(dtype=np.int64),
                "rows": pd.Series(dtype=np.int64),
                "dropped_rows": pd.Series(dtype=np.int64),
                "key_checksum": pd.Series(dtype=object)})
        return pd.DataFrame(rows)

    return partition_map(ds, [PART_COL], sink, num_partitions,
                         drop_part_col=False)


def probe_features(features_ds, probes_ds, num_partitions: int = 32,
                   value_cols: list[str] | None = None):
    """Point-in-time serve: for each (url, query_ts) probe, the feature
    vector of the latest snapshot with ``warc_ts <= query_ts`` (nulls
    when none) — the J3 sort-merge as-of join."""
    vals = value_cols or [c for c in FEATURE_COLUMNS
                          if c not in ("url", "warc_ts")]
    return asof_join(probes_ds, features_ds, key="url",
                     probe_ts="query_ts", snap_ts="warc_ts",
                     value_cols=vals, num_partitions=num_partitions)
