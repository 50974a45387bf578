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

import os

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


#: salting defaults: a url is "hot" above this many rows (a healthy
#: partition's worth); its rows are split into time buckets of
#: SALT_SPAN with ROLLING_SPAN of left overlap.
HOT_THRESHOLD = 50_000
SALT_SPAN = 4 * ROLLING_SPAN

#: The per-row numeric feature columns are PACKED into one
#: FixedSizeList column for the url-hash exchange: Ray's hash shuffle
#: pays per column per partition per block, and 80+ separate float
#: columns were measured 3x slower to exchange than one packed column
#: of the same bytes. Ints round-trip exactly through float64
#: (counts << 2^53).
_INT_PACK = {"n_chars", "n_bytes", "n_lines", "n_tokens",
             "degenerate_class"}
_FV = "__fv"


def _pack_cols(texture: bool) -> list[str]:
    return STAT_COLUMNS + (TEXTURE_COLUMNS if texture else [])


def pack_features(ds, texture: bool = True):
    cols = _pack_cols(texture)

    def pack(batch: pa.Table) -> pa.Table:
        mat = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False)
             .astype(np.float64) for c in cols])
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), mat.shape[1])
        return batch.drop_columns(cols).append_column(_FV, arr)

    return ds.map_batches(pack, batch_format="pyarrow")


def make_unpack_features(texture: bool = True):
    cols = _pack_cols(texture)

    def unpack(batch: pa.Table) -> pa.Table:
        if _FV not in batch.column_names:
            return batch
        fv = batch[_FV]
        arr = fv.combine_chunks() if isinstance(fv, pa.ChunkedArray) \
            else fv
        flat = arr.values.to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(batch), len(cols))
        batch = batch.drop_columns([_FV])
        for i, c in enumerate(cols):
            col = np.ascontiguousarray(mat[:, i])
            if c in _INT_PACK:
                col = col.astype(np.int64)
            batch = batch.append_column(c, pa.array(col))
        return batch

    return unpack


def _prepare_salted(pages_ds, hot: dict, num_partitions: int,
                    concurrency):
    """Phase 1 of salting: bucket summaries of the hot urls' rows ->
    exact per-(url, bucket) carries, broadcast via ray.put. Returns
    (carry_ref, span_us)."""
    import ray

    from ..stages import salt as salt_mod
    span_us = int(SALT_SPAN.value // 1000)
    hot_set = pa.array(sorted(hot), pa.string())

    def only_hot(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch["url"], value_set=hot_set))

    hot_pages = pages_ds.map_batches(only_hot, batch_format="pyarrow")
    hot_ds = extract_stage(hot_pages, concurrency=concurrency,
                           texture=False)
    hot_ds = salt_mod.add_bucket(hot_ds, span_us)
    summary = salt_mod.bucket_summaries(
        hot_ds, SESSION_GAP.total_seconds(), num_partitions)
    carries = salt_mod.build_carries(summary, SESSION_GAP.total_seconds())
    return ray.put(carries), span_us


def _assign_salted(ds, hot: dict, num_partitions: int, span_us: int):
    """Tag every row with (PART_COL, __bucket, __own); EMIT the
    left-overlap copies for hot rows (own=False). Cold rows keep the
    plain url-hash partitioning; hot cells map into ids >= P."""
    overlap_us = int(ROLLING_SPAN.value // 1000)
    hot_set = pa.array(sorted(hot), pa.string())
    P = num_partitions

    def assign(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        urls = batch["url"].to_numpy(zero_copy_only=False)
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        hotm = pc.is_in(batch["url"], value_set=hot_set) \
            .to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            part = (hash64(urls) % np.uint64(P)).astype(np.int64)
            bucket = np.full(len(urls), -1, np.int64)
            if hotm.any():
                hu = hash64(urls[hotm])
                b = ts[hotm] // span_us
                bucket[hotm] = b
                part[hotm] = P + ((hu * np.uint64(1000003)
                                   + b.astype(np.uint64))
                                  % np.uint64(P)).astype(np.int64)
        own = np.ones(len(urls), bool)
        batch = batch.append_column("__bucket", pa.array(bucket))
        out = batch.append_column(PART_COL, pa.array(part)) \
                   .append_column("__own", pa.array(own))
        # overlap copies -> next bucket, own=False
        ov = hotm & (ts % span_us >= span_us - overlap_us)
        if ov.any():
            idx = np.nonzero(ov)[0]
            cp = batch.take(idx)
            with np.errstate(over="ignore"):
                hu = hash64(urls[idx])
                b1 = ts[idx] // span_us + 1
                cpart = P + ((hu * np.uint64(1000003)
                              + b1.astype(np.uint64))
                             % np.uint64(P)).astype(np.int64)
            cp = cp.set_column(cp.schema.get_field_index("__bucket"),
                               "__bucket", pa.array(b1))
            cp = cp.append_column(PART_COL, pa.array(cpart)) \
                   .append_column("__own",
                                  pa.array(np.zeros(len(idx), bool)))
            out = pa.concat_tables([out, cp])
        return out

    return ds.map_batches(assign, batch_format="pyarrow")


def _featurize_rows(g: pd.DataFrame, families, num_partitions: int,
                    carries, out_cols) -> pd.DataFrame:
    """Features for a frame of rows that may mix normal partitions
    (PART_COL < P, or no salting columns at all) and salted hot cells
    (PART_COL >= P, grouped by (url, __bucket) with carries)."""
    from ..stages.salt import _EMPTY_CARRY, salted_bucket_features
    drop = [c for c in ("__bucket", "__own", PART_COL)
            if c in g.columns]
    if carries is None or PART_COL not in g.columns:
        return partition_features(g.drop(columns=drop),
                                  families=families)
    parts = []
    dropped = 0
    norm = g[g[PART_COL] < num_partitions]
    if len(norm):
        r = partition_features(norm.drop(columns=drop),
                               families=families)
        dropped += r.attrs.get("dropped", 0)
        parts.append(r)
    hot_rows = g[g[PART_COL] >= num_partitions]
    if len(hot_rows):
        rolling_us = int(ROLLING_SPAN.value // 1000)
        for (url, b), gp in hot_rows.groupby(
                ["url", "__bucket"], sort=True):
            r = salted_bucket_features(
                gp.drop(columns=[PART_COL]),
                carries.get((url, int(b)), _EMPTY_CARRY),
                rolling_us, SESSION_GAP.total_seconds(), out_cols)
            if r is not None:
                dropped += r.attrs.get("dropped", 0)
                parts.append(r)
    if not parts:
        out = pd.DataFrame({c: [] for c in out_cols})
    else:
        out = pd.concat(parts, ignore_index=True)[out_cols]
    out.attrs["dropped"] = dropped
    return out


def make_partition_fn(families, num_partitions: int, carry_ref=None):
    """Per-block feature function: normal rows through
    partition_features; salted cells through salted_bucket_features."""
    from ..config import feature_schema
    out_cols = feature_schema(families or ["all"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        import ray
        carries = ray.get(carry_ref) if carry_ref is not None else None
        return _featurize_rows(g, families, num_partitions, carries,
                               out_cols)

    return fn


def compute_features(pages_ds, num_partitions: int = 32,
                     concurrency: int | None = None,
                     families: list[str] | None = None,
                     hot_threshold: int | None = HOT_THRESHOLD):
    """Feature Dataset (no sink) — the flagship transform. With
    ``hot_threshold`` set (default), a cheap url-column pre-scan
    detects partition-breaking urls and routes them through salted
    time-bucket sub-partitions (stages/salt.py) — byte-identical
    output, bounded partition sizes."""
    from ..stages.partition import partition_map
    from ..util import configure_context
    configure_context()
    hot = detect_hot_urls_cached(pages_ds, hot_threshold)
    tex = _needs_texture(families)
    ds = extract_stage(pages_ds, concurrency=concurrency, texture=tex)
    ds = pack_features(ds, texture=tex)
    unpack = make_unpack_features(texture=tex)
    if not hot:
        ds = with_partition(ds, "url", num_partitions)
        return partition_map(
            ds, [PART_COL], make_partition_fn(families, num_partitions),
            num_partitions, arrow_pre_fn=unpack)
    carry_ref, span_us = _prepare_salted(pages_ds, hot, num_partitions,
                                         concurrency)
    ds = _assign_salted(ds, hot, num_partitions, span_us)
    return partition_map(
        ds, [PART_COL],
        make_partition_fn(families, num_partitions, carry_ref),
        num_partitions * 2, drop_part_col=False, arrow_pre_fn=unpack)


def detect_hot_urls_cached(pages_ds, hot_threshold: int | None) -> dict:
    from ..stages.salt import detect_hot_urls
    if not hot_threshold:
        return {}
    return detect_hot_urls(pages_ds, "url", hot_threshold)


def run_checkpointed(pages_ds, out_dir: str, num_partitions: int = 32,
                     resume: bool = True,
                     concurrency: int | None = None,
                     emit: str = "manifest",
                     families: list[str] | None = None,
                     hot_threshold: int | None = HOT_THRESHOLD,
                     probes_ds=None, probe_dir: str | None = None):
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

    hot = detect_hot_urls_cached(pages_ds, hot_threshold)
    tex = _needs_texture(families)
    ds = extract_stage(pages_ds, concurrency=concurrency, texture=tex)
    ds = pack_features(ds, texture=tex)
    unpack = make_unpack_features(texture=tex)
    carry_ref = None
    if hot:
        carry_ref, span_us = _prepare_salted(
            pages_ds, hot, num_partitions, concurrency)
        ds = _assign_salted(ds, hot, num_partitions, span_us)
    else:
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

    from ..config import feature_schema
    out_cols = feature_schema(families or ["all"])

    # Fused probe serve: the probe table is small (driver-combinable),
    # so broadcast it pre-partitioned by url hash and let every sink
    # task as-of join its slice WHILE the partition's features are
    # still in memory — no second job, no checkpoint re-read. Only
    # valid unsalted (a hot url's snapshots span salted partitions);
    # with salting active use probe_features_from_checkpoint after.
    probes_ref = None
    if probes_ds is not None and probe_dir is not None and hot:
        # Silently skipping the fused serve here would make a later
        # finalize_fused_probes see zero probe files and write EVERY
        # probe as an all-NaN leftover row — silently wrong output.
        raise ValueError(
            "fused probe serve is invalid while hot-url salting is "
            "active (%d hot urls: a hot url's snapshots span salted "
            "partitions, so a probe may need another partition's "
            "rows); run the checkpoint first and serve probes with "
            "probe_features_from_checkpoint, or pass "
            "hot_threshold=None" % len(hot))
    if probes_ds is not None and probe_dir is not None:
        import ray

        from ..stages.partition import _part_values
        ppd = probes_ds.limit(5_000_001).to_pandas()
        if len(ppd) > 5_000_000:
            raise ValueError(
                "fused probe serve expects a driver-sized probe "
                "table; use probe_features_from_checkpoint for "
                "larger probe sets")
        ppd["__ppart"] = _part_values(
            ppd["url"].to_numpy(dtype=object), num_partitions)
        # broadcast as Arrow: plasma shares the buffers zero-copy, so
        # sink tasks don't each unpickle a pandas frame — they filter
        # their partition's slice and convert only that
        probes_ref = ray.put(pa.Table.from_pandas(
            ppd, preserve_index=False))
        os.makedirs(probe_dir, exist_ok=True)
        probe_cols = [c for c in ppd.columns if c != "__ppart"]
        probe_vals = [c for c in out_cols if c not in ("url", "warc_ts")]

    def sink(g: pd.DataFrame) -> pd.DataFrame:
        # One block may hold several (whole) hash partitions; each is
        # committed independently so resume granularity stays per-part.
        import ray
        carries = ray.get(carry_ref) if carry_ref is not None else None
        probes_all = ray.get(probes_ref) if probes_ref is not None \
            else None
        rows = []
        feats = []
        for part, gp in g.groupby(PART_COL, sort=True):
            out = _featurize_rows(gp, families, num_partitions,
                                  carries, out_cols)
            dropped = out.attrs.get("dropped", 0)
            watermark = (str(out["warc_ts"].max()) if len(out) else None)
            salted = bool(part >= num_partitions)
            # probe file FIRST, manifest second: the manifest is the
            # atomic commit marker, so a crash between the two leaves
            # an uncommitted partition (recomputed on resume) rather
            # than a committed one with a probe hole resume would skip.
            if probes_all is not None:
                import pyarrow.compute as pc_

                from ..stages.asof import local_asof_merge
                pr_t = probes_all.filter(
                    pc_.equal(probes_all["__ppart"],
                              pa.scalar(int(part))))
                if pr_t.num_rows:
                    pr = pr_t.to_pandas()
                    served = local_asof_merge(
                        pr[probe_cols], out, "url", "query_ts",
                        "warc_ts", probe_vals, probe_cols)
                    _atomic_parquet(
                        served, os.path.join(
                            probe_dir, "part=%05d.parquet" % int(part)))
            man = commit_partition(
                out_dir, int(part),
                pa.Table.from_pandas(out, preserve_index=False),
                key_cols=["url", "warc_ts"], dropped_rows=dropped,
                extra={"watermark": watermark, "salted": salted,
                       **({"salted_cells": int(
                           gp.groupby(["url", "__bucket"]).ngroups)}
                          if salted else {})})
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

    return partition_map(ds, [PART_COL], sink,
                         num_partitions * (2 if hot else 1),
                         drop_part_col=False, arrow_pre_fn=unpack)


def _atomic_parquet(df: pd.DataFrame, path: str) -> None:
    import pyarrow.parquet as pq
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.replace(tmp, path)


def finalize_fused_probes(probe_dir: str, probes_ds,
                          num_partitions: int,
                          families: list[str] | None = None) -> int:
    """After a fused run_checkpointed(probes_ds=...) job: serve the
    probes whose url-hash partition had NO page rows at all (no sink
    task ran there, and by construction they have no matching
    snapshots -> all-NaN feature vector). Returns the number of
    leftover probe rows written."""
    from ..config import feature_schema
    from ..stages.asof import local_asof_merge
    from ..stages.partition import _part_values
    served = set()
    if os.path.isdir(probe_dir):
        for f in os.listdir(probe_dir):
            if f.startswith("part=") and f.endswith(".parquet"):
                tag = f.split("=")[1].split(".")[0]
                if tag.isdigit():
                    served.add(int(tag))
    if not served:
        # Zero partition probe files means the fused serve never ran
        # (wrong probe_dir, or a salted/unfused job) — treating every
        # probe as page-less would emit an all-NaN table that LOOKS
        # like valid output. Refuse instead.
        raise ValueError(
            "finalize_fused_probes: no part=*.parquet probe files in "
            "%r — the fused probe serve did not run here; pass the "
            "probe_dir given to run_checkpointed(probes_ds=...), or "
            "serve probes with probe_features_from_checkpoint"
            % probe_dir)
    # Same driver-size guard as the fused serve: the leftover pass
    # pulls the probe table onto the driver.
    ppd = probes_ds.limit(5_000_001).to_pandas()
    if len(ppd) > 5_000_000:
        raise ValueError(
            "finalize_fused_probes expects a driver-sized probe table "
            "(> 5M rows); use probe_features_from_checkpoint for "
            "larger probe sets")
    parts = _part_values(ppd["url"].to_numpy(dtype=object),
                         num_partitions)
    missing = ppd[~np.isin(parts, sorted(served))]
    if len(missing) == 0:
        return 0
    out_cols = feature_schema(families or ["all"])
    vals = [c for c in out_cols if c not in ("url", "warc_ts")]
    probe_cols = list(ppd.columns)
    sn = pd.DataFrame(columns=["url", "warc_ts"] + vals)
    served_df = local_asof_merge(missing, sn, "url", "query_ts",
                                 "warc_ts", vals, probe_cols)
    os.makedirs(probe_dir, exist_ok=True)
    _atomic_parquet(served_df,
                    os.path.join(probe_dir, "part=leftover.parquet"))
    return len(missing)


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


def probe_features_from_checkpoint(feat_dir: str, probes_ds,
                                   num_partitions: int = 32,
                                   value_cols: list[str] | None = None):
    """As-of probe serve that EXPLOITS the checkpoint layout: the
    committed feature table is already hash-partitioned by url, so
    only the (tiny) probe table is exchanged — each partition task
    reads its ``part=<id>/data.parquet`` locally and runs the C merge.
    The wide feature table never crosses a shuffle (measured 10+ s for
    the 87-column exchange at 200k rows that this avoids).

    Falls back to the generic exchange join when the checkpoint holds
    salted partitions (a hot url's snapshots span time buckets, so a
    probe may need an earlier bucket's rows).
    """
    import pyarrow.parquet as pq

    from ..stages.asof import local_asof_merge
    from ..stages.partition import partition_map
    from ..state.manifest import committed_parts, part_dir, read_output
    from ..util import configure_context
    configure_context()
    parts = committed_parts(feat_dir)
    if any(p >= num_partitions for p in parts):
        return probe_features(read_output(feat_dir), probes_ds,
                              num_partitions, value_cols)
    if value_cols is None and parts:
        # derive from the checkpoint itself: a families subset writes
        # a narrower schema than FEATURE_COLUMNS
        sch = pq.read_schema(os.path.join(
            part_dir(feat_dir, min(parts)), "data.parquet"))
        value_cols = [c for c in sch.names
                      if c not in ("url", "warc_ts")]
    vals = value_cols or [c for c in FEATURE_COLUMNS
                          if c not in ("url", "warc_ts")]
    probe_cols = list(probes_ds.schema().names)
    out_cols = probe_cols + ["warc_ts"] + vals
    probes = with_partition(probes_ds, "url", num_partitions)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for part, gp in g.groupby(PART_COL, sort=True):
            fp = os.path.join(part_dir(feat_dir, int(part)),
                              "data.parquet")
            pr = gp.drop(columns=[PART_COL])
            if os.path.exists(fp):
                sn = pq.read_table(
                    fp, columns=["url", "warc_ts"] + vals).to_pandas()
            else:
                sn = pd.DataFrame(columns=["url", "warc_ts"] + vals)
            outs.append(local_asof_merge(
                pr, sn, "url", "query_ts", "warc_ts", vals,
                probe_cols))
        if not outs:
            return pd.DataFrame({c: [] for c in out_cols})
        return pd.concat(outs, ignore_index=True)

    return partition_map(probes, [PART_COL], fn, num_partitions,
                         drop_part_col=False)
