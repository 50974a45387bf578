# round-5 session-2 additions, batch 19: compaction/shard planning
# via a distributed prefix sum, a global dense term dictionary, and
# Fano-factor burstiness over the dense hourly grid.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (ORACLE, _combine_partials, _events, _path, np,
                      pa, partition_map, pc, pd, ray, rd, register)

_SHARD_CHARS = 50_000     # compaction target: chars per output shard
_DICT_BUCKET_CH = 1       # dictionary ranges: first char of term


@register("compaction_plan", sql="""
    SELECT doc_id, n_chars,
           CAST(sum(n_chars) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING)
                - n_chars AS BIGINT) AS start_offset,
           CAST((sum(n_chars) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING)
                 - n_chars) // {t} AS BIGINT) AS shard_id
    FROM documents ORDER BY doc_id""".format(t=_SHARD_CHARS))
def compaction_plan(sf_dir: str):
    """Compaction / shard planning: documents in key order packed
    into ~50k-char output shards by GLOBAL running size — shard_id =
    start_offset // target, the assignment every lakehouse compactor
    and every fixed-size training-shard writer computes. The global
    prefix sum is distributed exactly like systematic_sample's rank:
    pass 1 histograms per-key-range char totals inside map_batches
    (range partials, dimension-sized), the driver prefix-sums them
    into per-range starting offsets, and pass 2 — ONE hash exchange
    on the range id — sorts each range locally and adds its
    broadcast offset. Pure integers; no global sort, no driver
    data."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "n_chars"])
    _B = 64  # doc_ids per range bucket

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        bk = b["doc_id"].to_numpy(np.int64) // _B
        g = pd.DataFrame({
            "bucket": bk,
            "chars": b["n_chars"].to_numpy(np.int64)}) \
            .groupby("bucket", as_index=False).sum()
        g["chars"] = g["chars"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(hist, batch_format="pandas"),
        ["bucket"], ["chars"]).sort_values("bucket")
    offsets = dict(zip(
        h["bucket"].to_numpy(np.int64),
        np.concatenate(([0],
                        np.cumsum(h["chars"].to_numpy(np.int64))))
        [:-1]))
    off_ref = ray.put(offsets)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["bucket"] = out["doc_id"].to_numpy(np.int64) // _B
        return out

    def plan(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        outs = []
        for bk, sub in g.groupby("bucket", sort=True):
            sub = sub.sort_values("doc_id", kind="mergesort")
            ch = sub["n_chars"].to_numpy(np.int64)
            start = np.cumsum(ch) - ch + off[int(bk)]
            outs.append(pd.DataFrame({
                "doc_id": sub["doc_id"].to_numpy(np.int64),
                "n_chars": ch,
                "start_offset": start,
                "shard_id": start // _SHARD_CHARS}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({c: pd.Series(dtype=np.int64)
                          for c in ("doc_id", "n_chars",
                                    "start_offset", "shard_id")})

    tagged = ds.map_batches(add_bucket, batch_format="pandas")
    return partition_map(tagged, ["bucket"], plan, 16) \
        .sort("doc_id")


@register("vocab_dictionary", sql="""
    WITH t AS (SELECT unnest(string_split_regex(
                 trim(text, E' \\t\\n\\r\\f'),
                 '[ \\t\\n\\r\\f]+')) AS term
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS tf
          FROM t GROUP BY term)
    SELECT term, tf,
           CAST(dense_rank() OVER (ORDER BY term) - 1 AS BIGINT)
             AS term_id
    FROM c ORDER BY term""")
def vocab_dictionary(sf_dir: str):
    """Global dictionary build: every distinct term assigned a DENSE
    contiguous id in lexicographic order (plus its corpus frequency)
    — the dictionary-encoding primitive behind categorical feature
    hashing-free encoders and Parquet/Arrow dictionary columns,
    where ids must be stable, gap-free, and engine-independent.
    Per-batch (term, tf) partials collapse before ONE term exchange;
    each partition owns a DISJOINT lexicographic range (partition by
    first char), counts its distinct terms, and the driver
    prefix-sums the per-range distinct counts into starting ids — a
    second pass is avoided because the partition can rank locally
    once its range offset is known (the same two-pass rank as
    systematic_sample, keyed by string ranges)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        if len(vals) == 0:
            return pd.DataFrame({
                "term": pd.Series(dtype=object),
                "tf": pd.Series(dtype=np.int64)})
        g = pd.DataFrame({"term": vals.to_numpy(
            zero_copy_only=False)}) \
            .groupby("term", as_index=False).size()
        return pd.DataFrame({
            "term": g["term"].to_numpy(object),
            "tf": g["size"].to_numpy(np.int64)})

    def add_range(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        t = out["term"].astype(str)
        out["rng"] = t.str.slice(0, _DICT_BUCKET_CH)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # complete (term, tf) per disjoint first-char range
        t = g.groupby(["rng", "term"], as_index=False)["tf"].sum()
        t = t.sort_values(["rng", "term"], kind="mergesort")
        local = t.groupby("rng", sort=False).cumcount()
        return pd.DataFrame({
            "rng": t["rng"].to_numpy(object),
            "term": t["term"].to_numpy(object),
            "tf": t["tf"].to_numpy(np.int64),
            "local_id": local.to_numpy(np.int64)})

    ranged = ds.map_batches(partial, batch_format="pandas") \
        .map_batches(add_range, batch_format="pandas")
    t = partition_map(ranged, ["rng"], finish, 16).to_pandas()
    # driver: distinct counts per range -> starting ids
    sizes = t.groupby("rng").size().sort_index()
    starts = sizes.cumsum().shift(fill_value=0)
    out = t.copy()
    out["term_id"] = out["local_id"].to_numpy(np.int64) \
        + out["rng"].map(starts).to_numpy(np.int64)
    return pd.DataFrame({
        "term": out["term"].to_numpy(object),
        "tf": out["tf"].to_numpy(np.int64),
        "term_id": out["term_id"].to_numpy(np.int64)}) \
        .sort_values("term", kind="mergesort").reset_index(drop=True)


@register("hourly_fano", sql="""
    WITH b AS (SELECT min(date_trunc('hour', ts)) AS mn,
                      max(date_trunc('hour', ts)) AS mx
               FROM events),
    c AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
    h AS (SELECT CAST(1 + date_diff('hour', mn, mx) AS BIGINT)
                   AS n_hours FROM b),
    s AS (SELECT event_type,
                 CAST(sum(n) AS BIGINT) AS sx,
                 CAST(sum(n * n) AS BIGINT) AS sxx
          FROM c GROUP BY event_type)
    SELECT event_type, h.n_hours, sx AS n_events,
           (CAST(h.n_hours AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(h.n_hours AS DOUBLE) * CAST(sx AS DOUBLE))
             AS fano
    FROM s, h ORDER BY event_type""")
def hourly_fano(sf_dir: str):
    """Burstiness census: the Fano factor (index of dispersion,
    population var / mean) of each event type's HOURLY arrival
    counts over the dense global hour grid — ≈1 for Poisson traffic,
    ≫1 for bursty bot/batch traffic; the dispersion test stream
    monitors run. Zero hours matter and are accounted ANALYTICALLY
    (they add nothing to Σx or Σx², only to the grid length H), so
    the engine never materializes the dense grid: per-batch integer
    (type, hour) partials collapse, the driver folds Σx and Σx² per
    type plus the global hour span, and the Fano is one shared float
    expression H·Σx² − (Σx)² over H·Σx. Map-only at any scale."""
    ds = _events(sf_dir, ["event_type", "ts"])
    _HUS = 3_600_000_000

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hr = b["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // _HUS
        g = pd.DataFrame({"event_type": b["event_type"]
                          .to_numpy(object), "hr": hr,
                          "n": np.ones(len(b), np.int64)}) \
            .groupby(["event_type", "hr"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "hr"], ["n"])
    H = np.int64(c["hr"].max() - c["hr"].min() + 1)
    n = c["n"].to_numpy(np.int64)
    s = c.assign(sx=n, sxx=n * n) \
        .groupby("event_type", as_index=False)[["sx", "sxx"]].sum()
    s = s.sort_values("event_type", kind="mergesort") \
        .reset_index(drop=True)
    sx = s["sx"].to_numpy(np.int64)
    sxx = s["sxx"].to_numpy(np.int64)
    fano = (np.float64(H) * sxx.astype(np.float64)
            - sx.astype(np.float64) * sx.astype(np.float64)) \
        / (np.float64(H) * sx.astype(np.float64))
    return pd.DataFrame({
        "event_type": s["event_type"].to_numpy(object),
        "n_hours": np.full(len(s), H, np.int64),
        "n_events": sx, "fano": fano})
