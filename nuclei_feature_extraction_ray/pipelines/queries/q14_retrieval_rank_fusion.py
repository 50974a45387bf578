# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_COMBINE_MAX_ROWS, _combine_partials, _events, _path, np, partition_map, pd, ray, rd, register)

_RRF_K = 60.0
_RRF_TOP = 20
_TEMPLATE_PREFIX = 80


def _global_rank_offsets(hist: pd.DataFrame, key: str):
    """(sorted_keys, offsets) for exact global row_number: offset[k] =
    rows with a strictly GREATER key (descending rank order). The
    quality_rank two-phase machinery, factored for reuse."""
    hist = hist.sort_values(key, ascending=False, kind="mergesort")
    offs = np.concatenate(([0], np.cumsum(
        hist["n"].to_numpy(np.int64))[:-1]))
    keys = hist[key].to_numpy(np.int64)
    order = np.argsort(keys)
    return keys[order], offs[order]


@register("rrf_fusion", sql="""
    WITH f AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                      CAST(len(regexp_extract_all(text, '\\S+'))
                           AS BIGINT) AS n_words
               FROM documents),
    r AS (SELECT doc_id,
                 CAST(row_number() OVER (
                     ORDER BY n_chars DESC, doc_id) AS BIGINT) AS r1,
                 CAST(row_number() OVER (
                     ORDER BY n_words DESC, doc_id) AS BIGINT) AS r2
          FROM f)
    SELECT doc_id, r1, r2,
           1.0 / (60.0 + CAST(r1 AS DOUBLE))
             + 1.0 / (60.0 + CAST(r2 AS DOUBLE)) AS rrf
    FROM r ORDER BY rrf DESC, doc_id LIMIT 20""")
def rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of two retrieval orderings (here:
    length rank and word-count rank) — the standard score-free way
    to merge rankings from heterogeneous scorers. Scale plan: each
    ranking is an exact distributed row_number (the quality_rank
    two-phase: bounded key histogram -> broadcast offsets -> ONE
    co-partitioning exchange assigns offset + intra-key cumcount),
    run twice on different keys; the fused score is row-local and
    the global top-20 is per-block top-20 partials merged on the
    driver (blocks x 20 rows, never the corpus)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "n_chars", "text"])

    def feats(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "n_chars": b["n_chars"].to_numpy(np.int64),
            "n_words": b["text"].astype(str).str.count(r"\S+")
            .to_numpy(np.int64)})

    # materialized: the feats pipeline (documents read + \S+ regex
    # count) is consumed THREE times (two rank histograms + the ranked
    # chain) — without pinning, lazy re-execution runs it all thrice
    # (the rfm_segments / triangle_count recipe).
    f = ds.map_batches(feats, batch_format="pandas").materialize()

    def hist_of(col):
        def h(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(col, as_index=False).agg(
                n=(col, "size"))
            g["n"] = g["n"].astype(np.int64)
            return g
        return h

    h1 = _combine_partials(f.map_batches(hist_of("n_chars"),
                                         batch_format="pandas"),
                           ["n_chars"], ["n"])
    h2 = _combine_partials(f.map_batches(hist_of("n_words"),
                                         batch_format="pandas"),
                           ["n_words"], ["n"])
    ref1 = ray.put(_global_rank_offsets(h1, "n_chars"))
    ref2 = ray.put(_global_rank_offsets(h2, "n_words"))

    def rank_by(col, ref, out):
        def r(g: pd.DataFrame) -> pd.DataFrame:
            k, o = ray.get(ref)
            g = g.sort_values([col, "doc_id"],
                              ascending=[False, True],
                              kind="mergesort")
            base = o[np.searchsorted(k, g[col].to_numpy(np.int64))]
            intra = g.groupby(col, sort=False).cumcount().to_numpy()
            g = g.copy()
            g[out] = (base + intra + 1).astype(np.int64)
            return g
        return r

    ranked = partition_map(f, ["n_chars"],
                           rank_by("n_chars", ref1, "r1"), 16)
    ranked = partition_map(ranked, ["n_words"],
                           rank_by("n_words", ref2, "r2"), 16)

    def fuse_top(g: pd.DataFrame) -> pd.DataFrame:
        rrf = (1.0 / (_RRF_K + g["r1"].to_numpy(np.int64)
                      .astype(np.float64))
               + 1.0 / (_RRF_K + g["r2"].to_numpy(np.int64)
                        .astype(np.float64)))
        g = g.assign(rrf=rrf).sort_values(
            ["rrf", "doc_id"], ascending=[False, True],
            kind="mergesort").head(_RRF_TOP)
        return g[["doc_id", "r1", "r2", "rrf"]]

    cand = ranked.map_batches(fuse_top, batch_format="pandas") \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(cand) > _COMBINE_MAX_ROWS:
        raise ValueError("rrf_fusion: top-k candidate pull exceeds "
                         "the combine guard")
    out = cand.sort_values(["rrf", "doc_id"],
                           ascending=[False, True],
                           kind="mergesort").head(_RRF_TOP)
    return out.reset_index(drop=True)


@register("template_overlap", sql="""
    WITH h AS (SELECT DISTINCT source,
                      md5(substr(text, 1, 80)) AS h
               FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2 ORDER BY source_a, source_b""")
def template_overlap(sf_dir: str):
    """Template-sharing census: how many distinct 80-char document
    PREFIXES each pair of sources shares — the boilerplate/mirror
    detector that catches syndicated headers exact-dedup misses
    (bodies differ, templates agree). Scale plan: per-batch DISTINCT
    (prefix-md5, source) rows (16-byte keys on the wire, never
    text), ONE hash exchange on the fingerprint co-locates every
    holder, per-partition pair enumeration is a C self-merge bounded
    by sources-per-fingerprint, and the (source, source) combine is
    grid-sized. Portable md5 keeps the fingerprint oracle-equal."""
    from ...functions.hashing import md5_hex_flat

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "text"])

    def fp(b: pd.DataFrame) -> pd.DataFrame:
        pref = b["text"].astype(str).str.slice(0, _TEMPLATE_PREFIX)
        return pd.DataFrame({
            "h": md5_hex_flat(list(pref)),
            "source": b["source"].astype(object),
        }).drop_duplicates(ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["h", "source"])
        m = g.merge(g, on="h")
        m = m[m["source_x"] < m["source_y"]]
        c = m.groupby(["source_x", "source_y"], as_index=False).agg(
            n=("h", "size"))
        return pd.DataFrame({
            "source_a": c["source_x"].astype(object),
            "source_b": c["source_y"].astype(object),
            "n": c["n"].to_numpy(np.int64)})

    out = _combine_partials(
        partition_map(ds.map_batches(fp, batch_format="pandas"),
                      ["h"], pairs, 16),
        ["source_a", "source_b"], ["n"]).rename(
            columns={"n": "n_shared"})
    out["n_shared"] = out["n_shared"].astype(np.int64)
    return out.sort_values(["source_a", "source_b"],
                           kind="mergesort").reset_index(drop=True)


@register("daily_anomaly", sql="""
    WITH c AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
                 CAST(sum(n) AS HUGEINT) AS sn,
                 CAST(sum(n * n) AS HUGEINT) AS ssn
          FROM c GROUP BY event_type)
    SELECT c.event_type, day, n,
           (CAST(n AS DOUBLE)
              - CAST(s.sn AS DOUBLE) / CAST(s.nd AS DOUBLE))
             / sqrt(CAST(s.nd * s.ssn - s.sn * s.sn AS DOUBLE)
                    / CAST(s.nd * (s.nd - 1) AS DOUBLE)) AS z,
           abs((CAST(n AS DOUBLE)
              - CAST(s.sn AS DOUBLE) / CAST(s.nd AS DOUBLE))
             / sqrt(CAST(s.nd * s.ssn - s.sn * s.sn AS DOUBLE)
                    / CAST(s.nd * (s.nd - 1) AS DOUBLE))) > 2.0
               AS is_anomaly
    FROM c JOIN s USING (event_type) ORDER BY event_type, day""")
def daily_anomaly(sf_dir: str):
    """Per-stream daily-volume anomaly flags: each (event_type, day)
    count z-scored against that stream's own day-count distribution,
    |z| > 2 flagged — the ingest-monitoring alarm. The (type, day)
    grid is bounded, so one combine holds all counts and the
    mean/std/z compose from exact integer sums on the driver in the
    identical expression order as the SQL."""
    ds = _events(sf_dir, columns=["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"event_type": b["event_type"]
                          .to_numpy(object),
                          "day": b["ts"].dt.normalize().to_numpy()})
        g = d.groupby(["event_type", "day"], as_index=False).agg(
            n=("day", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "day"], ["n"])
    rows = []
    for et, g in grid.groupby("event_type", sort=True):
        n = g["n"].to_numpy(np.int64)
        nd = len(n)
        sn = int(n.sum())
        ssn = int((n * n).sum())
        mean = np.float64(sn) / np.float64(nd)
        sd = np.sqrt(np.float64(nd * ssn - sn * sn)
                     / np.float64(nd * (nd - 1)))
        z = (n.astype(np.float64) - mean) / sd
        rows.append(pd.DataFrame({
            "event_type": np.full(nd, et, object),
            "day": g["day"].to_numpy(),
            "n": n, "z": z, "is_anomaly": np.abs(z) > 2.0}))
    out = pd.concat(rows, ignore_index=True)
    return out.sort_values(["event_type", "day"],
                           kind="mergesort").reset_index(drop=True)
