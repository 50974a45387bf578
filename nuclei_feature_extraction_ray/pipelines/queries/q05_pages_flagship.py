# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (COSINE_TAU, _BENCH_GRAM_MAX, _COMBINE_MAX_ROWS, _combine_partials, _pages_path, _path, _sorted_member, ann_mod, cooc_sql, datetime, dedup_mod, np, os, pa, partition_map, partitioned_apply, pc, pd, pq, ray, rd, register, runlen_sql, session_aggregate, spectrum_sql, text_stats_frame, text_stats_sql)

def _corpus_scale(sf_dir: str) -> str:
    return "t1" if "0.001" in sf_dir else "t2"


def _pages_glob(scale: str) -> str:
    from ...corpus import corpus_dir
    return os.path.join(corpus_dir(scale), "pages", "*.parquet")


#: gap threshold shared by pages_sessions and the flagship session
#: family (pipelines.pages_features.SESSION_GAP = 30 days)
_PAGES_GAP_SEC = 30 * 86400


def pages_sessions_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_sessions`` — identical shape to the
    events ``sessionize``/``session_stats`` oracles, over the corpus
    parquet. Duplicate (url, warc_ts) rows make ts alone a non-total
    order, and DuckDB's lag and cumulative-sum windows may order ties
    DIFFERENTLY (observed: a tie pair split across sessions once in
    many runs), so a row_number is pinned first and every window
    orders by (warc_ts, rn) — one consistent total order, which is all
    sessionize needs (tie gaps are 0 under any consistent order)."""
    return """
    WITH l0 AS (
      SELECT url, warc_ts,
             row_number() OVER (PARTITION BY url ORDER BY warc_ts)
               AS rn
      FROM read_parquet('{glob}')
    ), g AS (
      SELECT url, warc_ts, rn,
             epoch(warc_ts - lag(warc_ts) OVER w) AS gap_sec
      FROM l0
      WINDOW w AS (PARTITION BY url ORDER BY warc_ts, rn)
    ), s AS (
      SELECT url, warc_ts,
             sum(CASE WHEN gap_sec IS NULL
                      OR gap_sec > CAST({gap} AS DOUBLE)
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY url ORDER BY warc_ts, rn
                     ROWS UNBOUNDED PRECEDING) - 1 AS session_id
      FROM g)
    SELECT url, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(warc_ts) AS start_ts, max(warc_ts) AS end_ts,
           epoch(max(warc_ts) - min(warc_ts)) AS duration_sec
    FROM s GROUP BY url, session_id""".format(
        glob=_pages_glob(scale), gap=_PAGES_GAP_SEC)


def pages_features_core_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_features_core`` — the flagship
    extract -> dedup -> url-partition -> windowed-features path with
    the text+windowed families, verified bit-exact end-to-end.

    The corpus ``text`` column IS the canonical extraction
    (corpus.extract_text_one; the pipeline's vectorized extractor is
    byte-identical, tests/test_corpus.py), so the SQL starts from
    ``text``. Urls carrying duplicate (url, warc_ts) snapshots are
    excluded on BOTH sides: the engine's dedup winner (min 64-bit
    SipHash of the html bytes) is not SQL-expressible; whole-url
    exclusion leaves every other url's windows untouched. Float
    policy: every windowed column is either an epoch()-formula match
    (gap_sec, days_since_first, duration), an exact-integer fold
    (r30_* over int n_chars), or a single int/int division
    (lang_stab_5, r30_mean) — bit-exact in both engines."""
    stats = ", ".join("%s AS %s" % (expr, name) for name, expr
                      in text_stats_sql("text").items())
    return """
    WITH pages AS (
      {pages}
    ), stats AS (
      SELECT url, warc_ts, lang, {stats} FROM pages
    ), l1 AS (
      SELECT *,
        CAST(row_number() OVER wu - 1 AS BIGINT) AS snap_idx,
        epoch(warc_ts - lag(warc_ts) OVER wu) AS gap_sec,
        CAST(n_chars - lag(n_chars) OVER wu AS DOUBLE) AS delta_n_chars,
        epoch(warc_ts - min(warc_ts) OVER wc) / 86400.0
          AS days_since_first,
        CAST(min(n_chars) OVER w30 AS DOUBLE) AS r30_min,
        CAST(max(n_chars) OVER w30 AS DOUBLE) AS r30_max,
        CAST(sum(n_chars) OVER w30 AS DOUBLE) / (count(*) OVER w30)
          AS r30_mean,
        CAST(count(*) OVER w30 AS BIGINT) AS r30_count,
        CAST(CASE WHEN lag(lang) OVER wu IS NOT NULL
                  AND lang <> lag(lang) OVER wu
             THEN 1 ELSE 0 END AS BIGINT) AS lang_changed,
        CAST(1 + (CASE WHEN lag(lang, 1) OVER wu = lang
                  THEN 1 ELSE 0 END)
               + (CASE WHEN lag(lang, 2) OVER wu = lang
                  THEN 1 ELSE 0 END)
               + (CASE WHEN lag(lang, 3) OVER wu = lang
                  THEN 1 ELSE 0 END)
               + (CASE WHEN lag(lang, 4) OVER wu = lang
                  THEN 1 ELSE 0 END) AS DOUBLE)
          / LEAST(row_number() OVER wu, 5) AS lang_stab_5
      FROM stats
      WINDOW wu AS (PARTITION BY url ORDER BY warc_ts),
             wc AS (PARTITION BY url ORDER BY warc_ts
                    ROWS UNBOUNDED PRECEDING),
             w30 AS (PARTITION BY url ORDER BY warc_ts
                     RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
                     AND CURRENT ROW)
    )
    SELECT url, warc_ts, lang, n_chars, n_bytes, n_lines, n_tokens,
           mean_token_len, ttr, degenerate_class, alpha_ratio,
           digit_ratio, upper_ratio, ws_ratio, other_ratio, snap_idx,
           gap_sec, delta_n_chars, days_since_first, r30_min, r30_max,
           r30_mean, r30_count,
           CAST(sum(CASE WHEN gap_sec IS NULL
                         OR gap_sec > CAST({gap} AS DOUBLE)
                    THEN 1 ELSE 0 END)
                OVER (PARTITION BY url ORDER BY warc_ts
                      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
             AS session_id,
           lang_changed, lang_stab_5
    FROM l1""".format(pages=_pages_clean_select(scale), stats=stats,
                      gap=_PAGES_GAP_SEC)


def _pages_clean_select(scale: str) -> str:
    """The filtered-corpus SELECT shared by the flagship oracles:
    parseable pages only, whole urls with duplicate (url, warc_ts)
    keys excluded (see pages_features_core_sql)."""
    return """SELECT url, warc_ts, text, lang
      FROM read_parquet('{glob}')
      WHERE text IS NOT NULL
        AND url NOT IN (SELECT url FROM read_parquet('{glob}')
                        GROUP BY url, warc_ts HAVING count(*) > 1)
    """.format(glob=_pages_glob(scale))


def pages_features_full_sql(scale: str) -> str:
    """DuckDB oracle for the FULL flagship payload (all families, 88
    columns): the core windowed CTE joined with the three texture-
    analog family oracles (functions/texture.cooc_sql / runlen_sql /
    spectrum_sql, each already bit-exact over documents) keyed through
    a row_number mapping — (url, warc_ts) is unique post-filter."""
    from ...functions.texture import (COOC_COLUMNS, RUNLEN_COLUMNS,
                                     SPECTRUM_COLUMNS, cooc_sql,
                                     runlen_sql, spectrum_sql)
    from ...config import feature_schema
    tex_cols = ", ".join(
        ["c.%s" % c for c in COOC_COLUMNS]
        + ["r.%s" % c for c in RUNLEN_COLUMNS]
        + ["s.%s" % c for c in SPECTRUM_COLUMNS])
    core_cols = ", ".join(
        "core.%s" % c for c in feature_schema(["text", "windowed"]))
    return """
    WITH core AS ({core}),
    docsv AS (
      SELECT row_number() OVER (ORDER BY url, warc_ts) AS doc_id,
             url, warc_ts, text
      FROM ({pages})
    ),
    cooc_t AS ({cooc}),
    runl_t AS ({runl}),
    spec_t AS ({spec})
    SELECT {core_cols}, {tex_cols}
    FROM core
    JOIN docsv d ON core.url = d.url AND core.warc_ts = d.warc_ts
    JOIN cooc_t c ON c.doc_id = d.doc_id
    JOIN runl_t r ON r.doc_id = d.doc_id
    JOIN spec_t s ON s.doc_id = d.doc_id""".format(
        core=pages_features_core_sql(scale),
        pages=_pages_clean_select(scale),
        cooc=cooc_sql("docsv"), runl=runlen_sql("docsv"),
        spec=spectrum_sql("docsv"),
        core_cols=core_cols, tex_cols=tex_cols)


@register("pages_features_full")   # SQL attached in all_oracle_sql
def pages_features_full(sf_dir: str):
    """The COMPLETE flagship payload — all families (structure,
    charclass, temporal, session, lang + the cooc/runlen/spectrum
    texture analogs; 88 columns) through the real pipeline — with a
    full DuckDB oracle (pages_features_full_sql). Duplicate-key urls
    excluded on both sides as in pages_features_core."""
    from ...corpus import corpus_dir
    from ..pages_features import compute_features
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts", "html", "lang"])
    dup_set = pa.array(sorted(_duplicated_ts_urls(pages)), pa.string())

    def drop_dup(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(
            pc.is_in(batch["url"], value_set=dup_set)))

    return compute_features(pages, num_partitions=16).map_batches(
        drop_dup, batch_format="pyarrow")


#: core (text+windowed) value columns served by the probe join
def _core_value_cols() -> list[str]:
    from ...config import feature_schema
    return [c for c in feature_schema(["text", "windowed"])
            if c not in ("url", "warc_ts")]


def pages_probes_core_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_probes_core``: the flagship as-of
    probe serve (J3) against the core feature table — DuckDB's native
    ASOF LEFT JOIN on (url, query_ts >= warc_ts) over the
    pages_features_core CTE. Numeric feature values are CAST to DOUBLE
    on both sides: null padding for unmatched probes upcasts engine
    ints partition-locally, so the comparison dtype is pinned."""
    vals = []
    for c in _core_value_cols():
        vals.append("f.lang" if c == "lang"
                    else "CAST(f.%s AS DOUBLE) AS %s" % (c, c))
    return """
    WITH feats AS ({core}),
    probes AS (
      SELECT url, query_ts FROM read_parquet('{probes}')
      WHERE url NOT IN (SELECT url FROM read_parquet('{glob}')
                        GROUP BY url, warc_ts HAVING count(*) > 1)
    )
    SELECT p.url, p.query_ts, f.warc_ts, {vals}
    FROM probes p ASOF LEFT JOIN feats f
      ON p.url = f.url AND p.query_ts >= f.warc_ts""".format(
        core=pages_features_core_sql(scale),
        probes=os.path.join(os.path.dirname(
            os.path.dirname(_pages_glob(scale))), "probes.parquet"),
        glob=_pages_glob(scale), vals=", ".join(vals))


@register("pages_probes_core")   # SQL attached in all_oracle_sql
def pages_probes_core(sf_dir: str):
    """Flagship point-in-time probe serve with a full oracle: probes
    (url, query_ts) as-of joined (J3, stages/asof.py) against the core
    feature table — every probe sees the latest snapshot's features
    with warc_ts <= query_ts, nulls when none. Numeric values emitted
    as float64 (see pages_probes_core_sql)."""
    from ...corpus import corpus_dir
    from ..pages_features import compute_features, probe_features
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts", "html", "lang"])
    probes = rd.read_parquet(os.path.join(d, "probes.parquet"))
    dup_set = pa.array(sorted(_duplicated_ts_urls(pages)), pa.string())

    def drop_dup(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(
            pc.is_in(batch["url"], value_set=dup_set)))

    feats = compute_features(pages, num_partitions=16,
                             families=["text", "windowed"]) \
        .map_batches(drop_dup, batch_format="pyarrow")
    probes = probes.map_batches(drop_dup, batch_format="pyarrow")
    vals = _core_value_cols()
    out = probe_features(feats, probes, num_partitions=16,
                         value_cols=vals)

    def widen(batch: pa.Table) -> pa.Table:
        for c in vals:
            if c == "lang":
                continue
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(
                i, c, pc.cast(batch[c], pa.float64()))
        return batch

    return out.map_batches(widen, batch_format="pyarrow")


def _duplicated_ts_urls(pages_ds, num_partitions: int = 16) -> list[str]:
    """Urls having any duplicate (url, warc_ts) snapshot pair —
    detected distributed (one narrow url-hash exchange of the two key
    columns); the returned url list is tiny by nature (exact-dup keys
    are data errors)."""
    def find(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g.duplicated(["url", "warc_ts"], keep=False)]
        return pd.DataFrame({"url": pd.unique(d["url"])})

    out = partitioned_apply(
        pages_ds.select_columns(["url", "warc_ts"]), "url", find,
        num_partitions)
    return out.to_pandas()["url"].tolist()


@register("pages_features_core")   # SQL attached in all_oracle_sql
def pages_features_core(sf_dir: str):
    """The flagship transform (extract -> exact dedup -> ONE url-hash
    shuffle -> per-partition sort -> windowed feature kernels) with
    the text+windowed families — its full DuckDB oracle is
    pages_features_core_sql. Urls with duplicate (url, warc_ts) keys
    are excluded on both sides (see the SQL docstring)."""
    from ...corpus import corpus_dir
    from ..pages_features import compute_features
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts", "html", "lang"])
    dup = _duplicated_ts_urls(pages)
    feats = compute_features(pages, num_partitions=16,
                             families=["text", "windowed"])
    dup_set = pa.array(sorted(dup), pa.string())

    def drop_dup(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(
            pc.is_in(batch["url"], value_set=dup_set)))

    return feats.map_batches(drop_dup, batch_format="pyarrow")


@register("pages_features")
def pages_features(sf_dir: str):
    from ...corpus import corpus_dir
    from ..pages_features import compute_features
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts", "html", "lang"])
    return compute_features(pages, num_partitions=16)


@register("pages_probe_features")
def pages_probe_features(sf_dir: str):
    from ...corpus import corpus_dir
    from ..pages_features import compute_features, probe_features
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts", "html", "lang"])
    probes = rd.read_parquet(os.path.join(d, "probes.parquet"))
    feats = compute_features(pages, num_partitions=16)
    return probe_features(feats, probes, num_partitions=16)


@register("pages_sessions")
def pages_sessions(sf_dir: str):
    from ...corpus import corpus_dir
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g["n"] = 1.0
        out = session_aggregate(g, "url", "warc_ts", "n",
                                30 * 86400.0)
        return out[["url", "session_id", "n_events", "start_ts",
                    "end_ts", "duration_sec"]]

    return partitioned_apply(pages, "url", fn, 16,
                             sort_cols=["url", "warc_ts"])


def pages_domains_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_domains`` (per-domain crawl rollup)."""
    return """
    SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
           min(warc_ts) AS first_ts, max(warc_ts) AS last_ts,
           epoch(max(warc_ts) - min(warc_ts)) AS span_sec
    FROM read_parquet('{glob}')
    GROUP BY host""".format(glob=_pages_glob(scale))


@register("pages_domains")   # SQL attached in all_oracle_sql
def pages_domains(sf_dir: str):
    """Per-domain crawl rollup — the corpus-level skew census a crawl
    pipeline runs before choosing salting thresholds (the Zipf-hot
    domains this corpus plants are exactly what stages/salt detects).

    Scale plan: host extraction is one vectorized RE2 pass; per-batch
    PRE-aggregation to (host, url) granularity shrinks the exchange
    (snapshots of one url sit adjacently in crawl order), then ONE
    hash exchange on host and a per-partition groupby finishes counts,
    distinct urls, and the time span."""
    from ...corpus import corpus_dir
    from ...stages.window import us_seconds
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts"])

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["url"], r"^[a-z]+://(?P<h>[^/]+)")
        # non-matching URL: DuckDB regexp_extract yields '' — mirror
        # it (extract_regex yields NULL) so the host groups agree
        t = pa.table({"host": pc.fill_null(pc.struct_field(m, "h"), ""),
                      "url": batch["url"],
                      "warc_ts": batch["warc_ts"]})
        g = t.group_by(["host", "url"]).aggregate(
            [("url", "count"), ("warc_ts", "min"), ("warc_ts", "max")])
        return g.rename_columns(["host", "url", "n", "ts_min",
                                 "ts_max"])

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby(["host", "url"], as_index=False).agg(
            n=("n", "sum"), ts_min=("ts_min", "min"),
            ts_max=("ts_max", "max"))
        out = u.groupby("host", as_index=False).agg(
            n_pages=("n", "sum"), n_urls=("url", "size"),
            first_ts=("ts_min", "min"), last_ts=("ts_max", "max"))
        us = (out["last_ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64)
              - out["first_ts"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        out["span_sec"] = us_seconds(us)
        out["n_pages"] = out["n_pages"].astype(np.int64)
        out["n_urls"] = out["n_urls"].astype(np.int64)
        return out

    return partitioned_apply(pages.map_batches(
        partial, batch_format="pyarrow"), "host", finish, 8)


def pages_url_features_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_url_features``. DuckDB's
    ``regexp_extract`` returns '' on no match — the Arrow side
    ``fill_null('')``s to agree (the pages_domain_cap ADVICE fix)."""
    return """
    WITH p AS (
      SELECT url, warc_ts,
             regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
             regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
             regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1)
               AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS query
      FROM read_parquet('{glob}'))
    SELECT url, warc_ts, scheme, host,
           regexp_extract(host, '\\.([a-z0-9-]+)$', 1) AS tld,
           CAST(len(regexp_extract_all(path, '/[^/]+')) AS BIGINT)
             AS path_depth,
           CAST(CASE WHEN query = '' THEN 0
                ELSE len(string_split(query, '&')) END AS BIGINT)
             AS n_params,
           CAST(length(url) AS BIGINT) AS url_len
    FROM p""".format(glob=_pages_glob(scale))


@register("pages_url_features")   # SQL attached in all_oracle_sql
def pages_url_features(sf_dir: str):
    """URL parsing features per crawl row — scheme / host / TLD /
    path depth / query-param count / length, the structural columns a
    web-corpus quality or domain-mix stage keys on before any text is
    touched.

    Scale plan: PURE MAP, zero shuffle — five RE2 kernels
    (``pc.extract_regex`` / ``count_substring_regex``) per Arrow
    batch, no Python per row, text column never read."""
    from ...corpus import corpus_dir
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d), columns=["url", "warc_ts"])

    def fn(b: pa.Table) -> pa.Table:
        url = b["url"]

        def ex(src, pat, grp):
            m = pc.extract_regex(src, pat)
            return pc.fill_null(pc.struct_field(m, grp), "")

        scheme = ex(url, r"^(?P<g>[a-z]+)://", "g")
        host = ex(url, r"^[a-z]+://(?P<g>[^/]+)", "g")
        path = ex(url, r"^[a-z]+://[^/?#]+(?P<g>[^?#]*)", "g")
        query = ex(url, r"\?(?P<g>[^#]*)", "g")
        tld = ex(host, r"\.(?P<g>[a-z0-9-]+)$", "g")
        depth = pc.cast(pc.count_substring_regex(path, "/[^/]+"),
                        pa.int64())
        n_params = pc.if_else(
            pc.equal(query, ""), pa.scalar(0, pa.int64()),
            pc.cast(pc.add(pc.count_substring(query, "&"), 1),
                    pa.int64()))
        return pa.table({
            "url": url, "warc_ts": b["warc_ts"], "scheme": scheme,
            "host": host, "tld": tld, "path_depth": depth,
            "n_params": n_params,
            "url_len": pc.cast(pc.utf8_length(url), pa.int64())})

    return pages.map_batches(fn, batch_format="pyarrow")


def url_versions_sql(scale: str) -> str:
    """DuckDB oracle for ``url_versions``. Duplicate (url, warc_ts)
    snapshot rows are collapsed FIRST (DISTINCT) so version numbers
    are total-order-free."""
    return """
    WITH s AS (SELECT DISTINCT url, warc_ts
               FROM read_parquet('{glob}')),
    v AS (SELECT url, warc_ts AS valid_from,
                 lead(warc_ts) OVER (PARTITION BY url
                                     ORDER BY warc_ts) AS valid_to,
                 row_number() OVER (PARTITION BY url
                                    ORDER BY warc_ts) AS version
          FROM s)
    SELECT url, valid_from, valid_to,
           CAST(version AS BIGINT) AS version,
           CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_current
    FROM v""".format(glob=_pages_glob(scale))


@register("url_versions")   # SQL attached in all_oracle_sql
def url_versions(sf_dir: str):
    """SCD2 validity-interval reconstruction: each url's snapshot
    history becomes versioned rows with [valid_from, valid_to)
    intervals and an is_current flag — the slowly-changing-dimension
    build a warehouse runs on every crawl delta. Duplicate snapshots
    collapse first so version numbers are total-order-free.

    Scale plan: per-batch DISTINCT (url, warc_ts) partials shrink the
    exchange (same-url snapshots sit adjacently in crawl order), ONE
    url exchange, then lead/version are a per-partition sorted shift
    and cumcount — no window state crosses partitions because the url
    is the partition key."""
    from ...stages.partition import partition_map
    from ...corpus import corpus_dir
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts"])

    def distinct_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    def versions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["url", "warc_ts"]) \
            .sort_values(["url", "warc_ts"], kind="mergesort")
        from ...stages.window import segment_codes, segment_starts
        codes = segment_codes(g["url"].to_numpy())
        ts = g["warc_ts"].to_numpy("datetime64[us]")
        n = len(g)
        valid_to = np.full(n, np.datetime64("NaT", "us"))
        if n > 1:
            same = codes[1:] == codes[:-1]
            valid_to[:-1][same] = ts[1:][same]
        version = np.arange(n, dtype=np.int64) \
            - segment_starts(codes) + 1
        return pd.DataFrame({
            "url": g["url"].to_numpy(object),
            "valid_from": ts, "valid_to": valid_to,
            "version": version,
            "is_current": np.isnat(valid_to).astype(np.int64)})

    return partition_map(
        pages.map_batches(distinct_partial, batch_format="pandas"),
        ["url"], versions, 16)


#: trending_terms: risers per day
_TREND_K = 10


def trending_terms_sql(scale: str) -> str:
    """DuckDB oracle for ``trending_terms``. The day id is
    floor(epoch/86400) as BIGINT — exact in IEEE doubles at
    microsecond precision (a us-offset from midnight is ~1e-11 days,
    far above the 2e-13 ulp), so it equals the engine's integer
    ``ts_us // DAY``."""
    return """
    WITH p AS (
      SELECT CAST(floor(epoch(warc_ts) / 86400) AS BIGINT) AS day,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM read_parquet('{glob}')
      WHERE text IS NOT NULL
        AND trim(text, E' \\t\\n\\r\\f') <> ''),
    toks AS (SELECT day, unnest(w) AS tok FROM p),
    c AS (SELECT day, tok, CAST(count(*) AS BIGINT) AS n
          FROM toks GROUP BY day, tok),
    j AS (SELECT c.day, c.tok, c.n,
                 coalesce(prev.n, 0) AS n_prev
          FROM c LEFT JOIN c prev
            ON prev.tok = c.tok AND prev.day = c.day - 1),
    r AS (SELECT *, row_number() OVER (
            PARTITION BY day
            ORDER BY n - n_prev DESC, tok) AS rn FROM j)
    SELECT day, tok, n, CAST(n_prev AS BIGINT) AS n_prev,
           CAST(n - n_prev AS BIGINT) AS delta
    FROM r WHERE rn <= {k}""".format(glob=_pages_glob(scale),
                                     k=_TREND_K)


@register("trending_terms")   # SQL attached in all_oracle_sql
def trending_terms(sf_dir: str):
    """Temporal text analytics: the top-K day-over-day RISING terms
    per crawl day (delta = today's count minus yesterday's, ties ->
    lexicographic) — the trend detector a feed/monitoring pipeline
    runs on every ingest day.

    Scale plan: per-batch (day, term, count) partials collapse the
    token stream before the ONE term-keyed exchange; each partition
    holds a term's full day series, so yesterday's count is an
    in-partition merge on (term, day+1) and the per-day top-K is a
    partial top-K per partition — the driver merge is bounded by
    days x K x partitions (guarded)."""
    from ...stages.dedup import _tokenize
    from ...stages.partition import partition_map

    DAY_US = 86_400_000_000
    from ...corpus import corpus_dir
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["warc_ts", "text"],
                            filter=pc.field("text").is_valid())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        days = (b["warc_ts"].to_numpy("datetime64[us]")
                .astype(np.int64) // DAY_US)
        toks, dcol = [], []
        for i, t in enumerate(_tokenize(b["text"])):
            if not t:
                continue
            toks.extend(t)
            dcol.extend([days[i]] * len(t))
        if not toks:
            return pd.DataFrame({"day": pd.Series(dtype=np.int64),
                                 "tok": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        g = pd.DataFrame({"day": np.asarray(dcol, np.int64),
                          "tok": np.asarray(toks, object)}) \
            .groupby(["day", "tok"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return g

    def risers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["day", "tok"], as_index=False).agg(
            n=("n", "sum"))
        prev = g[["day", "tok", "n"]].copy()
        prev["day"] = prev["day"] + 1
        m = g.merge(prev, on=["day", "tok"], how="left",
                    suffixes=("", "_prev"))
        m["n_prev"] = m["n_prev"].fillna(0).astype(np.int64)
        m["delta"] = (m["n"] - m["n_prev"]).astype(np.int64)
        m = m.sort_values(["day", "delta", "tok"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return m.groupby("day", sort=False).head(_TREND_K)

    parts = partition_map(
        pages.map_batches(partial, batch_format="pandas"),
        ["tok"], risers, 16) \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("trending_terms: day x K x partitions frame "
                         "too large for the driver combine")
    out = parts.sort_values(["day", "delta", "tok"],
                            ascending=[True, False, True],
                            kind="mergesort") \
        .groupby("day", sort=False).head(_TREND_K)
    return out[["day", "tok", "n", "n_prev", "delta"]] \
        .reset_index(drop=True)


def pages_latest_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_latest``. Ties at the max timestamp
    (the corpus plants same-ts duplicate snapshots with differing
    html) are resolved by AGGREGATING over the tied rows — count,
    max length, min md5 — so the result is total-order-free."""
    return """
    WITH p AS (SELECT url, warc_ts, text FROM read_parquet('{glob}')
               WHERE text IS NOT NULL),
    m AS (SELECT url, max(warc_ts) AS last_ts,
                 CAST(count(*) AS BIGINT) AS n_snapshots
          FROM p GROUP BY url)
    SELECT m.url, m.last_ts, m.n_snapshots,
           CAST(count(*) AS BIGINT) AS n_latest,
           CAST(max(length(p.text)) AS BIGINT) AS latest_len,
           min(md5(p.text)) AS latest_md5
    FROM m JOIN p ON p.url = m.url AND p.warc_ts = m.last_ts
    GROUP BY m.url, m.last_ts, m.n_snapshots""".format(
        glob=_pages_glob(scale))


@register("pages_latest")   # SQL attached in all_oracle_sql
def pages_latest(sf_dir: str):
    """Keep-latest-snapshot census per url (the recency pass a crawl
    curation runs before serving 'current' pages): snapshot count,
    latest timestamp, and the latest content's length + md5
    fingerprint. Same-ts ties aggregate (count/max-len/min-md5) so
    the answer is deterministic without a total order on content.

    Scale shape: per-block partials reduce each block to <= one row
    per url BEFORE the exchange (text never crosses it — only length,
    md5, and counts), then ONE url-hash exchange and a per-partition
    fold. Failed reads (null text) are dropped at the read (M5)."""
    from ...corpus import corpus_dir
    from ...functions.hashing import md5_hex_flat
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts", "text"],
                            filter=pc.field("text").is_valid())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        tsmax = b.groupby("url")["warc_ts"].transform("max")
        top = b[b["warc_ts"] == tsmax].copy()
        top["md5"] = md5_hex_flat(list(top["text"]))
        top["ln"] = top["text"].str.len().astype(np.int64)
        a = b.groupby("url", as_index=False).agg(
            n=("warc_ts", "size"), ts_max=("warc_ts", "max"))
        t = top.groupby("url", as_index=False).agg(
            n_at=("md5", "size"), len_max=("ln", "max"),
            md5_min=("md5", "min"))
        out = a.merge(t, on="url")
        out["n"] = out["n"].astype(np.int64)
        out["n_at"] = out["n_at"].astype(np.int64)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        last = g.groupby("url")["ts_max"].transform("max")
        tot = g.groupby("url", as_index=False).agg(
            n_snapshots=("n", "sum"), last_ts=("ts_max", "max"))
        top = g[g["ts_max"] == last].groupby("url", as_index=False) \
            .agg(n_latest=("n_at", "sum"),
                 latest_len=("len_max", "max"),
                 latest_md5=("md5_min", "min"))
        out = tot.merge(top, on="url")
        for c in ("n_snapshots", "n_latest", "latest_len"):
            out[c] = out[c].astype(np.int64)
        return out[["url", "last_ts", "n_snapshots", "n_latest",
                    "latest_len", "latest_md5"]]

    return partitioned_apply(pages.map_batches(
        partial, batch_format="pandas"), "url", fold, 8)


#: max urls kept per host by pages_domain_cap (FineWeb-style cap)
_DOMAIN_CAP = 20


def pages_domain_cap_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_domain_cap``. (first_ts, url) is a
    total order per host (urls are distinct after the group-by), so
    the row_number is deterministic."""
    return """
    WITH u AS (
      SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
             url, min(warc_ts) AS first_ts,
             CAST(count(*) AS BIGINT) AS n_snapshots
      FROM read_parquet('{glob}') GROUP BY host, url
    ), r AS (
      SELECT host, url, first_ts, n_snapshots,
             row_number() OVER (PARTITION BY host
                                ORDER BY first_ts, url) AS rk
      FROM u)
    SELECT host, url, first_ts, n_snapshots, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {cap}""".format(glob=_pages_glob(scale),
                                       cap=_DOMAIN_CAP)


@register("pages_domain_cap")   # SQL attached in all_oracle_sql
def pages_domain_cap(sf_dir: str):
    """Per-domain contribution cap (the FineWeb/C4 anti-spam pass):
    keep at most ``_DOMAIN_CAP`` urls per host, earliest-crawled
    first — a Zipf-hot domain (this corpus plants several) otherwise
    dominates the training mix. Emits the kept (host, url) census
    with first-crawl ts, snapshot count, and within-host rank.

    Scale shape: per-block PRE-aggregation to (host, url, min_ts,
    count) rows — snapshots of one url sit adjacently in crawl order
    so blocks shrink hard and text never leaves the read — then ONE
    host-hash exchange and a per-partition fold (pandas groupby
    cumcount, C across all hosts of the partition). The cap decision
    needs the url's GLOBAL min ts, so per-url rows can't be dropped
    before the exchange — but they are already maximally reduced."""
    from ...corpus import corpus_dir
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts"])
    return domain_cap_core(pages)


def domain_cap_core(pages, num_partitions: int = 8):
    """``pages_domain_cap`` over any (url, warc_ts) Dataset — split
    out so stress fixtures (skewed synthetic corpora) can drive the
    same operator the registered query runs."""
    def partial(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["url"], r"^[a-z]+://(?P<h>[^/]+)")
        # non-matching URL: DuckDB regexp_extract yields '' — mirror
        # it (extract_regex yields NULL) so the host groups agree
        t = pa.table({"host": pc.fill_null(pc.struct_field(m, "h"), ""),
                      "url": batch["url"],
                      "warc_ts": batch["warc_ts"]})
        g = t.group_by(["host", "url"]).aggregate(
            [("warc_ts", "count"), ("warc_ts", "min")])
        return g.rename_columns(["host", "url", "n", "ts_min"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby(["host", "url"], as_index=False).agg(
            n_snapshots=("n", "sum"), first_ts=("ts_min", "min"))
        u = u.sort_values(["host", "first_ts", "url"],
                          kind="mergesort")
        u["rk"] = u.groupby("host", sort=False).cumcount() \
            .to_numpy(np.int64) + 1
        u = u[u["rk"] <= _DOMAIN_CAP].copy()
        u["n_snapshots"] = u["n_snapshots"].astype(np.int64)
        return u[["host", "url", "first_ts", "n_snapshots", "rk"]]

    return partitioned_apply(pages.map_batches(
        partial, batch_format="pyarrow"), "host", fold, num_partitions)


def pages_drift_sql(scale: str) -> str:
    """DuckDB oracle for ``pages_drift``. Same-(url, ts) duplicate
    snapshots are collapsed to min(md5) FIRST so the lag sequence is
    total-order-free; the final rate is one exact-int division."""
    return """
    WITH p AS (
      SELECT url, warc_ts, min(md5(text)) AS h
      FROM read_parquet('{glob}') WHERE text IS NOT NULL
      GROUP BY url, warc_ts
    ), l AS (
      SELECT url, h,
             lag(h) OVER (PARTITION BY url ORDER BY warc_ts) AS ph
      FROM p)
    SELECT url, CAST(count(*) AS BIGINT) AS n_snapshots,
           CAST(sum(CASE WHEN ph IS NOT NULL AND h <> ph
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
           CASE WHEN count(*) > 1 THEN
             CAST(sum(CASE WHEN ph IS NOT NULL AND h <> ph
                      THEN 1 ELSE 0 END) AS DOUBLE) / (count(*) - 1)
           ELSE 0.0 END AS change_rate
    FROM l GROUP BY url""".format(glob=_pages_glob(scale))


@register("pages_drift")   # SQL attached in all_oracle_sql
def pages_drift(sf_dir: str):
    """Content drift rate per url — the recrawl-priority signal a
    crawler computes to schedule refreshes: of a url's consecutive
    snapshot pairs, what fraction changed content? Same-(url, ts)
    duplicate snapshots (the corpus plants 2 with differing html) are
    collapsed to the min content hash before the lag, so the sequence
    — and therefore the rate — needs no total order on content.

    Scale shape: md5 is computed where the text already lives (the
    read task); blocks pre-collapse to (url, ts, min-md5) rows so
    only 32-byte digests cross the ONE url-hash exchange; the
    per-partition fold re-collapses cross-block (url, ts) ties, then
    one vectorized shift + compare per partition. change_rate is a
    single IEEE division of two exact ints — deterministic under any
    fold order."""
    from ...corpus import corpus_dir
    from ...functions.hashing import md5_hex_flat
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts", "text"],
                            filter=pc.field("text").is_valid())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["url", "warc_ts"]].assign(
            h=md5_hex_flat(list(b["text"])))
        return b.groupby(["url", "warc_ts"], as_index=False).agg(
            h=("h", "min"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["url", "warc_ts"], as_index=False).agg(
            h=("h", "min"))
        g = g.sort_values(["url", "warc_ts"], kind="mergesort")
        ph = g.groupby("url", sort=False)["h"].shift()
        g["chg"] = np.where(ph.notna() & (g["h"] != ph), 1, 0) \
            .astype(np.int64)
        out = g.groupby("url", as_index=False).agg(
            n_snapshots=("h", "size"), n_changes=("chg", "sum"))
        out["n_snapshots"] = out["n_snapshots"].astype(np.int64)
        out["n_changes"] = out["n_changes"].astype(np.int64)
        den = out["n_snapshots"].to_numpy(np.int64) - 1
        out["change_rate"] = np.where(
            den > 0,
            out["n_changes"].to_numpy(np.float64)
            / np.maximum(den, 1), 0.0)
        return out[["url", "n_snapshots", "n_changes", "change_rate"]]

    return partitioned_apply(pages.map_batches(
        partial, batch_format="pandas"), "url", fold, 8)


def line_dedup_sql(scale: str) -> str:
    """DuckDB oracle for ``line_dedup``.  ``rid`` keeps duplicate
    (url, warc_ts) snapshot rows (the corpus plants 2) as separate
    output rows, matching the Ray side's pure-map row multiplicity."""
    return """
    WITH p AS (SELECT url, warc_ts, text,
                      row_number() OVER (ORDER BY url, warc_ts) AS rid
               FROM read_parquet('{glob}')
               WHERE text IS NOT NULL),
    lines AS (SELECT rid, url, warc_ts,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1)
                       AS ord
              FROM p),
    hot AS (SELECT line FROM lines GROUP BY line
            HAVING count(DISTINCT url) >= {n})
    SELECT url, warc_ts,
           coalesce(string_agg(line, chr(10) ORDER BY ord)
                    FILTER (WHERE line NOT IN (SELECT line FROM hot)),
                    '') AS clean_text,
           CAST(count(*) FILTER (WHERE line NOT IN
                                 (SELECT line FROM hot)) AS BIGINT)
             AS n_kept,
           CAST(count(*) FILTER (WHERE line IN
                                 (SELECT line FROM hot)) AS BIGINT)
             AS n_dropped
    FROM lines GROUP BY rid, url, warc_ts""".format(
        glob=_pages_glob(scale), n=_LINE_DEDUP_MIN_DOCS)


#: a line is boilerplate once it appears in >= this many distinct urls
_LINE_DEDUP_MIN_DOCS = 3


@register("line_dedup")   # SQL attached in all_oracle_sql
def line_dedup(sf_dir: str):
    """C4-style cross-document line dedup: drop every line that occurs
    in >= 3 distinct urls (boilerplate), keeping row order/multiplicity;
    failed-read (null-text) pages are dropped at the read (M5 semantics).

    Scale plan: pass 1 exchanges only distinct (line-hash128,
    url-hash64) triples and reduces them to the (small, guarded)
    boilerplate set; pass 2 is a pure broadcast map — split, hash,
    two-column merge against the broadcast set, and a fully
    vectorized ``pc.binary_join`` reconstruction.  The corpus text is
    read twice (two streaming passes) rather than materialized."""
    from ...corpus import corpus_dir
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts", "text"],
                            filter=pc.field("text").is_valid())
    hot = dedup_mod.hot_lines(pages, "text", "url",
                              min_docs=_LINE_DEDUP_MIN_DOCS)
    return dedup_mod.remove_hot_lines(pages, "text", hot)


#: boilerplate_strip: a line is a host's template once it appears on
#: >= this many DISTINCT urls of that host (the per-domain rule —
#: line_dedup's global threshold counts urls across all hosts).
_BOILER_MIN_URLS = 2


def boilerplate_strip_sql(scale: str) -> str:
    """DuckDB oracle for ``boilerplate_strip`` — per-host template
    removal; ``rid`` keeps snapshot-row multiplicity exactly like
    line_dedup_sql."""
    return """
    WITH p AS (SELECT url, warc_ts, text,
                      regexp_extract(url, '^[a-z]+://([^/]+)', 1)
                        AS host,
                      row_number() OVER (ORDER BY url, warc_ts) AS rid
               FROM read_parquet('{glob}')
               WHERE text IS NOT NULL),
    lines AS (SELECT rid, host, url, warc_ts,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1)
                       AS ord
              FROM p),
    hot AS (SELECT host, line FROM lines GROUP BY host, line
            HAVING count(DISTINCT url) >= {m}),
    mk AS (SELECT l.*, CASE WHEN hot.line IS NOT NULL THEN 1 ELSE 0
                       END AS is_hot
           FROM lines l LEFT JOIN hot
             ON l.host = hot.host AND l.line = hot.line)
    SELECT url, warc_ts, host,
           coalesce(string_agg(line, chr(10) ORDER BY ord)
                    FILTER (WHERE is_hot = 0), '') AS clean_text,
           CAST(count(*) FILTER (WHERE is_hot = 0) AS BIGINT)
             AS n_kept,
           CAST(count(*) FILTER (WHERE is_hot = 1) AS BIGINT)
             AS n_dropped
    FROM mk GROUP BY rid, url, warc_ts, host""".format(
        glob=_pages_glob(scale), m=_BOILER_MIN_URLS)


@register("boilerplate_strip")   # SQL attached in all_oracle_sql
def boilerplate_strip(sf_dir: str):
    """Per-host boilerplate stripping (CCNet-style per-domain template
    removal): a line is dropped when it appears on >= 2 DISTINCT urls
    of the SAME host — navigation chrome, footers and cookie banners
    are site templates, so the evidence is counted within the site.
    The per-host grouping is the difference from ``line_dedup``'s
    global rule: a line shared by two pages of one site is template;
    the same line on two pages of different sites is coincidence and
    survives here.

    Scale plan: pass 1 exchanges only distinct (host, line-hash128,
    url-hash64) rows keyed on host, so the per-line within-host
    distinct-url count resolves in one partition. The hot set
    (templates — bounded) broadcasts once; pass 2 is a pure map
    rebuild via ``pc.binary_join``. Text crosses the wire zero
    times."""
    from ...corpus import corpus_dir
    d = corpus_dir(_corpus_scale(sf_dir))
    pages = rd.read_parquet(_pages_path(d),
                            columns=["url", "warc_ts", "text"],
                            filter=pc.field("text").is_valid())

    def add_host(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["url"], r"^[a-z]+://(?P<h>[^/]+)")
        return b.append_column(
            "host", pc.fill_null(pc.struct_field(m, "h"), ""))

    pages = pages.map_batches(add_host, batch_format="pyarrow")
    hot = dedup_mod.host_hot_lines(
        pages, "text", "host", "url", min_docs=_BOILER_MIN_URLS)
    return dedup_mod.remove_host_hot_lines(pages, "text", "host", hot)


def _kmeans_sql(k: int = 8, iters: int = 4,
                qbits: int = 20) -> str:
    """DuckDB oracle for the full quantized Lloyd loop: the fixed
    iteration count unrolls into chained CTEs, each one an exact
    replica of kmeans_lloyd's arithmetic — ``round_even(x * 2^20)``
    BIGINT quantization (numpy half-to-even), exact-integer centroid
    sums, centroid = (s/n)/2^20 in one double expression, d2 =
    (xx - 2*xc) + cc in the same composition order, argmin ties to
    the lowest cluster, empty clusters carrying the previous
    centroid. Seeds = the k smallest vec_ids in id order."""
    Q = float(1 << qbits)

    def assign(cent: str) -> str:
        return f"""(
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, cc.cluster,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             xv.xx - 2 * sum(e.x * cc.c) + max(cc2.cc), cc.cluster
           ) AS rn
    FROM e
    JOIN {cent} cc ON cc.dim = e.dim
    JOIN (SELECT cluster, sum(c * c) AS cc FROM {cent}
          GROUP BY cluster) cc2 ON cc2.cluster = cc.cluster
    JOIN xxv xv ON xv.vec_id = e.vec_id
    GROUP BY e.vec_id, cc.cluster, xv.xx
  ) WHERE rn = 1)"""

    parts = [f"""
WITH e AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
q AS (
  SELECT vec_id, dim,
         CAST(round_even(x * {Q!r}, 0) AS BIGINT) AS q
  FROM e),
xxv AS (SELECT vec_id, sum(x * x) AS xx FROM e GROUP BY vec_id),
seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM embeddings ORDER BY vec_id LIMIT {k}),
c0 AS (
  SELECT s.cluster, e.dim, e.x AS c
  FROM seeds s JOIN e ON e.vec_id = s.vec_id)"""]
    for t in range(iters):
        parts.append(f""",
a{t + 1} AS {assign('c%d' % t)},
c{t + 1} AS (
  SELECT p.cluster, p.dim,
         COALESCE((CAST(u.s AS DOUBLE) / CAST(u.n AS DOUBLE))
                  / {Q!r}, p.c) AS c
  FROM c{t} p LEFT JOIN (
    SELECT a.cluster, q.dim, sum(q.q) AS s, count(*) AS n
    FROM a{t + 1} a JOIN q ON q.vec_id = a.vec_id
    GROUP BY a.cluster, q.dim) u
  ON u.cluster = p.cluster AND u.dim = p.dim)""")
    parts.append(f"""
SELECT vec_id, cluster FROM {assign('c%d' % iters)} ORDER BY vec_id""")
    return "".join(parts)


@register("kmeans_clusters", sql=_kmeans_sql())
def kmeans_clusters(sf_dir: str):
    """Full-data Lloyd k-means assignments over the embeddings table
    (k=8, 4 iterations) — the iterative-ML workload class (EM-style
    fixpoint loops) beyond one-shot aggregates. Deterministic at any
    partitioning: integer-quantized partial sums make the centroid
    reduction fold-order-free (stages/ann.kmeans_lloyd); init is the
    k smallest ids, no RNG. Inertia monotonicity and bit-determinism
    are pytest properties (test_dedup_ann). DRIVER-ORACLED EXACTLY:
    _kmeans_sql unrolls the whole quantized Lloyd loop into DuckDB
    CTEs (bit-equal assignments at sf0.001 and sf0.01)."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    out, _hist = ann_mod.kmeans_lloyd(ds, "embedding", "vec_id",
                                      k=8, iters=4)
    return out


@register("semantic_dedup")  # k-means not SQL-expressible -> rows-only
def semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic pruning over the embeddings table:
    cluster (spherical k-means, bounded sample), then drop rows with a
    lower-id in-cluster neighbor above the cosine threshold.
    Deterministic under the fixed seed; recall vs the exact near-dup
    pair tier is measured in pytest (test_dedup_ann)."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    return ann_mod.semantic_dedup(ds, "embedding", "vec_id",
                                  threshold=COSINE_TAU)


@register("doc_tfidf", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), nn AS (SELECT count(*) AS n FROM docs),
    words AS (SELECT doc_id, unnest(w) AS term FROM docs),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM words GROUP BY doc_id, term),
    dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM words GROUP BY term),
    scored AS (
      SELECT doc_id, term, tf, df,
             round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS score
      FROM tf JOIN dfq USING (term) CROSS JOIN nn
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS rn
      FROM scored)
    SELECT doc_id, term, tf, df, score FROM ranked WHERE rn <= 3""")
def doc_tfidf(sf_dir: str):
    """Top-3 TF-IDF terms per document — the keyword/relevance scoring
    pass of a text pipeline.

    Scale plan: pass 1 builds the document-frequency table exchanging
    only (term, partial-df) pairs (distinct terms per doc collapse per
    batch before the shuffle) and carries the corpus doc count as a
    sentinel row; the DF table is vocabulary-sized — broadcast ONCE
    with a size guard (at web scale, trim to a min-df cutoff first).
    Pass 2 streams map-only: per-doc np.unique term counts, a
    searchsorted DF lookup, and a vectorized lexsort top-3.
    Tokenization matches vocab_topk / jaccard_pairs (str.split ==
    whitespace-class regex, proven on this corpus)."""
    from ...stages.dedup import _tokenize
    from ...stages.partition import partition_map

    SENTINEL = "\x00ndocs"
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        per_doc, ndocs = [], 0
        for t in _tokenize(b["text"]):
            if not t:
                continue
            ndocs += 1
            per_doc.append(np.unique(np.asarray(t, dtype=object)))
        if not per_doc:
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 "df": pd.Series(dtype=np.int64)})
        u, c = np.unique(np.concatenate(per_doc), return_counts=True)
        out = pd.DataFrame({"term": u, "df": c.astype(np.int64)})
        return pd.concat([out, pd.DataFrame(
            {"term": [SENTINEL], "df": np.asarray([ndocs], np.int64)})],
            ignore_index=True)

    def df_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False).agg(df=("df", "sum"))
        out["df"] = out["df"].astype(np.int64)
        return out

    dft = partition_map(ds.map_batches(df_partial,
                                       batch_format="pandas"),
                        ["term"], df_combine, 16) \
        .limit(20_000_001).to_pandas()
    if len(dft) > 20_000_000:
        raise ValueError("doc_tfidf: vocabulary too large to "
                         "broadcast; apply a min-df cutoff first")
    n_docs = int(dft.loc[dft["term"] == SENTINEL, "df"].iloc[0])
    dft = dft[dft["term"] != SENTINEL]
    order = np.argsort(dft["term"].to_numpy())
    ref = ray.put((dft["term"].to_numpy()[order],
                   dft["df"].to_numpy(np.int64)[order], n_docs))

    class Score:
        def __init__(self):
            self.terms, self.dfs, self.n = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids, terms, tfs, dfs, scores = [], [], [], [], []
            for doc_id, t in zip(b["doc_id"].to_numpy(np.int64),
                                 _tokenize(b["text"])):
                if not t:
                    continue
                u, c = np.unique(np.asarray(t, dtype=object),
                                 return_counts=True)
                df = self.dfs[np.searchsorted(self.terms, u)]
                sc = np.round(c * np.log(self.n / df), 6)
                top = np.lexsort((u, -sc))[:3]
                ids.extend([doc_id] * len(top))
                terms.extend(u[top])
                tfs.extend(c[top])
                dfs.extend(df[top])
                scores.extend(sc[top])
            return pd.DataFrame({
                "doc_id": np.asarray(ids, np.int64),
                "term": np.asarray(terms, dtype=object),
                "tf": np.asarray(tfs, np.int64),
                "df": np.asarray(dfs, np.int64),
                "score": np.asarray(scores, np.float64)})

    return ds.map_batches(Score, batch_format="pandas", concurrency=2)


#: DSIR hashed-feature space (Xie et al. 2023, "Data Selection for
#: Language Models via Importance Resampling"): word bigrams hashed
#: into a fixed bucket table so both n-gram LMs are B-dimensional.
_DSIR_BUCKETS = 8192


@register("dsir_weights", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    feat AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(g), 1, 16))::UBIGINT
                  % {B} AS BIGINT) AS b
      FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                   i -> w[i] || ' ' || w[i+1])) AS g
            FROM docs WHERE len(w) >= 2)),
    craw AS (SELECT b, CAST(count(*) AS BIGINT) AS cr
             FROM feat GROUP BY b),
    ctgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct
             FROM feat WHERE doc_id % 97 = 0 GROUP BY b),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS tr,
                   CAST(count(*) FILTER (WHERE doc_id % 97 = 0)
                        AS BIGINT) AS tt
            FROM feat),
    tf AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf
           FROM feat GROUP BY doc_id, b),
    contrib AS (
      SELECT doc_id, tf,
             CAST(floor(tf * ln(((coalesce(ct, 0) + 1.0)
                        * (tr + {B}.0))
                        / ((cr + 1.0) * (tt + {B}.0)))
                  * 1000000 + 0.5) AS BIGINT) AS m
      FROM tf JOIN craw USING (b) LEFT JOIN ctgt USING (b)
      CROSS JOIN tot),
    agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_feats,
                   CAST(sum(m) AS BIGINT) AS logw_micro
            FROM contrib GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(a.n_feats, 0) AS n_feats,
           coalesce(a.logw_micro, 0) AS logw_micro,
           {r6} AS avg_logw
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN agg a USING (doc_id)""".format(
        B=_DSIR_BUCKETS,
        r6="""CASE WHEN (CAST(coalesce(a.logw_micro, 0) AS DOUBLE)
              / greatest(coalesce(a.n_feats, 0), 1) / 1000000.0) >= 0
         THEN floor(CAST(coalesce(a.logw_micro, 0) AS DOUBLE)
              / greatest(coalesce(a.n_feats, 0), 1) / 1000000.0
              * 1000000 + 0.5) / 1000000
         ELSE -floor(-(CAST(coalesce(a.logw_micro, 0) AS DOUBLE)
              / greatest(coalesce(a.n_feats, 0), 1) / 1000000.0)
              * 1000000 + 0.5) / 1000000 END"""))
def dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): score every document
    by how much more likely its hashed word-bigram features are under
    the TARGET distribution (the deterministic ``doc_id % 97`` holdout,
    decontaminate's convention — a real run substitutes the benchmark/
    domain corpus) than under the raw-corpus distribution — the
    importance-resampling step that tilts a 100-TB crawl toward a
    target domain.

    Scale shape: both n-gram "LMs" live in a FIXED 8192-bucket hashed
    feature space, so phase A is per-batch bincount partials (<= B
    rows each) -> one bucket exchange -> a B-bounded combine, and the
    two count vectors broadcast once via ray.put (64 KiB — never a
    shuffle). Phase B is map-only scoring. Float policy: per
    (doc, bucket) contributions become INTEGER micro-nats via the
    identical floor(tf * ln(ratio) * 1e6 + 0.5) expression in numpy
    and SQL (lm_score's recipe), so per-doc sums are exact integers;
    the final avg is one deterministic half-away-r6 expression."""
    from ...functions.hashing import md5_upper64_flat
    from ...functions.texture import r6
    from ...stages.dedup import _tokenize
    from ...stages.partition import partition_map

    B = _DSIR_BUCKETS
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def feat_buckets(batch: pd.DataFrame):
        """Per-batch (flat bucket array, per-doc bigram counts)."""
        toks = _tokenize(batch["text"])
        grams: list[str] = []
        lens = np.empty(len(toks), np.int64)
        for i, ws in enumerate(toks):
            if len(ws) >= 2:
                lens[i] = len(ws) - 1
                grams.extend(ws[j] + " " + ws[j + 1]
                             for j in range(len(ws) - 1))
            else:
                lens[i] = 0
        b = (md5_upper64_flat(grams) % B).astype(np.int64) \
            if grams else np.empty(0, np.int64)
        return b, lens

    def cnt_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b, lens = feat_buckets(batch)
        ids = batch["doc_id"].to_numpy(np.int64)
        doc_of = np.repeat(np.arange(len(ids)), lens)
        raw = np.bincount(b, minlength=B).astype(np.int64)
        tgt = np.bincount(b[(ids % 97 == 0)[doc_of]],
                          minlength=B).astype(np.int64)
        nz = (raw > 0) | (tgt > 0)
        return pd.DataFrame({"b": np.flatnonzero(nz).astype(np.int64),
                             "cr": raw[nz], "ct": tgt[nz]})

    def cnt_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("b", as_index=False).agg(cr=("cr", "sum"),
                                                 ct=("ct", "sum"))
        return out.astype({"cr": np.int64, "ct": np.int64})

    cnts = partition_map(ds.map_batches(cnt_partial,
                                        batch_format="pandas"),
                         ["b"], cnt_combine, 8) \
        .limit(B + 1).to_pandas()
    if len(cnts) > B:                      # impossible by construction
        raise ValueError("dsir_weights: bucket table exceeded B")
    craw = np.zeros(B, np.int64)
    ctgt = np.zeros(B, np.int64)
    craw[cnts["b"].to_numpy()] = cnts["cr"].to_numpy()
    ctgt[cnts["b"].to_numpy()] = cnts["ct"].to_numpy()
    tr, tt = int(craw.sum()), int(ctgt.sum())
    lnr = np.log(((ctgt + 1.0) * (tr + float(B)))
                 / ((craw + 1.0) * (tt + float(B))))
    ref = ray.put(lnr)

    class Score:
        def __init__(self):
            self.lnr = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            b, lens = feat_buckets(batch)
            ids = batch["doc_id"].to_numpy(np.int64)
            logw = np.zeros(len(ids), np.int64)
            if len(b):
                doc_of = np.repeat(np.arange(len(ids)), lens)
                key = doc_of * B + b
                uk, tf = np.unique(key, return_counts=True)
                d, bb = uk // B, uk % B
                m = np.floor(tf * self.lnr[bb] * 1e6 + 0.5) \
                    .astype(np.int64)
                starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
                logw[d[starts]] = np.add.reduceat(m, starts)
            avg = r6(logw / np.maximum(lens, 1) / 1e6)
            return pd.DataFrame({"doc_id": ids, "n_feats": lens,
                                 "logw_micro": logw, "avg_logw": avg})

    return ds.map_batches(Score, batch_format="pandas", concurrency=2)


@register("decontaminate", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), g AS (
      SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
               THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
      FROM docs
    ), bg AS (
      SELECT DISTINCT unnest(s) AS gram FROM g WHERE doc_id % 97 = 0
    ), hits AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
      FROM (SELECT doc_id, unnest(s) AS gram FROM g) u
      WHERE gram IN (SELECT gram FROM bg) GROUP BY doc_id
    )
    SELECT g.doc_id, g.doc_id % 97 = 0 AS is_benchmark,
           coalesce(h.n_hits, 0) AS n_hits,
           coalesce(h.n_hits, 0) > 0 AS contaminated
    FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id""")
def decontaminate(sf_dir: str):
    """Benchmark decontamination: flag every document sharing any word
    trigram with the benchmark set (here the deterministic holdout
    ``doc_id % 97 == 0``), reporting the distinct-gram overlap count.
    The standard pre-training hygiene pass (WRAP/GPT-3 style 13-gram
    filtering, shrunk to 3-grams for the tiny-vocab test corpus).

    Scale plan: the benchmark side is SMALL by definition — its
    distinct gram set is built DISTRIBUTED (per-batch holdout-filtered
    distinct-gram partials; guarded driver combine), ray.put ONCE, and
    probed per batch with a sorted-array ``np.isin`` (no shuffle at
    all; the corpus side streams map-only). Document text never
    reaches the driver.  Tokenization and gram shape are
    byte-identical to the jaccard_pairs convention (str.split ==
    whitespace-regex split, proven on this corpus).  Whitespace-only
    docs have no grams and are excluded on both sides.
    """
    from ...stages.dedup import _tokenize

    def grams_of(toks: list[str]) -> np.ndarray:
        if not toks:
            return np.empty(0, dtype=object)
        if len(toks) < 3:
            return np.asarray([" ".join(toks)], dtype=object)
        return np.unique(np.asarray(
            [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)],
            dtype=object))

    # Benchmark gram set built DISTRIBUTED (the decontaminate_bloom
    # shape): each batch filters to the holdout and emits its DISTINCT
    # grams; only those partial gram rows — never document text —
    # reach the driver, under the same guarded-pull contract as
    # _combine_partials. At 100 TB the holdout side stays benchmark-
    # sized by definition; if it isn't, this raises instead of
    # broadcasting an unbounded set.
    def bench_grams(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] % 97 == 0]
        gs = [grams_of(t) for t in _tokenize(b["text"])]
        gs = [g for g in gs if len(g)]
        u = np.unique(np.concatenate(gs)) if gs \
            else np.empty(0, dtype=object)
        return pd.DataFrame({"gram": u})

    bds = rd.read_parquet(_path(sf_dir, "documents"),
                          columns=["doc_id", "text"])
    parts = bds.map_batches(bench_grams, batch_format="pandas") \
        .limit(_BENCH_GRAM_MAX + 1).to_pandas()
    if len(parts) > _BENCH_GRAM_MAX:
        raise ValueError(
            "decontaminate: > %d benchmark gram partials — benchmark "
            "side too large for an exact broadcast; use "
            "decontaminate_bloom (fixed-memory tier)" % _BENCH_GRAM_MAX)
    bset = np.unique(parts["gram"].to_numpy(dtype=object))
    if bset.nbytes > (256 << 20):
        raise ValueError("decontaminate: benchmark gram set too large "
                         "to broadcast; shard the benchmark side")
    bref = ray.put(bset)

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    class Mark:
        def __init__(self):
            self.grams = ray.get(bref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            # ONE flattened membership probe per batch (a per-doc
            # np.isin would re-sort the gram set per doc at Python
            # string-compare speed — measured 25 s vs <1 s at sf0.1)
            gs = [grams_of(t) for t in _tokenize(b["text"])]
            keep = np.asarray([len(g) > 0 for g in gs])
            hits = np.zeros(len(gs), np.int64)
            if keep.any():
                flat = np.concatenate([g for g in gs if len(g)])
                memb = _sorted_member(self.grams, flat)
                lens = np.asarray([len(g) for g in gs if len(g)])
                cs = np.concatenate(([0], np.cumsum(memb)))
                off = np.concatenate(([0], np.cumsum(lens)))
                hits[keep] = cs[off[1:]] - cs[off[:-1]]
            out = pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_hits": hits})[keep]
            out["is_benchmark"] = (out["doc_id"] % 97 == 0)
            out["contaminated"] = out["n_hits"] > 0
            return out[["doc_id", "is_benchmark", "n_hits",
                        "contaminated"]]

    return ds.map_batches(Mark, batch_format="pandas", concurrency=2)


@register("q3_shipping", sql="""
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_cp,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_cp DESC, l_orderkey LIMIT 10""")
def q3_shipping(sf_dir: str):
    """TPC-H-Q3-shaped large×large shuffle join (shipping-priority
    top-10) — the one join class the engine didn't cover: both sides
    too big to broadcast, equi-key, handled by Ray Data's native hash
    ``Dataset.join`` (one co-partitioning exchange per side).

    Scale plan: every input is pruned and pre-shrunk BEFORE the
    exchange — lineitem is filtered at the parquet read and partially
    aggregated per batch to (l_orderkey, revenue) rows, orders is
    filtered at the read and semi-filtered by a broadcast sorted
    custkey array (the small side never shuffles) — so the join moves
    aggregate-grain rows, not raw lineitems.  Revenue folds as integer
    cents×percent (exact, order-free; the repo float policy).  The
    join output is hash-partitioned by key, so the final group-sum is
    partition-local (batch_size=None -> one batch per block) and top-k
    is per-block partial + a 10-row driver merge.
    """
    cut = datetime(1998, 6, 1)

    seg_keys = np.sort(pq.read_table(
        _path(sf_dir, "customer"),
        columns=["c_custkey"],
        filters=[("c_mktsegment", "=", "BUILDING")])
        .column("c_custkey").to_numpy())
    if seg_keys.nbytes > (256 << 20):
        raise ValueError("q3_shipping: BUILDING custkey semi-filter "
                         "array too large to broadcast; co-partition "
                         "customer and orders on custkey instead")
    seg_ref = ray.put(seg_keys)

    line = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=pc.field("l_shipdate") > pa.scalar(cut, pa.timestamp("us")))

    def line_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        pctl = 100 - np.round(
            b["l_discount"].to_numpy() * 100).astype(np.int64)
        d = pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(),
                          "cp": cents * pctl})
        return d.groupby("l_orderkey", as_index=False).agg(
            cp=("cp", "sum"))

    lrev = line.map_batches(line_partial, batch_format="pandas")

    orders = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
        filter=pc.field("o_orderdate") < pa.scalar(cut, pa.timestamp("us")))

    class SegFilter:
        def __init__(self):
            self.keys = ray.get(seg_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ck = b["o_custkey"].to_numpy(zero_copy_only=False)
            i = np.searchsorted(self.keys, ck)
            i = np.clip(i, 0, len(self.keys) - 1)
            return b.filter(pa.array(self.keys[i] == ck)) \
                    .drop_columns(["o_custkey"])

    orders_f = orders.map_batches(SegFilter, batch_format="pyarrow",
                                  concurrency=2)

    # Partition count tracks the session's CPUs (on a real cluster:
    # total cores); the default aggregator remote-args reserve
    # CPU+memory per partition, which pends forever on small local
    # sessions — cap them explicitly (at scale pass
    # partition_size_hint so memory reservations are honest instead).
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = lrev.join(
        orders_f, "inner", num_partitions=max(2, min(16, ncpu)),
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25})

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"],
                      as_index=False).agg(revenue_cp=("cp", "sum"))
        g = g.sort_values(["revenue_cp", "l_orderkey"],
                          ascending=[False, True], kind="mergesort")
        return g.head(10)

    parts = joined.map_batches(finish, batch_format="pandas",
                               batch_size=None).to_pandas()
    top = parts.sort_values(["revenue_cp", "l_orderkey"],
                            ascending=[False, True],
                            kind="mergesort").head(10)
    top["revenue_cp"] = top["revenue_cp"].astype(np.int64)
    top["l_orderkey"] = top["l_orderkey"].astype(np.int64)
    return top[["l_orderkey", "revenue_cp", "o_orderdate",
                "o_orderpriority"]].reset_index(drop=True)


#: source_mix weights in tenths (25 = 2.5 epochs, 4 = 0.4x downsample,
#: unlisted sources keep weight 10 = exactly once).
MIX_WEIGHTS = {"src0": 25, "src2": 4}
_MIX_K = ("CASE source WHEN 'src0' THEN 25 WHEN 'src2' THEN 4 "
          "ELSE 10 END")


@register("source_mix", sql="""
    SELECT doc_id, source, CAST(r.rep AS BIGINT) AS rep
    FROM documents
    CROSS JOIN (SELECT unnest(range(0, 5)) AS rep) r
    WHERE r.rep < ({k} // 10)
        + CASE WHEN doc_id % 10 < ({k} % 10) THEN 1 ELSE 0 END""".format(
        k=_MIX_K))
def source_mix(sf_dir: str):
    """Weighted dataset mixing with fractional epochs — the
    pre-training mix step that UP-samples prized sources (weight 2.5
    -> each doc appears 2 or 3 times, the extra copy chosen by the
    same deterministic key-modulus as doc_sample) and thins bulk
    sources (weight 0.4), emitting a repeat index per copy so a
    downstream shuffle can spread epochs.

    Scale shape: pure per-row arithmetic in one ``map_batches`` — no
    shuffle, no state, retry-idempotent (the modulus predicate makes
    the fractional copy a function of doc_id alone). Row expansion is
    vectorized ``np.repeat``; weights ship in the closure (a table of
    source->weight at real scale would broadcast via ``ray.put``)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "source"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["source"].map(MIX_WEIGHTS).fillna(10) \
            .to_numpy(np.int64)
        ids = batch["doc_id"].to_numpy(np.int64)
        reps = k // 10 + (ids % 10 < k % 10)
        idx = np.repeat(np.arange(len(batch)), reps)
        cum = np.cumsum(reps)
        rep = np.arange(int(reps.sum())) - np.repeat(cum - reps, reps)
        out = batch.iloc[idx].reset_index(drop=True)
        out["rep"] = rep.astype(np.int64)
        return out

    return ds.map_batches(fn, batch_format="pandas")


SEQ_BUDGET = 1024                   # tokens per packed training sequence
_SEQ_BUCKET = 128                   # doc_ids per prefix-sum bucket


@register("seq_pack", sql="""
    WITH t AS (SELECT doc_id, CAST({tok} AS BIGINT) AS n_tok
               FROM documents),
    c AS (SELECT doc_id, n_tok,
                 sum(n_tok) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
          FROM t)
    SELECT doc_id, n_tok,
           CAST((cum - n_tok) // {B} AS BIGINT) AS seq_id,
           CAST((cum - n_tok) % {B} AS BIGINT) AS seq_off
    FROM c""".format(tok=text_stats_sql("text")["n_tokens"],
                     B=SEQ_BUDGET))
def seq_pack(sf_dir: str):
    """GPT-style sequence packing (concatenate-and-chunk): documents
    are laid end-to-end in doc_id order and cut into fixed
    ``SEQ_BUDGET``-token training sequences; each doc gets the sequence
    id and token offset where it starts (docs may straddle a boundary
    — that IS the classic packing semantics). All integer arithmetic,
    so the oracle match is bit-exact.

    Scale shape: the global token prefix-sum is two-phase like
    ``quality_rank`` — phase A pre-aggregates per-bucket token totals
    (bucket = doc_id range, one tiny exchange through the guarded
    driver combine), the driver turns the bucket histogram into
    cumulative offsets broadcast ONCE via ``ray.put``; phase B is the
    standard hash exchange on bucket + partition-local sort/cumsum.
    Text never crosses the exchange — docs are reduced to (doc_id,
    bucket, n_tok) before the shuffle."""
    from ...stages.partition import partition_map

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        nt = text_stats_frame(batch["text"])["n_tokens"] \
            .to_numpy(np.int64)
        return pd.DataFrame({"doc_id": ids,
                             "bucket": ids // _SEQ_BUCKET,
                             "n_tok": nt})

    tok_ds = ds.map_batches(toks, batch_format="pandas")

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("bucket", as_index=False).agg(s=("n_tok", "sum"))
        g["s"] = g["s"].astype(np.int64)
        return g

    hist = _combine_partials(
        tok_ds.map_batches(hist_partial, batch_format="pandas"),
        ["bucket"], ["s"]).sort_values("bucket", kind="mergesort")
    offs = np.concatenate(([0], np.cumsum(
        hist["s"].to_numpy(np.int64))[:-1]))
    ref = ray.put((hist["bucket"].to_numpy(np.int64), offs))

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        bk, off = ray.get(ref)
        g = g.sort_values("doc_id", kind="mergesort")
        nt = g["n_tok"].to_numpy(np.int64)
        base = off[np.searchsorted(bk, g["bucket"].to_numpy(np.int64))]
        intra = np.concatenate([
            np.cumsum(grp) - grp for grp in
            np.split(nt, np.unique(g["bucket"].to_numpy(np.int64),
                                   return_index=True)[1][1:])])
        start = base + intra
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_tok": nt,
            "seq_id": (start // SEQ_BUDGET).astype(np.int64),
            "seq_off": (start % SEQ_BUDGET).astype(np.int64)})

    return partition_map(tok_ds, ["bucket"], pack, 8)


@register("train_val_split", sql="""
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                ::UBIGINT AS BIGINT) AS bucket,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                     1, 2))::UBIGINT < 204
                  THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                     1, 2))::UBIGINT < 230
                  THEN 'val'
                ELSE 'test' END AS split
    FROM documents""")
def train_val_split(sf_dir: str):
    """Deterministic hash-based train/val/test assignment (~80/10/10):
    the split every training run needs, reproducible across reruns,
    engines and cluster sizes because the bucket is a pure function of
    the id — bucket = first byte of md5(str(doc_id)), thresholds
    204/230 of 256.

    Scale plan: PURE MAP, zero shuffle — one vectorized DuckDB md5
    kernel per batch (functions/hashing.md5_id64_flat), bucket is the
    top byte of the hi word (== the first two hex digits)."""
    from ...functions.hashing import md5_id64_flat
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        hi, _ = md5_id64_flat(ids, "")
        bucket = (hi >> np.uint64(56)).astype(np.int64)
        split = np.where(bucket < 204, "train",
                         np.where(bucket < 230, "val", "test"))
        return pd.DataFrame({"doc_id": ids, "bucket": bucket,
                             "split": split.astype(object)})

    return ds.map_batches(fn, batch_format="pandas")


@register("source_overlap", sql="""
    WITH docs AS (
      SELECT doc_id, source,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ),
    words AS (SELECT doc_id, source, unnest(w) AS tok,
                     generate_subscripts(w, 1) AS pos
              FROM docs),
    g AS (SELECT DISTINCT a.source,
                 a.tok || ' ' || b.tok || ' ' || c.tok AS gram
          FROM words a
          JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          JOIN words c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2)
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
    GROUP BY src_a, src_b""")
def source_overlap(sf_dir: str):
    """Cross-source contamination matrix: for every source pair, the
    number of DISTINCT token 3-grams both emit — the leakage census a
    mixing stage consults before treating sources as independent
    (exact-duplicate overlap is zero on this corpus by construction;
    shared phrasing is not).

    Scale plan: per-batch distinct (gram-hash128, source) rows — raw
    grams never cross the wire — then ONE gram-keyed exchange; each
    partition self-merges its gram groups into ordered source pairs
    (bounded by n_sources per gram) and pre-aggregates, so the driver
    combine is at most sources² x partitions rows (guarded)."""
    from ...functions.hashing import hash64
    from ...stages.dedup import _H2_KEY
    from ...stages.partition import partition_map
    from ...stages.dedup import _tokenize

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])

    def gram_partial(b: pd.DataFrame) -> pd.DataFrame:
        grams, srcs = [], []
        src_arr = b["source"].to_numpy(object)
        for i, t in enumerate(_tokenize(b["text"])):
            if len(t) < 3:
                continue
            s = src_arr[i]
            for j in range(len(t) - 2):
                grams.append(t[j] + " " + t[j + 1] + " " + t[j + 2])
                srcs.append(s)
        if not grams:
            return pd.DataFrame({"h": pd.Series(dtype=np.int64),
                                 "h2": pd.Series(dtype=np.int64),
                                 "source": pd.Series(dtype=object)})
        vals = np.asarray(grams, object)
        h = hash64(vals).astype(np.int64)
        h2 = pd.util.hash_array(vals, hash_key=_H2_KEY,
                                categorize=False).astype(np.int64)
        return pd.DataFrame({"h": h, "h2": h2,
                             "source": np.asarray(srcs, object)}) \
            .drop_duplicates()

    def pair_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        m = g.merge(g, on=["h", "h2"])
        m = m[m["source_x"] < m["source_y"]]
        out = m.groupby(["source_x", "source_y"], as_index=False) \
            .size().rename(columns={
                "source_x": "src_a", "source_y": "src_b",
                "size": "n_shared"})
        out["n_shared"] = out["n_shared"].astype(np.int64)
        return out

    parts = partition_map(
        ds.map_batches(gram_partial, batch_format="pandas"),
        ["h"], pair_part, 16) \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("source_overlap: pair matrix too large for "
                         "the driver combine")
    out = parts.groupby(["src_a", "src_b"], as_index=False).agg(
        n_shared=("n_shared", "sum"))
    out["n_shared"] = out["n_shared"].astype(np.int64)
    return out


@register("quality_band", sql="""
    WITH q AS (SELECT quantile_cont(n_chars, 0.10) AS lo,
                      quantile_cont(n_chars, 0.90) AS hi
               FROM documents)
    SELECT doc_id, lang, n_chars FROM documents, q
    WHERE n_chars >= q.lo AND n_chars <= q.hi""")
def quality_band(sf_dir: str):
    """Percentile-band filtering — cut the global length outliers
    (keep docs inside [P10, P90]) the way a corpus-cleaning pass trims
    truncated fragments and mega-pages. The thresholds are EXACT
    global quantiles computed from a value histogram (per-batch value
    counts -> guarded driver combine -> quantile_cont interpolation
    mirroring DuckDB's ``lower + (upper-lower)*(h-floor(h))``), then
    broadcast into a vectorized Arrow filter — no shuffle anywhere,
    two streaming passes. The histogram is bounded by the number of
    DISTINCT values (here: lengths), not rows; for unbounded-
    cardinality columns the sketch tier (lang_quantiles_approx) is
    the scale path."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def vc_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("n_chars", as_index=False).agg(
            n=("n_chars", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        ds.map_batches(vc_partial, batch_format="pandas"),
        ["n_chars"], ["n"]).sort_values("n_chars", kind="mergesort")
    vals = hist["n_chars"].to_numpy(np.float64)
    cum = np.cumsum(hist["n"].to_numpy(np.int64))
    n = int(cum[-1])

    def q_cont(q: float) -> float:
        # DuckDB quantile_cont: h = (n-1)*q over the sorted values;
        # kth order statistic read off the cumulative histogram.
        h = (n - 1) * q
        i = int(np.floor(h))
        lo = vals[np.searchsorted(cum, i + 1)]
        hi = vals[np.searchsorted(cum, min(i + 2, n))]
        return float(lo + (hi - lo) * (h - np.floor(h)))

    lo, hi = q_cont(0.10), q_cont(0.90)

    def keep(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((nc >= lo) & (nc <= hi)))

    return ds.map_batches(keep, batch_format="pyarrow")


@register("quality_band_by_lang", sql="""
    WITH q AS (SELECT lang, quantile_cont(n_chars, 0.10) AS lo,
                      quantile_cont(n_chars, 0.90) AS hi
               FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN q USING (lang)
    WHERE d.n_chars >= q.lo AND d.n_chars <= q.hi""")
def quality_band_by_lang(sf_dir: str):
    """PER-LANGUAGE percentile-band filter — the CCNet-style variant
    of quality_band: each language gets its own exact [P10, P90]
    thresholds (a global band over-trims the language whose length
    distribution sits in the tails of the mix). Same plan as
    quality_band with the value histogram keyed by (lang, value):
    per-batch partials -> guarded driver combine -> per-lang
    quantile_cont (identical interpolation to DuckDB's) -> thresholds
    broadcast as three parallel arrays -> one vectorized searchsorted
    lookup + compare per batch. No shuffle; histogram bounded by
    langs x distinct values, not rows."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def vc_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "n_chars"], as_index=False).agg(
            n=("n_chars", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        ds.map_batches(vc_partial, batch_format="pandas"),
        ["lang", "n_chars"], ["n"]) \
        .sort_values(["lang", "n_chars"], kind="mergesort")

    def q_cont(vals, cum, q: float) -> float:
        # DuckDB quantile_cont (same derivation as quality_band)
        n = int(cum[-1])
        h = (n - 1) * q
        i = int(np.floor(h))
        lo = vals[np.searchsorted(cum, i + 1)]
        hi = vals[np.searchsorted(cum, min(i + 2, n))]
        return float(lo + (hi - lo) * (h - np.floor(h)))

    lang_arr, lo_arr, hi_arr = [], [], []
    for lang, g in hist.groupby("lang", sort=True):
        vals = g["n_chars"].to_numpy(np.float64)
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        lang_arr.append(lang)
        lo_arr.append(q_cont(vals, cum, 0.10))
        hi_arr.append(q_cont(vals, cum, 0.90))
    lang_arr = np.asarray(lang_arr, object)
    lo_arr = np.asarray(lo_arr, np.float64)
    hi_arr = np.asarray(hi_arr, np.float64)

    def keep(batch: pa.Table) -> pa.Table:
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(
            lang_arr, batch["lang"].to_numpy(zero_copy_only=False))
        return batch.filter(
            pa.array((nc >= lo_arr[idx]) & (nc <= hi_arr[idx])))

    return ds.map_batches(keep, batch_format="pyarrow")


#: Gopher-style rule thresholds (Rae et al. 2021 §A1.1 shape, bounds
#: recalibrated to this corpus's word-salad distribution so the filter
#: is non-degenerate: word count sits in [10, 99], mean word length in
#: [3.7, 5.3] at sf0.01).
_GOPHER = dict(min_words=20, max_words=90, min_mwl=4.0, max_mwl=5.0,
               min_stop=2, min_alpha_frac=0.8, max_sym_ratio=0.1)


def _gopher_sql() -> str:
    from ...functions.quality import STOPWORDS
    st = text_stats_sql("text")
    toks, mwl = st["n_tokens"], st["mean_token_len"]
    words = ("string_split_regex(trim(text, E' \\t\\n\\r\\f'),"
             " '[ \\t\\n\\r\\f]+')")
    stoplist = ", ".join("'%s'" % w for w in STOPWORDS)
    n_stop = ("CASE WHEN ({k}) = 0 THEN 0 ELSE len(list_filter({w},"
              " x -> list_contains([{sl}], x))) END"
              ).format(k=toks, w=words, sl=stoplist)
    alpha_frac = ("CASE WHEN ({k}) > 0 THEN len(list_filter({w},"
                  " x -> regexp_matches(x, '[A-Za-z]'))) * 1.0 / ({k})"
                  " ELSE NULL END").format(k=toks, w=words)
    sym = ("((length(text) - length(replace(text, '#', '')))"
           " + (length(text) - length(replace(text, '...', ''))) / 3)")
    sym_ratio = ("CASE WHEN ({k}) > 0 THEN {s} * 1.0 / ({k})"
                 " ELSE NULL END").format(k=toks, s=sym)
    g = _GOPHER
    return """
    WITH m AS (SELECT doc_id, {toks} AS n_words, {mwl} AS mwl,
                      {n_stop} AS n_stop, {alpha} AS alpha_frac,
                      {symr} AS sym_ratio
               FROM documents)
    SELECT doc_id, n_words, round(mwl, 6) AS mean_word_len,
           n_stop, round(alpha_frac, 6) AS alpha_frac,
           round(sym_ratio, 6) AS sym_ratio
    FROM m
    WHERE n_words >= {minw} AND n_words <= {maxw}
      AND mwl >= {minl} AND mwl <= {maxl} AND n_stop >= {mins}
      AND alpha_frac >= {mina} AND sym_ratio <= {maxs}""".format(
        toks=toks, mwl=mwl, n_stop=n_stop, alpha=alpha_frac,
        symr=sym_ratio, minw=g["min_words"], maxw=g["max_words"],
        minl=g["min_mwl"], maxl=g["max_mwl"], mins=g["min_stop"],
        mina=g["min_alpha_frac"], maxs=g["max_sym_ratio"])


#: quality_classifier hashed-linear-model constants: feature space of
#: 1024 md5 buckets; the per-bucket weight is a deterministic INTEGER
#: micro-logit derived from the bucket id (Knuth multiplicative mix),
#: standing in for trained fasttext-style weights shipped with a job.
_QC_BUCKETS = 1024
_QC_MIX = 2654435761
_QC_BIAS = 12345
_QC_MOD = 2000001
