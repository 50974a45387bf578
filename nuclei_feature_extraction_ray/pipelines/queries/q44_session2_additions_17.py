# round-5 session-2 additions, batch 17: per-host longest common
# path prefix (URL trie census), largest-remainder sample
# apportionment, and empirical-Bayes CTR shrinkage.
from __future__ import annotations

import os

from ._shared import (ORACLE, _combine_partials, _path, np, pa,
                      partition_map, pc, pd, ray, rd, register)

_SAMPLE_BUDGET = 10_000   # rows to apportion across sources
_CTR_ALPHA = 20.0         # shrinkage pseudo-count


def url_path_prefix_sql(scale: str) -> str:
    """DuckDB oracle for ``url_path_prefix``: per-host min/max path
    (binary collation == codepoint order on these ASCII paths), LCP
    of the two extremes via the largest i with equal prefixes —
    sound because the LCP of a set equals the LCP of its sorted
    min and max."""
    from .q05_pages_flagship import _pages_glob
    return """
    WITH u AS (SELECT regexp_extract(url, '^https?://([^/]+)', 1)
                        AS host,
                      coalesce(regexp_extract(
                        url, '^https?://[^/]+(/.*)$', 1), '')
                        AS path
               FROM read_parquet('{glob}')),
    mm AS (SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
                  min(path) AS a, max(path) AS b
           FROM u GROUP BY host),
    l AS (SELECT host, n_pages, a,
                 coalesce((SELECT max(g.i)
                           FROM generate_series(1, 400) g(i)
                           WHERE g.i <= least(len(a), len(b))
                             AND substr(a, 1, g.i)
                                 = substr(b, 1, g.i)), 0) AS lcp_len
          FROM mm)
    SELECT host, n_pages, CAST(lcp_len AS BIGINT) AS lcp_len,
           substr(a, 1, lcp_len) AS lcp
    FROM l ORDER BY host""".format(glob=_pages_glob(scale))


@register("url_path_prefix")
def url_path_prefix(sf_dir: str):
    """Per-host longest common PATH prefix over the crawl's URLs —
    the trie-depth census that tells a crawler which directory
    subtree a host's content actually lives under (deep shared
    prefixes flag mirrored apps / language subtrees; lcp_len 1 means
    content spans the root). Uses the order-statistics identity
    LCP(set) == LCP(min, max), so each batch contributes only
    (host, min_path, max_path, count) partials — hosts × blocks tiny
    rows, NO url ever crosses the wire — and the driver folds
    min-of-mins / max-of-maxs, then computes one Python
    commonprefix per host. Map-only at 100 TB with a
    dimension-sized driver fold."""
    from ...corpus import corpus_dir
    from .q05_pages_flagship import _corpus_scale
    d = corpus_dir(_corpus_scale(sf_dir))
    ds = rd.read_parquet(os.path.join(d, "pages"), columns=["url"])

    def partial(b: pa.Table) -> pd.DataFrame:
        url = b["url"].combine_chunks()
        ext = pc.extract_regex(url, "^https?://(?P<h>[^/]+)(?P<p>/.*)?$")
        host = pc.struct_field(ext, "h").to_pandas()
        path = pc.struct_field(ext, "p").to_pandas().fillna("")
        g = pd.DataFrame({"host": host, "path": path}) \
            .groupby("host")["path"].agg(["min", "max", "size"])
        return pd.DataFrame({
            "host": g.index.to_numpy(object),
            "mn": g["min"].to_numpy(object),
            "mx": g["max"].to_numpy(object),
            "n": g["size"].to_numpy(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .limit(1_000_001).to_pandas()
    if len(parts) > 1_000_000:
        raise ValueError("url_path_prefix: host partials exceeded "
                         "the driver bound")
    g = parts.groupby("host").agg(
        mn=("mn", "min"), mx=("mx", "max"), n=("n", "sum"))
    lcp = [os.path.commonprefix([a, b])
           for a, b in zip(g["mn"], g["mx"])]
    return pd.DataFrame({
        "host": g.index.to_numpy(object),
        "n_pages": g["n"].to_numpy(np.int64),
        "lcp_len": np.asarray([len(x) for x in lcp], np.int64),
        "lcp": np.asarray(lcp, object)}) \
        .sort_values("host", kind="mergesort").reset_index(drop=True)


@register("sample_apportionment", sql="""
    WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
    q AS (SELECT source, n, ({b} * n) // tot AS base,
                 ({b} * n) % tot AS rem
          FROM c, t),
    r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source)
                      AS rk FROM q),
    d AS (SELECT CAST({b} - sum(base) AS BIGINT) AS extra FROM q)
    SELECT source, n AS n_docs,
           CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END
                AS BIGINT) AS n_samples
    FROM r, d ORDER BY source""".format(b=_SAMPLE_BUDGET))
def sample_apportionment(sf_dir: str):
    """Largest-remainder (Hamilton) apportionment of a fixed sample
    budget across sources proportional to row counts — the exact
    integer quota split a sampler needs so per-source sample sizes
    sum EXACTLY to the budget (naive rounding over- or under-shoots).
    Every step is integer: floor quotas via {b}·n // total, the
    leftover seats go to the largest remainders (ties by source
    name), so both engines agree bit-for-bit. Count partials collapse
    per batch; the apportionment runs on the handful of source
    rows driver-side — map-only at any scale. Budget
    _SAMPLE_BUDGET = 10000."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("source", as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["n"])
    c = c.sort_values("source", kind="mergesort") \
        .reset_index(drop=True)
    n = c["n"].to_numpy(np.int64)
    tot = int(n.sum())
    base = (_SAMPLE_BUDGET * n) // tot
    rem = (_SAMPLE_BUDGET * n) % tot
    extra = _SAMPLE_BUDGET - int(base.sum())
    order = np.lexsort((c["source"].to_numpy(object), -rem))
    bonus = np.zeros(len(c), np.int64)
    bonus[order[:extra]] = 1
    return pd.DataFrame({
        "source": c["source"].to_numpy(object),
        "n_docs": n,
        "n_samples": base + bonus})


@register("ctr_shrinkage", sql="""
    WITH u AS (SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'click'
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_purchase
               FROM events GROUP BY user_id),
    g AS (SELECT CAST(sum(n_purchase) AS DOUBLE)
                   / CAST(sum(n_click) AS DOUBLE) AS rate
          FROM u WHERE n_click > 0)
    SELECT user_id, n_click, n_purchase,
           CAST(n_purchase AS DOUBLE) / CAST(n_click AS DOUBLE)
             AS raw_rate,
           (CAST(n_purchase AS DOUBLE) + {a} * g.rate)
             / (CAST(n_click AS DOUBLE) + {a}) AS shrunk_rate
    FROM u, g WHERE n_click > 0 ORDER BY user_id""".format(
    a=_CTR_ALPHA))
def ctr_shrinkage(sf_dir: str):
    """Empirical-Bayes shrinkage of per-user conversion rates: raw
    purchase/click ratios pulled toward the global rate with
    α = _CTR_ALPHA = 20 pseudo-clicks — the cold-start smoothing every CTR / quality
    prior uses so low-traffic entities don't dominate rankings with
    0% or 100% rates. Integer count partials collapse per batch and
    fold driver-side; the global rate and each user's shrunk rate
    are the identical double expressions in both engines (one
    division each, no float accumulation). Map-only + one tiny
    driver fold at any scale."""
    from ._shared import _events
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].isin(("click", "purchase"))
        b = b[m]
        g = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "n_click": (b["event_type"] == "click")
            .to_numpy(np.int64),
            "n_purchase": (b["event_type"] == "purchase")
            .to_numpy(np.int64)}) \
            .groupby("user_id", as_index=False).sum()
        for c in ("n_click", "n_purchase"):
            g[c] = g[c].astype(np.int64)
        return g

    u = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], ["n_click", "n_purchase"])
    u = u[u["n_click"] > 0].sort_values("user_id") \
        .reset_index(drop=True)
    nc = u["n_click"].to_numpy(np.int64)
    npu = u["n_purchase"].to_numpy(np.int64)
    g_rate = np.float64(npu.sum()) / np.float64(nc.sum())
    return pd.DataFrame({
        "user_id": u["user_id"].to_numpy(np.int64),
        "n_click": nc, "n_purchase": npu,
        "raw_rate": npu.astype(np.float64) / nc.astype(np.float64),
        "shrunk_rate": (npu.astype(np.float64) + _CTR_ALPHA * g_rate)
        / (nc.astype(np.float64) + _CTR_ALPHA)})
