# round-5 session-2 additions, batch 18: KWIC concordance snippets,
# systematic sampling via a distributed dense global rank
# (zipWithIndex), and a one-step-ahead forecast backtest (naive vs
# weekly-seasonal, MAPE).
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (ORACLE, _combine_partials, _events, _path, np,
                      pa, partition_map, pc, pd, ray, rd, register)

_KWIC_TERM = "table"     # concordance keyword
_KWIC_W = 3              # context words each side
_SYS_K = 100             # systematic sampling stride
_SYS_BUCKET = 1 << 16    # key range per rank bucket


@register("kwic_snippets", sql="""
    SELECT doc_id,
           regexp_extract(text,
             '(?:^|\\s)((?:\\S+ ){{0,{w}}}?{t}(?: \\S+){{0,{w}}})(?:\\s|$)',
             1) AS snippet
    FROM documents
    WHERE regexp_matches(text, '(?:^|\\s){t}(?:\\s|$)')
    ORDER BY doc_id""".format(t=_KWIC_TERM, w=_KWIC_W))
def kwic_snippets(sf_dir: str):
    """KWIC (keyword-in-context) concordance: for every document
    containing the token 'table', the first occurrence with up to 3
    words of context each side — the snippet/highlight operator of
    corpus exploration UIs and search results. The engines reach the
    same string by different machinery (the real point of the
    oracle): DuckDB by a leftmost RE2 match anchored on token
    boundaries, the engine by Arrow tokenization + one vectorized
    equality mask over the flat token stream (first hit per doc from
    the run starts of the hit positions' doc codes) + a per-hit
    window slice — the only Python is joining each MATCHING doc's
    ≤ 7 snippet tokens. The oracle's lazy prefix ({0,3}?) pins the
    regex to the FIRST occurrence, matching the engine when a second
    occurrence falls inside the context window."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        n_docs = len(k)
        if len(vals) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "snippet": pd.Series(dtype=object)})
        hit = pc.equal(vals, _KWIC_TERM) \
            .to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(n_docs, dtype=np.int64), k)
        off = np.concatenate(([0], np.cumsum(k)))
        # first hit index per doc: min over hit positions
        pos = np.flatnonzero(hit)
        if len(pos) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "snippet": pd.Series(dtype=object)})
        dpos = doc[pos]
        first = np.full(n_docs, -1, np.int64)
        # pos ascending => keep the first per doc
        seen_first = np.concatenate(([True],
                                     dpos[1:] != dpos[:-1]))
        first[dpos[seen_first]] = pos[seen_first]
        have = np.flatnonzero(first >= 0)
        toks = vals.to_numpy(zero_copy_only=False)
        out = []
        for d in have:
            i = first[d]
            lo = max(off[d], i - _KWIC_W)
            hi = min(off[d + 1], i + _KWIC_W + 1)
            out.append(" ".join(toks[lo:hi]))
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64)[have],
            "snippet": np.asarray(out, object)})

    return ds.map_batches(fn, batch_format="pandas").sort("doc_id")


@register("systematic_sample", sql="""
    SELECT o_orderkey, o_custkey,
           CAST(rn AS BIGINT) AS global_rank
    FROM (SELECT o_orderkey, o_custkey,
                 row_number() OVER (ORDER BY o_orderkey) AS rn
          FROM orders)
    WHERE rn % {k} = 1 ORDER BY o_orderkey""".format(k=_SYS_K))
def systematic_sample(sf_dir: str):
    """Systematic sampling (every {k}-th row in key order) built on a
    DISTRIBUTED dense global rank — the zipWithIndex primitive: a
    total row numbering computed without any global sort-and-scan.
    Pass 1 histograms keys into fixed-width ranges inside
    map_batches (range-count partials, dimension-sized); the driver
    prefix-sums them into per-bucket offsets. Pass 2 is ONE hash
    exchange on the bucket id: each partition sorts only its own
    buckets' keys, adds the broadcast offset, and emits the rows
    whose global rank hits the stride. No all-to-all sort, no
    driver-side data — the classic two-pass ranking every
    distributed engine hides inside row_number()."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        bk = b["o_orderkey"].to_numpy(np.int64) // _SYS_BUCKET
        g = pd.DataFrame({"bucket": bk}) \
            .groupby("bucket", as_index=False).size()
        return pd.DataFrame({
            "bucket": g["bucket"].to_numpy(np.int64),
            "n": g["size"].to_numpy(np.int64)})

    h = _combine_partials(
        ds.map_batches(hist, batch_format="pandas"),
        ["bucket"], ["n"]).sort_values("bucket")
    offsets = dict(zip(
        h["bucket"].to_numpy(np.int64),
        np.concatenate(([0], np.cumsum(h["n"].to_numpy(np.int64))))
        [:-1]))
    off_ref = ray.put(offsets)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["bucket"] = out["o_orderkey"].to_numpy(np.int64) \
            // _SYS_BUCKET
        return out

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        outs = []
        for bk, sub in g.groupby("bucket", sort=True):
            keys = np.sort(sub["o_orderkey"].to_numpy(np.int64))
            rank = np.arange(1, len(keys) + 1, dtype=np.int64) \
                + off[int(bk)]
            m = (rank % _SYS_K) == 1
            sub = sub.sort_values("o_orderkey", kind="mergesort")
            outs.append(pd.DataFrame({
                "o_orderkey": keys[m],
                "o_custkey": sub["o_custkey"].to_numpy(np.int64)[m],
                "global_rank": rank[m]}))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"o_orderkey": pd.Series(dtype=np.int64),
                          "o_custkey": pd.Series(dtype=np.int64),
                          "global_rank": pd.Series(dtype=np.int64)})

    tagged = ds.map_batches(add_bucket, batch_format="pandas")
    out = partition_map(tagged, ["bucket"], pick, 16)
    return out.sort("o_orderkey")


systematic_sample.__doc__ = systematic_sample.__doc__.format(
    k=_SYS_K)


@register("forecast_backtest", sql="""
    WITH d AS (SELECT event_type, date_trunc('day', ts) AS dy,
                 CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    l AS (SELECT event_type, dy, n,
            lag(n, 1) OVER (PARTITION BY event_type ORDER BY dy)
              AS p1,
            lag(n, 7) OVER (PARTITION BY event_type ORDER BY dy)
              AS p7
          FROM d)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           avg(abs(CAST(n - p1 AS DOUBLE)) / CAST(n AS DOUBLE))
             AS mape_naive,
           avg(abs(CAST(n - p7 AS DOUBLE)) / CAST(n AS DOUBLE))
             AS mape_seasonal
    FROM l WHERE p1 IS NOT NULL AND p7 IS NOT NULL
    GROUP BY 1 ORDER BY 1""")
def forecast_backtest(sf_dir: str):
    """One-step-ahead forecast backtest on daily event volume: the
    naive forecast (yesterday's count) vs the weekly-seasonal naive
    (count 7 observations back), scored by MAPE per event type —
    the baseline pair every demand-forecasting pipeline must beat
    before any model ships. Daily integer count partials collapse
    per batch and fold driver-side (days × types cells); both
    predictors are row shifts on the day-sorted series and each
    day's error is one exact double division — round-6 absorbs the
    ~20-term mean's fold-order ulps. Map-only at any scale."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["ts"].to_numpy("datetime64[D]").astype(np.int64)
        g = pd.DataFrame({"event_type": b["event_type"]
                          .to_numpy(object), "dy": d,
                          "n": np.ones(len(b), np.int64)}) \
            .groupby(["event_type", "dy"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "dy"], ["n"])
    d = d.sort_values(["event_type", "dy"],
                      kind="mergesort").reset_index(drop=True)
    g = d.groupby("event_type", sort=True)
    d["p1"] = g["n"].shift(1)
    d["p7"] = g["n"].shift(7)
    m = d.dropna(subset=["p1", "p7"])
    n = m["n"].to_numpy(np.float64)
    e1 = np.abs(m["n"].to_numpy(np.int64)
                - m["p1"].to_numpy(np.int64)).astype(np.float64) / n
    e7 = np.abs(m["n"].to_numpy(np.int64)
                - m["p7"].to_numpy(np.int64)).astype(np.float64) / n
    t = pd.DataFrame({"event_type": m["event_type"]
                      .to_numpy(object), "e1": e1, "e7": e7})
    out = t.groupby("event_type", as_index=False).agg(
        n_days=("e1", "size"), mape_naive=("e1", "mean"),
        mape_seasonal=("e7", "mean"))
    out["n_days"] = out["n_days"].astype(np.int64)
    return out
