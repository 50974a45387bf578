# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_COMBINE_MAX_ROWS, _combine_partials, _path, np, partition_map, pd, ray, rd, register)

@register("rfm_segments", sql="""
    WITH a AS (SELECT o_custkey AS c_custkey,
                      max(o_orderdate) AS last_order,
                      CAST(count(*) AS BIGINT) AS frequency,
                      CAST(sum(CAST(round(o_totalprice * 100)
                                    AS BIGINT)) AS BIGINT)
                          AS monetary_cents
               FROM orders GROUP BY o_custkey),
    r AS (SELECT c_custkey,
                 CAST(date_diff('day', last_order,
                      (SELECT max(o_orderdate) FROM orders))
                      AS BIGINT) AS recency_days,
                 frequency, monetary_cents
          FROM a),
    s AS (SELECT c_custkey, recency_days, frequency, monetary_cents,
                 CAST(ntile(5) OVER (ORDER BY recency_days,
                                     c_custkey) AS BIGINT) AS r_score,
                 CAST(ntile(5) OVER (ORDER BY frequency DESC,
                                     c_custkey) AS BIGINT) AS f_score,
                 CAST(ntile(5) OVER (ORDER BY monetary_cents DESC,
                                     c_custkey) AS BIGINT) AS m_score
          FROM r)
    SELECT c_custkey, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS segment
    FROM s ORDER BY c_custkey""")
def rfm_segments(sf_dir: str):
    """RFM customer segmentation — the canonical behavioral
    feature-engineering block: recency (days since last order),
    frequency, monetary value, each quintiled by an exact global
    NTILE(5), composed into a 3-digit segment code. Scale plan: ONE
    custkey exchange builds the customer-grain table; each quintile
    is the decile_lift two-phase rank (bounded metric histogram ->
    broadcast offsets + NTILE cuts -> metric-keyed exchange assigns
    bucket partition-locally) run per metric — four exchanges total,
    all on aggregate-grain rows; the monetary histogram carries the
    same sampled-boundary caveat decile_lift documents."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def agg_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["o_totalprice"].to_numpy()
                         * 100).astype(np.int64)
        g = pd.DataFrame({
            "c_custkey": b["o_custkey"].to_numpy(np.int64),
            "freq": np.ones(len(b), np.int64), "cp": cents,
            "last": b["o_orderdate"].to_numpy()})
        return g.groupby("c_custkey", as_index=False).agg(
            freq=("freq", "sum"), cp=("cp", "sum"),
            last=("last", "max"))

    def agg_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("c_custkey", as_index=False).agg(
            freq=("freq", "sum"), cp=("cp", "sum"),
            last=("last", "max"))

    # Materialized: this customer-grain table (aggregate-grain, far
    # smaller than the orders input) is consumed SEVEN times below
    # (max-date pass, three metric histograms, three score
    # exchanges); without pinning it, Ray's lazy execution re-runs
    # the read + custkey exchange for every consumer (measured 15.2 s
    # -> the chain below re-executed the upstream ~6x).
    cust = partition_map(
        ds.map_batches(agg_partial, batch_format="pandas"),
        ["c_custkey"], agg_final, 16).materialize()

    def maxdate_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": np.zeros(1, np.int64),
                             "mx": [b["last"].max()]})

    mx = cust.map_batches(maxdate_partial, batch_format="pandas") \
        .limit(_COMBINE_MAX_ROWS).to_pandas()["mx"].max()
    mx_day = np.datetime64(mx, "D").astype(np.int64)

    def add_recency(b: pd.DataFrame) -> pd.DataFrame:
        last_day = b["last"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        return pd.DataFrame({
            "c_custkey": b["c_custkey"].to_numpy(np.int64),
            "recency_days": mx_day - last_day,
            "frequency": b["freq"].to_numpy(np.int64),
            "monetary_cents": b["cp"].to_numpy(np.int64)})

    rfm = cust.map_batches(add_recency,
                           batch_format="pandas").materialize()

    def metric_hist(col):
        def h(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(col, as_index=False).agg(
                n=(col, "size"))
            g["n"] = g["n"].astype(np.int64)
            return g
        return h

    def ntile_of(rank: np.ndarray, n: int, buckets: int = 5):
        q, rem = divmod(n, buckets)
        big = rem * (q + 1)
        r0 = rank - 1
        return np.where(r0 < big, r0 // (q + 1) + 1,
                        rem + (r0 - big) // max(q, 1) + 1) \
            .astype(np.int64)

    n_total = None
    for col, out_col, ascending in (
            ("recency_days", "r_score", True),
            ("frequency", "f_score", False),
            ("monetary_cents", "m_score", False)):
        hist = _combine_partials(
            rfm.map_batches(metric_hist(col), batch_format="pandas"),
            [col], ["n"]).sort_values(col, ascending=ascending,
                                      kind="mergesort")
        counts = hist["n"].to_numpy(np.int64)
        if n_total is None:
            n_total = int(counts.sum())
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        keys = hist[col].to_numpy(np.int64)
        ko = np.argsort(keys)
        ref = ray.put((keys[ko], offs[ko]))

        def score_pass(g: pd.DataFrame, col=col, out_col=out_col,
                       ascending=ascending, ref=ref, n=n_total):
            k, o = ray.get(ref)
            g = g.sort_values([col, "c_custkey"],
                              ascending=[ascending, True],
                              kind="mergesort")
            base = o[np.searchsorted(k, g[col].to_numpy(np.int64))]
            rank = base + g.groupby(col, sort=False).cumcount() \
                .to_numpy(np.int64) + 1
            g = g.copy()
            g[out_col] = ntile_of(rank, n)
            return g

        # each pass's output feeds BOTH the next histogram and the
        # next exchange — pin it or the chain re-executes
        rfm = partition_map(rfm, [col], score_pass, 8).materialize()

    out = rfm.to_pandas()
    out["segment"] = (out["r_score"] * 100 + out["f_score"] * 10
                      + out["m_score"]).astype(np.int64)
    return out.sort_values("c_custkey",
                           kind="mergesort").reset_index(drop=True)


@register("orders_growth", sql="""
    WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                      CAST(month(o_orderdate) AS BIGINT) AS m,
                      CAST(sum(CAST(round(o_totalprice * 100)
                                    AS BIGINT)) AS BIGINT) AS cp
               FROM orders GROUP BY 1, 2)
    SELECT y, m, cp,
           CASE WHEN lag(cp) OVER (ORDER BY y, m) IS NULL THEN NULL
                ELSE (CAST(cp AS DOUBLE)
                      - CAST(lag(cp) OVER (ORDER BY y, m) AS DOUBLE))
                     / CAST(lag(cp) OVER (ORDER BY y, m) AS DOUBLE)
           END AS growth
    FROM m ORDER BY y, m""")
def orders_growth(sf_dir: str):
    """Month-over-month revenue growth rate — the trend derivative a
    freshness dashboard plots (orders_monthly reports shares; this
    reports the lagged delta). The (year, month) grid is bounded, so
    per-batch integer partials collapse to one tiny combine and the
    LAG + growth division run once on the driver in oracle order;
    the first month's growth is NULL in both engines."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        dt = b["o_orderdate"]
        cents = np.round(b["o_totalprice"].to_numpy()
                         * 100).astype(np.int64)
        g = pd.DataFrame({"y": dt.dt.year.to_numpy(np.int64),
                          "m": dt.dt.month.to_numpy(np.int64),
                          "cp": cents})
        return g.groupby(["y", "m"], as_index=False).agg(
            cp=("cp", "sum"))

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["y", "m"], ["cp"])
    out = out.sort_values(["y", "m"],
                          kind="mergesort").reset_index(drop=True)
    cp = out["cp"].to_numpy(np.int64).astype(np.float64)
    growth = np.full(len(cp), np.nan)
    growth[1:] = (cp[1:] - cp[:-1]) / cp[:-1]
    out["cp"] = out["cp"].astype(np.int64)
    out["growth"] = growth
    return out.astype({"y": np.int64, "m": np.int64})
