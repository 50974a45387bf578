# round-5 session-3 additions, batch 6: co-purchase graph degree
# distribution, ABC (Pareto) revenue classification, and
# order-to-ship lag quantiles per priority.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pa, pc, pd, ray,
                      rd, register)
from .q07_round_4_additions import _hist_quantile_cont
from .q10_feature_engineering_readability import _basket_edges

_ABC_A = 80            # class A: cumulative share <= 80%
_ABC_B = 95            # class B: cumulative share <= 95%


@register("degree_hist", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
          FROM d a JOIN d b
            ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
    deg AS (SELECT p, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT part_a AS p FROM e
                  UNION ALL SELECT part_b FROM e)
            GROUP BY p)
    SELECT degree, CAST(count(*) AS BIGINT) AS n_parts
    FROM deg GROUP BY degree ORDER BY degree""")
def degree_hist(sf_dir: str):
    """Degree distribution of the co-purchase graph: how many parts
    have k support-filtered co-order neighbors — the first plot of
    any graph analysis (power-law tail => hub products; the histogram
    also calibrates triangle/pagerank cost models). Scale plan:
    reuses the shared ``_basket_edges`` pipeline (two bounded
    exchanges); per-batch endpoint-count partials collapse into the
    parts-dimension combine; the degree histogram is a tiny
    driver-side value_counts. Exact integers throughout."""
    edges = _basket_edges(sf_dir)

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        p = np.concatenate([b["part_a"].to_numpy(np.int64),
                            b["part_b"].to_numpy(np.int64)])
        g = pd.DataFrame({"p": p}).groupby("p", as_index=False).size()
        return pd.DataFrame({"p": g["p"].to_numpy(np.int64),
                             "deg": g["size"].to_numpy(np.int64)})

    deg = _combine_partials(
        edges.map_batches(endpoints, batch_format="pandas"),
        ["p"], ["deg"])
    hist = deg["deg"].value_counts().sort_index()
    return pd.DataFrame({
        "degree": hist.index.to_numpy(np.int64),
        "n_parts": hist.to_numpy(np.int64)})


@register("abc_class", sql="""
    WITH r AS (SELECT l_partkey,
                      CAST(sum(CAST(round(l_extendedprice * 100)
                                    AS BIGINT)) AS BIGINT) AS cents
               FROM lineitem GROUP BY l_partkey),
    t AS (SELECT CAST(sum(cents) AS HUGEINT) AS total FROM r),
    c AS (SELECT l_partkey, cents,
                 CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
                                       ROWS BETWEEN UNBOUNDED
                                       PRECEDING AND CURRENT ROW)
                      AS HUGEINT) AS cum
          FROM r),
    k AS (SELECT CASE WHEN cum * 100 <= total * {a} THEN 'A'
                      WHEN cum * 100 <= total * {b} THEN 'B'
                      ELSE 'C' END AS abc, cents, total
          FROM c CROSS JOIN t)
    SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(sum(cents) AS DOUBLE) / CAST(max(total) AS DOUBLE)
             AS revenue_share
    FROM k GROUP BY abc ORDER BY abc""".format(a=_ABC_A, b=_ABC_B))
def abc_class(sf_dir: str):
    """ABC (Pareto) inventory classification: parts ranked by total
    revenue; class A holds the head until 80% of cumulative revenue,
    B until 95%, C the tail — the 80/20 segmentation behind stocking
    policy and (for corpora) source-prioritization decisions. All
    comparisons are INTEGER (cents x 100 vs total x threshold), so
    the class boundaries are exact; ties in revenue order break on
    partkey. Scale plan: per-batch per-part integer-cent partials
    collapse into the parts-dimension combine (the part grain is
    dimension-bounded, the part_pareto assumption); the cumulative
    scan runs on that bounded frame with python-int totals."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["l_extendedprice"].to_numpy()
                         * 100).astype(np.int64)
        g = pd.DataFrame({"l_partkey": b["l_partkey"]
                          .to_numpy(np.int64), "cents": cents}) \
            .groupby("l_partkey", as_index=False).sum()
        g["cents"] = g["cents"].astype(np.int64)
        return g

    r = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], ["cents"])
    r = r.sort_values(["cents", "l_partkey"],
                      ascending=[False, True],
                      kind="mergesort").reset_index(drop=True)
    cents = [int(x) for x in r["cents"]]
    total = sum(cents)
    cum, abc = 0, []
    for x in cents:
        cum += x
        abc.append("A" if cum * 100 <= total * _ABC_A
                   else ("B" if cum * 100 <= total * _ABC_B
                         else "C"))
    out = pd.DataFrame({"abc": pd.Series(abc, dtype=object),
                        "n_parts": np.ones(len(abc), np.int64),
                        "revenue_cents": r["cents"]
                        .to_numpy(np.int64)}) \
        .groupby("abc", as_index=False).sum()
    return pd.DataFrame({
        "abc": out["abc"].astype(object),
        "n_parts": out["n_parts"].to_numpy(np.int64),
        "revenue_cents": out["revenue_cents"].to_numpy(np.int64),
        "revenue_share": out["revenue_cents"].to_numpy(np.float64)
        / np.float64(total)})


@register("ship_lag_quantiles", sql="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           quantile_cont(date_diff('day', o_orderdate, l_shipdate),
                         0.5) AS lag_p50,
           quantile_cont(date_diff('day', o_orderdate, l_shipdate),
                         0.9) AS lag_p90
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority""")
def ship_lag_quantiles(sf_dir: str):
    """Order-to-ship lag quantiles per order priority: the p50/p90
    of days between order placement and each line's ship date — the
    SLA distribution an operations dashboard tracks, and a
    large x large join whose quantiles are computed EXACTLY without
    a global sort (lag days live in a bounded integer domain, so a
    per-priority day-histogram replaces sorting, the
    winsorized_stats device). Scale plan: lineitem pre-collapses to
    (orderkey, ship-day, n) per batch; the native hash join
    co-partitions both fact sides; per-partition (priority, lag, n)
    partials collapse into a priorities x day-domain combine and
    quantile_cont interpolates from cumulative counts
    (_hist_quantile_cont, bit-identical to DuckDB)."""
    line = rd.read_parquet(_path(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_shipdate"])

    def lpart(b: pd.DataFrame) -> pd.DataFrame:
        day = b["l_shipdate"].to_numpy("datetime64[us]") \
            .astype(np.int64) // 86_400_000_000
        g = pd.DataFrame({"l_orderkey": b["l_orderkey"]
                          .to_numpy(np.int64), "ship_day": day}) \
            .groupby(["l_orderkey", "ship_day"], as_index=False) \
            .size()
        g["n"] = g["size"].astype(np.int64)
        return g[["l_orderkey", "ship_day", "n"]]

    lag_rows = line.map_batches(lpart, batch_format="pandas")
    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = lag_rows.join(
        orders, "inner", num_partitions=max(2, min(16, ncpu)),
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25})

    def lagpart(b: pd.DataFrame) -> pd.DataFrame:
        oday = b["o_orderdate"].to_numpy("datetime64[us]") \
            .astype(np.int64) // 86_400_000_000
        lag = b["ship_day"].to_numpy(np.int64) - oday
        g = pd.DataFrame({"o_orderpriority": b["o_orderpriority"]
                          .astype(object), "lag": lag,
                          "n": b["n"].to_numpy(np.int64)}) \
            .groupby(["o_orderpriority", "lag"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        joined.map_batches(lagpart, batch_format="pandas",
                           batch_size=None),
        ["o_orderpriority", "lag"], ["n"])
    rows = []
    for pr, g in hist.groupby("o_orderpriority"):
        g = g.sort_values("lag", kind="mergesort")
        vals = g["lag"].to_numpy(np.int64)
        cts = g["n"].to_numpy(np.int64)
        rows.append((pr, int(cts.sum()),
                     float(_hist_quantile_cont(vals, cts, 0.5)),
                     float(_hist_quantile_cont(vals, cts, 0.9))))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n_lines",
                                      "lag_p50", "lag_p90"])
    out["n_lines"] = out["n_lines"].astype(np.int64)
    return out.sort_values("o_orderpriority",
                           kind="mergesort").reset_index(drop=True)
