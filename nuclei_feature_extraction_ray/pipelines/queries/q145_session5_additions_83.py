# round-5 session-5 additions, batch 83: exact 1-D k-means elbow by
# interval DP, sweep-line interval-union utilization, and quadratic
# trend by exact normal equations.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply
from ...stages.window import segment_codes
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue


@register("kmeans1d_elbow", sql="""
    WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) // 100000 AS b
               FROM orders),
    h AS (SELECT b, CAST(count(*) AS BIGINT) AS c
          FROM o GROUP BY b),
    arr AS (SELECT list(CAST(b AS HUGEINT) ORDER BY b) AS bl,
                   list(CAST(c AS HUGEINT) ORDER BY b) AS cl,
                   CAST(count(*) AS BIGINT) AS m
            FROM h),
    pre AS (SELECT m, bl, cl,
                   list_prepend(CAST(0 AS HUGEINT),
                       list_transform(range(1, m + 1), i ->
                           list_sum(list_slice(cl, 1, i)))) AS p0,
                   list_prepend(CAST(0 AS HUGEINT),
                       list_transform(range(1, m + 1), i ->
                           list_sum(list_transform(
                               range(1, i + 1),
                               k -> bl[k] * cl[k])))) AS p1,
                   list_prepend(CAST(0 AS HUGEINT),
                       list_transform(range(1, m + 1), i ->
                           list_sum(list_transform(
                               range(1, i + 1),
                               k -> bl[k] * bl[k] * cl[k]))))
                     AS p2
            FROM arr),
    f1 AS (SELECT m, p0, p1, p2,
                  list_transform(range(1, m + 1), i ->
                      (p2[i + 1] - p2[1])
                      - (p1[i + 1] - p1[1])
                        * (p1[i + 1] - p1[1])
                        // (p0[i + 1] - p0[1])) AS f1l
           FROM pre),
    f2 AS (SELECT m, p0, p1, p2, f1l,
                  list_transform(range(1, m + 1), i ->
                      CASE WHEN i = 1 THEN f1l[1]
                      ELSE list_min(list_transform(
                          range(1, i), j ->
                          f1l[j] + ((p2[i + 1] - p2[j + 1])
                              - (p1[i + 1] - p1[j + 1])
                                * (p1[i + 1] - p1[j + 1])
                                // (p0[i + 1] - p0[j + 1]))))
                      END) AS f2l
           FROM f1)
    SELECT CAST(m AS BIGINT) AS n_buckets,
           CAST(f1l[m] AS BIGINT) AS wss_k1,
           CAST(f2l[m] AS BIGINT) AS wss_k2,
           CAST(CASE WHEN m <= 2 THEN f2l[m]
                ELSE list_min(list_transform(range(1, m), j ->
                    f2l[j] + ((p2[m + 1] - p2[j + 1])
                        - (p1[m + 1] - p1[j + 1])
                          * (p1[m + 1] - p1[j + 1])
                          // (p0[m + 1] - p0[j + 1]))))
                END AS BIGINT) AS wss_k3
    FROM f2""")
def kmeans1d_elbow(sf_dir: str):
    """EXACT 1-D K-MEANS ELBOW (k = 1, 2, 3) on order totals
    bucketed to $1000 bins: optimal within-cluster SSE by the
    interval dynamic program (1-D k-means clusters are always
    contiguous, so the DP over split points is EXACT — no Lloyd
    seeds, no local optima; the elbow drop wss_k2/wss_k1 vs
    wss_k3/wss_k2 says whether order values are really bimodal).
    Range SSE uses prefix sums with exact integer floor-division
    (identical both engines), so every DP value is an exact
    integer; the oracle evaluates the same DP with nested list
    lambdas (no recursion needed — two O(m^2) transforms). Scale
    plan: bounded bucket-domain combine; the DP is O(k*m^2)
    driver work on ~600 cells."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"b": cents // 100000,
                          "c": np.ones(len(b), np.int64)}) \
            .groupby("b", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["b"], ["c"]).sort_values("b")
    bl = [int(x) for x in h["b"]]
    cl = [int(x) for x in h["c"]]
    m = len(bl)
    p0 = [0]
    p1 = [0]
    p2 = [0]
    for b, c in zip(bl, cl):
        p0.append(p0[-1] + c)
        p1.append(p1[-1] + b * c)
        p2.append(p2[-1] + b * b * c)

    def cost(a, i):
        c = p0[i] - p0[a]
        s = p1[i] - p1[a]
        ss = p2[i] - p2[a]
        return ss - s * s // c

    f1 = [cost(0, i) for i in range(1, m + 1)]
    f2 = [f1[0] if i == 1 else
          min(f1[j - 1] + cost(j, i) for j in range(1, i))
          for i in range(1, m + 1)]
    wss3 = f2[m - 1] if m <= 2 else \
        min(f2[j - 1] + cost(j, m) for j in range(1, m))
    return pd.DataFrame({
        "n_buckets": [np.int64(m)],
        "wss_k1": [np.int64(f1[m - 1])],
        "wss_k2": [np.int64(f2[m - 1])],
        "wss_k3": [np.int64(wss3)]})


@register("interval_union", sql="""
    WITH li AS (SELECT l_suppkey,
                       CAST(floor(epoch(CAST(l_shipdate AS
                            TIMESTAMP)) / 86400) AS BIGINT) AS a,
                       CAST(floor(epoch(CAST(l_shipdate AS
                            TIMESTAMP)) / 86400) AS BIGINT)
                       + CAST(l_quantity AS BIGINT) AS z,
                       l_orderkey, l_linenumber
                FROM lineitem),
    w AS (SELECT l_suppkey, a, z,
                 max(z) OVER (PARTITION BY l_suppkey
                     ORDER BY a, z, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS pm
          FROM li),
    c AS (SELECT l_suppkey,
                 greatest(CAST(0 AS BIGINT),
                          z - greatest(a, COALESCE(pm + 1, a))
                          + 1) AS contrib
          FROM w),
    s AS (SELECT l_suppkey,
                 CAST(sum(contrib) AS BIGINT) AS busy
          FROM c GROUP BY l_suppkey),
    sp AS (SELECT l_suppkey,
                  CAST(max(z) - min(a) + 1 AS BIGINT) AS span
           FROM li GROUP BY l_suppkey)
    SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(s.busy) AS BIGINT) AS total_busy_days,
           CAST(sum(sp.span) AS BIGINT) AS total_span_days,
           CAST(sum(s.busy) AS DOUBLE)
           / CAST(sum(sp.span) AS DOUBLE) AS utilization
    FROM s JOIN sp ON sp.l_suppkey = s.l_suppkey""")
def interval_union(sf_dir: str):
    """SWEEP-LINE INTERVAL UNION per supplier: each line item
    occupies [ship, ship + quantity] days (quantity proxies the
    fulfilment duration); the union length (busy days,
    overlaps collapsed) over the supplier's active span gives
    fleet utilization — the canonical interval-union primitive
    (calendar coverage, SLA busy-time) that naive day-sums
    double-count. The sweep is ONE window cummax per supplier
    (contribution = clamp(receipt - max(ship, prev_max + 1) + 1)),
    fully deterministic under the (ship, receipt, orderkey,
    linenumber) order, and every day count is an exact integer;
    one final division. Scale plan: supplier-keyed exchange with
    partition-local sweeps (window function / vectorized cummax);
    two integer folds out."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_shipdate",
                                  "l_quantity", "l_orderkey",
                                  "l_linenumber"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        a = g["l_shipdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        z = a + g["l_quantity"].to_numpy(np.float64) \
            .astype(np.int64)
        sup = g["l_suppkey"].to_numpy(np.int64)
        ok = np.lexsort((g["l_linenumber"].to_numpy(np.int64),
                         g["l_orderkey"].to_numpy(np.int64),
                         z, a, sup))
        a, z, sup = a[ok], z[ok], sup[ok]
        codes = segment_codes(sup)
        df = pd.DataFrame({"seg": codes, "a": a, "z": z})
        pm = df.groupby("seg")["z"].cummax().shift(1)
        new_seg = df["seg"] != df["seg"].shift(1)
        pm[new_seg] = np.nan
        start = np.where(pm.isna(), a,
                         np.maximum(a, pm.fillna(0)
                                    .to_numpy(np.int64) + 1))
        contrib = np.maximum(0, z - start + 1)
        per = pd.DataFrame({"seg": codes, "c": contrib,
                            "a": a, "z": z}) \
            .groupby("seg").agg(busy=("c", "sum"),
                                mn=("a", "min"),
                                mx=("z", "max"))
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "ns": np.array([len(per)], np.int64),
            "busy": [int(per["busy"].sum())],
            "span": [int((per["mx"] - per["mn"] + 1).sum())]})

    t = _combine_partials(
        partitioned_apply(ds, "l_suppkey", fn, 16,
                          sort_cols=["l_suppkey", "l_shipdate",
                                     "l_orderkey",
                                     "l_linenumber"]),
        ["j"], ["ns", "busy", "span"], exact_int=True)
    ns = int(t["ns"].iloc[0])
    busy = int(t["busy"].iloc[0])
    span = int(t["span"].iloc[0])
    return pd.DataFrame({
        "n_suppliers": [np.int64(ns)],
        "total_busy_days": [np.int64(busy)],
        "total_span_days": [np.int64(span)],
        "utilization": [np.float64(busy) / np.float64(span)]})


@register("quad_trend", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT CAST(row_number() OVER (ORDER BY day)
                      AS HUGEINT) AS i,
                 CAST(v AS HUGEINT) AS y
          FROM d),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS s0,
                 CAST(sum(i) AS HUGEINT) AS s1,
                 CAST(sum(i * i) AS HUGEINT) AS s2,
                 CAST(sum(i * i * i) AS HUGEINT) AS s3,
                 CAST(sum(i * i * i * i) AS HUGEINT) AS s4,
                 CAST(sum(y) AS HUGEINT) AS t0,
                 CAST(sum(i * y) AS HUGEINT) AS t1,
                 CAST(sum(i * i * y) AS HUGEINT) AS t2
          FROM x)
    SELECT CAST(s0 AS BIGINT) AS n_days,
           CAST(s0 * (s2 * t2 - s3 * t1)
                - s1 * (s1 * t2 - s3 * t0)
                + s2 * (s1 * t1 - s2 * t0) AS DOUBLE)
           / CAST(s0 * (s2 * s4 - s3 * s3)
                  - s1 * (s1 * s4 - s2 * s3)
                  + s2 * (s1 * s3 - s2 * s2) AS DOUBLE)
             AS accel_cents_per_day2
    FROM m""")
def quad_trend(sf_dir: str):
    """QUADRATIC TREND (acceleration) of daily revenue by exact
    normal equations: fit y = b0 + b1*i + b2*i^2 over the day
    index and report b2 — positive curvature means growth is
    ACCELERATING, the second-order question trend_forecast's
    straight line cannot ask. b2 comes from Cramer's rule on the
    3x3 moment matrix; every power moment and both 3x3
    determinants are EXACT integers (python int / HUGEINT — the
    chow_test overflow policy), so the whole statistic is one
    division of exact determinants. Scale plan: bounded
    day-domain combine; O(1) driver arithmetic (at fleet scale
    the power moments fold inside map_batches)."""
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    s0 = n
    s1 = s2 = s3 = s4 = 0
    t0 = t1 = t2 = 0
    for i, y in enumerate(v, start=1):
        s1 += i
        s2 += i * i
        s3 += i * i * i
        s4 += i * i * i * i
        t0 += y
        t1 += i * y
        t2 += i * i * y
    num = s0 * (s2 * t2 - s3 * t1) - s1 * (s1 * t2 - s3 * t0) \
        + s2 * (s1 * t1 - s2 * t0)
    den = s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s2 * s3) \
        + s2 * (s1 * s3 - s2 * s2)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "accel_cents_per_day2": [np.float64(num)
                                 / np.float64(den)]})
