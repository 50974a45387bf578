# round-5 session-5 additions, batch 31: the exact 1-D Wasserstein
# distance between quantity distributions, CUPED variance reduction
# for the purchase metric, and the Newcombe score CI for an arm
# difference.
from __future__ import annotations

from ...functions.hashing import md5_id64_flat
from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_CU_Y0, _CU_Y1 = 1996, 1997
_NC_Z = 1.96
_NC_TH = 14            # heavy-purchaser threshold (srm family)


@register("wasserstein_1d", sql="""
    WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END) AS BIGINT) AS a,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 0 ELSE 1 END) AS BIGINT) AS b
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(a) AS HUGEINT) AS n,
                 CAST(sum(b) AS HUGEINT) AS m FROM h),
    c AS (SELECT v, a, b,
                 CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
                 CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb,
                 lead(v) OVER (ORDER BY v) AS nv
          FROM h),
    s AS (SELECT CAST(sum(abs(CAST(ca AS HUGEINT)
                              * (SELECT m FROM t)
                              - CAST(cb AS HUGEINT)
                                * (SELECT n FROM t))
                          * (nv - v)) AS HUGEINT) AS w
          FROM c WHERE nv IS NOT NULL)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_returned,
           CAST((SELECT m FROM t) AS BIGINT) AS n_kept,
           CAST((SELECT w FROM s) AS DOUBLE)
           / (CAST((SELECT n FROM t) AS DOUBLE)
              * CAST((SELECT m FROM t) AS DOUBLE))
             AS wasserstein_1""")
def wasserstein_1d(sf_dir: str):
    """1-D WASSERSTEIN (earth-mover) DISTANCE between returned and
    kept quantity distributions: integral of |F - G| over the
    bounded domain — the optimal-transport metric in units of the
    variable itself ('returned items run X units heavier'),
    completing the two-sample family (ks_2samp supremum,
    cramer_von_mises quadratic, energy_distance metric) with the
    interpretable one. The integral reduces EXACTLY to
    sum |cumA*m - cumB*n| * gap over histogram steps — one exact
    big-integer fold, ONE final division. Scale plan: per-batch
    (quantity, flag) histogram partials; the cumulative scan is
    O(domain) on the driver."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_returnflag"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["l_quantity"].to_numpy(np.int64)
        r = (b["l_returnflag"].to_numpy(object)
             == "R").astype(np.int64)
        g = pd.DataFrame({"v": v, "a": r, "b": 1 - r}) \
            .groupby("v", as_index=False).sum()
        for c in ("a", "b"):
            g[c] = g[c].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["v"], ["a", "b"]).sort_values("v").reset_index(drop=True)
    v = h["v"].to_numpy(np.int64)
    a = h["a"].to_numpy(np.int64)
    b = h["b"].to_numpy(np.int64)
    n, m = int(a.sum()), int(b.sum())
    ca = np.cumsum(a)
    cb = np.cumsum(b)
    w = 0
    for i in range(len(v) - 1):
        w += abs(int(ca[i]) * m - int(cb[i]) * n) \
            * (int(v[i + 1]) - int(v[i]))
    return pd.DataFrame({
        "n_returned": [np.int64(n)], "n_kept": [np.int64(m)],
        "wasserstein_1": [np.float64(w)
                          / (np.float64(n) * np.float64(m))]})


@register("cuped_adjustment", sql="""
    WITH y0 AS (SELECT o_custkey AS c, CAST(count(*) AS BIGINT)
                  AS x
                FROM orders WHERE year(o_orderdate) = {y0}
                GROUP BY 1),
    y1 AS (SELECT o_custkey AS c, CAST(count(*) AS BIGINT) AS y
           FROM orders WHERE year(o_orderdate) = {y1}
           GROUP BY 1),
    u AS (SELECT COALESCE(y0.c, y1.c) AS c,
                 COALESCE(y0.x, 0) AS x, COALESCE(y1.y, 0) AS y
          FROM y0 FULL OUTER JOIN y1 ON y0.c = y1.c),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM u),
    f AS (SELECT CAST(n AS BIGINT) AS n,
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
                 CAST(n * syy - sy * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                   AS var_y,
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS rho2
          FROM m)
    SELECT n AS n_customers, theta, var_y,
           var_y * (1.0 - rho2) AS var_adjusted,
           rho2 AS variance_reduction
    FROM f""".format(y0=_CU_Y0, y1=_CU_Y1))
def cuped_adjustment(sf_dir: str):
    """CUPED VARIANCE REDUCTION for the yearly order-count metric:
    theta = cov(X,Y)/var(X) with X = {y0} pre-period count and
    Y = {y1} metric, the adjusted variance var(Y)(1 - rho^2), and
    the achieved reduction rho^2 — the pre-experiment covariate
    trick that shrinks A/B confidence intervals for free and
    decides whether power_sample_size's n is affordable. Customers
    are FULL-OUTER matched across years (absent year = 0); all
    moments are exact integer folds through one custkey exchange
    and every output is a shared float expression. Scale plan:
    per-customer (x, y) cells co-partition by custkey; partitions
    emit 6-cell moment partials — no customer-grain driver pull."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["o_orderdate"].dt.year.to_numpy(np.int64)
        m = (y == _CU_Y0) | (y == _CU_Y1)
        return pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64)[m],
            "x": (y[m] == _CU_Y0).astype(np.int64),
            "y": (y[m] == _CU_Y1).astype(np.int64)}) \
            .groupby("cust", as_index=False).sum()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("cust", as_index=False)[["x", "y"]].sum()
        x = a["x"].to_numpy(np.int64).astype(object)
        yv = a["y"].to_numpy(np.int64).astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(a)], np.int64),
            "sx": [int(x.sum())], "sy": [int(yv.sum())],
            "sxx": [int((x * x).sum())],
            "syy": [int((yv * yv).sum())],
            "sxy": [int((x * yv).sum())]})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["cust"], cells, 16),
        ["j"], ["n", "sx", "sy", "sxx", "syy", "sxy"],
        exact_int=True)
    n = int(s["n"].iloc[0])
    sx, sy = int(s["sx"].iloc[0]), int(s["sy"].iloc[0])
    sxx, syy = int(s["sxx"].iloc[0]), int(s["syy"].iloc[0])
    sxy = int(s["sxy"].iloc[0])
    theta = np.float64(n * sxy - sx * sy) \
        / np.float64(n * sxx - sx * sx)
    var_y = np.float64(n * syy - sy * sy) \
        / (np.float64(n) * np.float64(n))
    rho2 = np.float64(n * sxy - sx * sy) \
        * np.float64(n * sxy - sx * sy) \
        / (np.float64(n * sxx - sx * sx)
           * np.float64(n * syy - sy * sy))
    return pd.DataFrame({
        "n_customers": [np.int64(n)], "theta": [theta],
        "var_y": [var_y], "var_adjusted": [var_y * (1.0 - rho2)],
        "variance_reduction": [rho2]})


@register("newcombe_diff_ci", sql="""
    WITH u AS (SELECT user_id, CAST(count(*) FILTER (
                   event_type = 'purchase') AS BIGINT) AS pc
               FROM events GROUP BY user_id),
    r AS (SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                       || ':arm'), 1, 16))::UBIGINT % 2 AS BIGINT)
                   AS arm,
                 CASE WHEN pc >= {th} THEN 1 ELSE 0 END AS conv
          FROM u),
    s AS (SELECT CAST(sum(1 - arm) AS BIGINT) AS n0,
                 CAST(sum(arm) AS BIGINT) AS n1,
                 CAST(sum((1 - arm) * conv) AS BIGINT) AS c0,
                 CAST(sum(arm * conv) AS BIGINT) AS c1
          FROM r),
    w AS (SELECT n0, n1, c0, c1,
            (CAST(c0 AS DOUBLE) + {z} * {z} / 2.0)
              / (CAST(n0 AS DOUBLE) + {z} * {z}) AS m0,
            {z} * sqrt(CAST(c0 AS DOUBLE)
                 * (CAST(n0 AS DOUBLE) - CAST(c0 AS DOUBLE))
                 / CAST(n0 AS DOUBLE) + {z} * {z} / 4.0)
              / (CAST(n0 AS DOUBLE) + {z} * {z}) AS h0,
            (CAST(c1 AS DOUBLE) + {z} * {z} / 2.0)
              / (CAST(n1 AS DOUBLE) + {z} * {z}) AS m1,
            {z} * sqrt(CAST(c1 AS DOUBLE)
                 * (CAST(n1 AS DOUBLE) - CAST(c1 AS DOUBLE))
                 / CAST(n1 AS DOUBLE) + {z} * {z} / 4.0)
              / (CAST(n1 AS DOUBLE) + {z} * {z}) AS h1
          FROM s)
    SELECT n0 AS n_control, n1 AS n_treatment,
           CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff,
           (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
           - sqrt((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - (m1 - h1))
                  * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - (m1 - h1))
                  + ((m0 + h0)
                     - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                    * ((m0 + h0)
                       - CAST(c0 AS DOUBLE)
                         / CAST(n0 AS DOUBLE))) AS ci_lower,
           (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
           + sqrt(((m1 + h1)
                   - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                  * ((m1 + h1)
                     - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                  + (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                     - (m0 - h0))
                    * (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                       - (m0 - h0))) AS ci_upper
    FROM w""".format(z=_NC_Z, th=_NC_TH))
def newcombe_diff_ci(sf_dir: str):
    """NEWCOMBE HYBRID-SCORE CONFIDENCE INTERVAL for the arm
    difference in heavy-purchaser rates (the srm_check hash arms,
    the power_sample_size metric): each arm gets a Wilson score
    interval and the difference CI composes their distances in
    quadrature — the experiment-readout interval that never
    collapses at 0% or 100% where the naive Wald CI lies. Counts
    are exact integer folds over deduplicated users; every interval
    bound is one shared float expression (the wilson_ci algebra,
    composed). Scale plan: per-user conversion collapses through
    ONE user exchange; the interval math is driver arithmetic."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "pc": (b["event_type"].to_numpy(object)
                   == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False)["pc"].sum()
        ids = a["user_id"].to_numpy(np.int64)
        arm = (md5_id64_flat(ids, ":arm")[0] % 2).astype(np.int64)
        conv = (a["pc"].to_numpy(np.int64)
                >= _NC_TH).astype(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n0": np.array([int((arm == 0).sum())], np.int64),
            "n1": np.array([int((arm == 1).sum())], np.int64),
            "c0": np.array([int(conv[arm == 0].sum())], np.int64),
            "c1": np.array([int(conv[arm == 1].sum())],
                           np.int64)})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["j"], ["n0", "n1", "c0", "c1"])
    n0, n1 = int(s["n0"].iloc[0]), int(s["n1"].iloc[0])
    c0, c1 = int(s["c0"].iloc[0]), int(s["c1"].iloc[0])
    z = _NC_Z

    def wilson(c: int, n: int):
        fc, fn_ = np.float64(c), np.float64(n)
        mid = (fc + z * z / 2.0) / (fn_ + z * z)
        half = z * np.sqrt(fc * (fn_ - fc) / fn_
                           + z * z / 4.0) / (fn_ + z * z)
        return mid, half

    p0 = np.float64(c0) / np.float64(n0)
    p1 = np.float64(c1) / np.float64(n1)
    m0, h0 = wilson(c0, n0)
    m1, h1 = wilson(c1, n1)
    d = p1 - p0
    lo = d - np.sqrt((p1 - (m1 - h1)) * (p1 - (m1 - h1))
                     + ((m0 + h0) - p0) * ((m0 + h0) - p0))
    hi = d + np.sqrt(((m1 + h1) - p1) * ((m1 + h1) - p1)
                     + (p0 - (m0 - h0)) * (p0 - (m0 - h0)))
    return pd.DataFrame({
        "n_control": [np.int64(n0)], "n_treatment": [np.int64(n1)],
        "diff": [np.float64(d)], "ci_lower": [np.float64(lo)],
        "ci_upper": [np.float64(hi)]})
