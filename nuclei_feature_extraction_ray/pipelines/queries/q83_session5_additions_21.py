# round-5 session-5 additions, batch 21: Chapman capture-recapture
# population estimate, Mahalanobis multivariate outlier census, and
# the Newey-West HAC standard error of the daily-revenue mean.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_CR_Y1, _CR_Y2 = 1996, 1997
_MAH_CHI2 = 9.21        # chi2(2) 0.99 critical value
_NW_LAGS = 5


@register("capture_recapture", sql="""
    WITH a AS (SELECT DISTINCT o_custkey AS c FROM orders
               WHERE year(o_orderdate) = {y1}),
    b AS (SELECT DISTINCT o_custkey AS c FROM orders
          WHERE year(o_orderdate) = {y2}),
    s AS (SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n1,
                 CAST((SELECT count(*) FROM b) AS BIGINT) AS n2,
                 CAST((SELECT count(*) FROM a JOIN b
                       ON a.c = b.c) AS BIGINT) AS m)
    SELECT n1 AS n_year1, n2 AS n_year2, m AS n_both,
           (CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
            / CAST(m + 1 AS DOUBLE)) - 1.0 AS chapman_estimate,
           sqrt(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
                / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
                   * CAST(m + 2 AS DOUBLE))) AS chapman_se
    FROM s""".format(y1=_CR_Y1, y2=_CR_Y2))
def capture_recapture(sf_dir: str):
    """CHAPMAN CAPTURE-RECAPTURE estimate of the active customer
    universe: {y1} activity is the first capture, {y2} the second,
    and the overlap sizes the unseen population —
    N = (n1+1)(n2+1)/(m+1) - 1 with its closed-form SE; the ecology
    estimator data teams reuse to size 'how many duplicate entities
    REALLY exist' from two independent dedup passes (the population
    counterpart of chao1_richness's unseen vocabulary). All three
    counts are exact integer folds; estimate and SE are shared
    float expressions. Scale plan: per-year distinct customers ride
    ONE custkey exchange whose partitions emit 3 scalars (a
    customer's both-year membership is decided inside its
    partition); the driver does two divisions."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["o_orderdate"].dt.year.to_numpy(np.int64)
        m = (y == _CR_Y1) | (y == _CR_Y2)
        return pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64)[m],
            "in1": (y[m] == _CR_Y1).astype(np.int64),
            "in2": (y[m] == _CR_Y2).astype(np.int64)}) \
            .groupby("cust", as_index=False).max()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("cust", as_index=False).max()
        i1 = a["in1"].to_numpy(np.int64)
        i2 = a["in2"].to_numpy(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n1": np.array([int(i1.sum())], np.int64),
            "n2": np.array([int(i2.sum())], np.int64),
            "m": np.array([int((i1 & i2).sum())], np.int64)})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["cust"], cells, 16),
        ["j"], ["n1", "n2", "m"])
    n1, n2 = int(s["n1"].iloc[0]), int(s["n2"].iloc[0])
    m = int(s["m"].iloc[0])
    est = (np.float64(n1 + 1) * np.float64(n2 + 1)
           / np.float64(m + 1)) - 1.0
    se = np.sqrt(np.float64(n1 + 1) * np.float64(n2 + 1)
                 * np.float64(n1 - m) * np.float64(n2 - m)
                 / (np.float64(m + 1) * np.float64(m + 1)
                    * np.float64(m + 2)))
    return pd.DataFrame({
        "n_year1": [np.int64(n1)], "n_year2": [np.int64(n2)],
        "n_both": [np.int64(m)],
        "chapman_estimate": [np.float64(est)],
        "chapman_se": [np.float64(se)]})


@register("mahalanobis_outliers", sql="""
    WITH p AS (SELECT CAST(n_chars AS BIGINT) AS x,
                      CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f')
                                     = '' THEN 0
                           ELSE len(string_split_regex(
                               trim(text, E' \\t\\n\\r\\f'),
                               '[ \\t\\n\\r\\f]+')) END
                           AS BIGINT) AS y
               FROM documents),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM p),
    c AS (SELECT CAST(n AS DOUBLE) AS fn,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                 CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                 CAST(n * sxx - sx * sx AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vx,
                 CAST(n * syy - sy * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vy,
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cxy
          FROM m),
    d AS (SELECT CAST(count(*) AS BIGINT) AS n_out
          FROM p, c
          WHERE ((CAST(p.x AS DOUBLE) - c.mx)
                 * (CAST(p.x AS DOUBLE) - c.mx) * c.vy
                 - 2.0 * (CAST(p.x AS DOUBLE) - c.mx)
                   * (CAST(p.y AS DOUBLE) - c.my) * c.cxy
                 + (CAST(p.y AS DOUBLE) - c.my)
                   * (CAST(p.y AS DOUBLE) - c.my) * c.vx)
                / (c.vx * c.vy - c.cxy * c.cxy) > {t})
    SELECT (SELECT CAST(fn AS BIGINT) FROM c) AS n_docs,
           (SELECT vx FROM c) AS var_chars,
           (SELECT vy FROM c) AS var_tokens,
           (SELECT cxy FROM c) AS cov_xy,
           (SELECT n_out FROM d) AS n_outliers,
           CAST((SELECT n_out FROM d) AS DOUBLE)
             / (SELECT fn FROM c) AS outlier_rate""".format(
    t=_MAH_CHI2))
def mahalanobis_outliers(sf_dir: str):
    """MAHALANOBIS MULTIVARIATE OUTLIER census over the (chars,
    tokens) cloud: squared distance under the closed-form 2x2
    inverse covariance, flagged above the chi-square(2) 99%
    critical value — catches documents whose length PAIR is
    inconsistent (burst of long tokens, markup-stripped husks) that
    neither univariate fence (value_outliers) can see. The
    covariance comes from exact integer moments; every per-point
    distance is the SAME float expression on both engines, so the
    threshold census is an exact count. Scale plan: one moment pass
    (6 cells) then one counting pass with the 5 broadcast scalars
    in the closure — two map-only scans, no row-grain exchange."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["n_chars", "text"])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        _, k = tokens_flat(b["text"])
        x = b["n_chars"].to_numpy(np.int64).astype(object)
        y = k.astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxx": [int((x * x).sum())],
            "syy": [int((y * y).sum())],
            "sxy": [int((x * y).sum())]})

    s = _combine_partials(
        ds.map_batches(moments, batch_format="pandas"),
        ["j"], ["n", "sx", "sy", "sxx", "syy", "sxy"],
        exact_int=True)
    n = int(s["n"].iloc[0])
    sx, sy = int(s["sx"].iloc[0]), int(s["sy"].iloc[0])
    sxx, syy = int(s["sxx"].iloc[0]), int(s["syy"].iloc[0])
    sxy = int(s["sxy"].iloc[0])
    fn_ = np.float64(n)
    mx = np.float64(sx) / fn_
    my = np.float64(sy) / fn_
    vx = np.float64(n * sxx - sx * sx) / (fn_ * fn_)
    vy = np.float64(n * syy - sy * sy) / (fn_ * fn_)
    cxy = np.float64(n * sxy - sx * sy) / (fn_ * fn_)
    det = vx * vy - cxy * cxy

    def count(b: pd.DataFrame) -> pd.DataFrame:
        _, k = tokens_flat(b["text"])
        x = b["n_chars"].to_numpy(np.int64).astype(np.float64)
        y = k.astype(np.float64)
        d2 = ((x - mx) * (x - mx) * vy
              - 2.0 * (x - mx) * (y - my) * cxy
              + (y - my) * (y - my) * vx) / det
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "c": np.array([int((d2 > _MAH_CHI2).sum())],
                          np.int64)})

    c = _combine_partials(
        ds.map_batches(count, batch_format="pandas"),
        ["j"], ["c"])
    n_out = int(c["c"].iloc[0])
    return pd.DataFrame({
        "n_docs": [np.int64(n)], "var_chars": [np.float64(vx)],
        "var_tokens": [np.float64(vy)], "cov_xy": [np.float64(cxy)],
        "n_outliers": [np.int64(n_out)],
        "outlier_rate": [np.float64(n_out) / fn_]})


@register("newey_west", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM x),
    g AS (SELECT CAST(k AS BIGINT) AS k,
                 CAST(count(*) AS BIGINT) AS np_,
                 CAST(sum(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT)
                   AS sxy
          FROM (SELECT unnest(generate_series(0, {L})) AS k) lags
          JOIN x a ON TRUE JOIN x b ON b.t = a.t + lags.k
          GROUP BY k),
    c AS (SELECT k, np_,
                 (CAST(sxy AS DOUBLE)
                  - CAST(np_ AS DOUBLE)
                    * (CAST((SELECT s FROM m) AS DOUBLE)
                       / CAST((SELECT n FROM m) AS DOUBLE))
                    * (CAST((SELECT s FROM m) AS DOUBLE)
                       / CAST((SELECT n FROM m) AS DOUBLE)))
                 / CAST((SELECT n FROM m) AS DOUBLE) AS gam
          FROM g)
    SELECT CAST((SELECT n FROM m) AS BIGINT) AS n_days,
           (SELECT gam FROM c WHERE k = 0) AS gamma0,
           (SELECT gam FROM c WHERE k = 0)
           + 2.0 * CAST((SELECT sum(CAST(floor(
                     (1.0 - CAST(k AS DOUBLE) / ({L} + 1.0)) * gam
                     + 0.5) AS BIGINT)) FROM c WHERE k > 0)
                    AS DOUBLE) AS nw_lrv,
           sqrt(((SELECT gam FROM c WHERE k = 0)
                 + 2.0 * CAST((SELECT sum(CAST(floor(
                     (1.0 - CAST(k AS DOUBLE) / ({L} + 1.0)) * gam
                     + 0.5) AS BIGINT)) FROM c WHERE k > 0)
                    AS DOUBLE))
                / CAST((SELECT n FROM m) AS DOUBLE)) AS nw_se
    FROM m""".format(L=_NW_LAGS))
def newey_west(sf_dir: str):
    """NEWEY-WEST (HAC) standard error of the daily-revenue mean
    with Bartlett weights over {L} lags: autocovariances gamma_k
    from EXACT integer lagged cross-products (demeaned via the
    n*sxy-style expansion — no per-term float), weighted
    1 - k/(L+1), quantized to whole units half-up, and folded as
    exact integers into the long-run variance — the
    serially-correlated-data correction without which every
    time-series mean's naive SE (hash_replicate_se's iid answer) is
    overconfident when runs_test / daily_acf show dependence. The
    {L}+1 weighted terms combine in ONE fixed-order expression on
    both engines (DuckDB's sum over the tiny ordered lag table and
    numpy's dot over the same k-order). Scale plan: per-batch
    (day, cents) partials through the bounded day-domain combine;
    lagged products are O(L x days) on the driver."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]
    n = len(v)
    s = sum(v)
    mu = np.float64(s) / np.float64(n)
    gams = []
    for k in range(_NW_LAGS + 1):
        npk = n - k
        sxy = sum(v[i] * v[i + k] for i in range(npk))
        gams.append((np.float64(sxy)
                     - np.float64(npk) * mu * mu) / np.float64(n))
    lw = sum(int(np.floor(
        (1.0 - np.float64(k) / (_NW_LAGS + 1.0)) * gams[k] + 0.5))
        for k in range(1, _NW_LAGS + 1))
    lrv = gams[0] + 2.0 * np.float64(lw)
    return pd.DataFrame({
        "n_days": [np.int64(n)], "gamma0": [np.float64(gams[0])],
        "nw_lrv": [np.float64(lrv)],
        "nw_se": [np.sqrt(lrv / np.float64(n))]})
