# round-5 session-5 additions, batch 71: Krippendorff's nominal
# alpha over three deterministic raters, octile-based robust shape
# (Bowley skew / Moors kurtosis), and the prefix-min CUSUM peak.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)

_KA_CH = 300
_KA_TK = 55


@register("krippendorff_alpha", sql="""
    WITH lab AS (SELECT lang AS r1,
        CASE WHEN n_chars >= {ch} THEN lang ELSE 'xx' END AS r2,
        CASE WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+')) END AS BIGINT) >= {tk}
             THEN lang ELSE 'xx' END AS r3
        FROM documents),
    u AS (SELECT r1, r2, r3,
                 CAST(CASE WHEN r1 = r2 THEN 1 ELSE 0 END
                      + CASE WHEN r1 = r3 THEN 1 ELSE 0 END
                      + CASE WHEN r2 = r3 THEN 1 ELSE 0 END
                      AS BIGINT) AS agree_pairs
          FROM lab),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
                 CAST(sum(6 - 2 * agree_pairs) AS HUGEINT)
                   AS dis_pairs
          FROM u),
    v AS (SELECT val, CAST(count(*) AS BIGINT) AS nc
          FROM (SELECT r1 AS val FROM lab
                UNION ALL SELECT r2 FROM lab
                UNION ALL SELECT r3 FROM lab)
          GROUP BY val),
    m AS (SELECT CAST(sum(nc) AS HUGEINT) AS n,
                 CAST(sum(CAST(nc AS HUGEINT) * nc) AS HUGEINT)
                   AS sn2
          FROM v)
    SELECT CAST((SELECT n_units FROM a) AS BIGINT) AS n_units,
           CAST((SELECT count(*) FROM v) AS BIGINT)
             AS n_categories,
           1.0 - (CAST((SELECT n FROM m) AS DOUBLE) - 1.0)
                 * CAST((SELECT dis_pairs FROM a) AS DOUBLE)
                 / (2.0 * (CAST((SELECT n FROM m) AS DOUBLE)
                           * CAST((SELECT n FROM m) AS DOUBLE)
                           - CAST((SELECT sn2 FROM m) AS DOUBLE)))
             AS krippendorff_alpha""".format(ch=_KA_CH, tk=_KA_TK))
def krippendorff_alpha(sf_dir: str):
    """KRIPPENDORFF'S ALPHA (nominal) over three deterministic
    document raters — rater 1 reads the lang tag, raters 2 and 3
    demote short / token-poor documents to the reject label 'xx' —
    alpha = 1 - (n-1) * sum_u disagreeing-pairs / (n^2 - sum_c
    n_c^2): the coincidence-matrix reliability coefficient that,
    unlike fleiss_kappa's category-share expectation, is exact
    for small samples and extends to any metric (dawid_skene_lite
    estimates rater QUALITY; alpha certifies the PANEL). With a
    constant 3 raters per unit, observed disagreement folds as
    the exact integer 6 - 2*agreements per unit; marginals and
    their squares fold exactly; alpha is one shared float
    expression. Scale plan: map-only label pass into one 2-cell
    + per-category combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "n_chars", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lang = b["lang"].to_numpy(object)
        nch = b["n_chars"].to_numpy(np.int64)
        txt = b["text"].to_numpy(object)
        ntok = np.array([len(t.split()) for t in txt], np.int64)
        r1 = lang
        r2 = np.where(nch >= _KA_CH, lang, "xx")
        r3 = np.where(ntok >= _KA_TK, lang, "xx")
        agree = ((r1 == r2).astype(np.int64)
                 + (r1 == r3).astype(np.int64)
                 + (r2 == r3).astype(np.int64))
        units = pd.DataFrame({
            "kind": ["u"], "val": [""],
            "n_units": np.array([len(b)], np.int64),
            "dis": np.array([int((6 - 2 * agree).sum())],
                            np.int64),
            "nc": np.zeros(1, np.int64)})
        vals = pd.DataFrame({
            "val": np.concatenate([r1, r2, r3]).astype(object),
            "nc": np.ones(3 * len(b), np.int64)}) \
            .groupby("val", as_index=False).sum()
        vals["nc"] = vals["nc"].astype(np.int64)
        vals["kind"] = "v"
        vals["n_units"] = np.int64(0)
        vals["dis"] = np.int64(0)
        return pd.concat(
            [units, vals[["kind", "val", "n_units", "dis",
                          "nc"]]], ignore_index=True)

    raw = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["kind", "val"], ["n_units", "dis", "nc"])
    u = raw[raw["kind"] == "u"]
    v = raw[raw["kind"] == "v"]
    n_units = int(u["n_units"].sum())
    dis = int(u["dis"].sum())
    nc = [int(x) for x in v["nc"]]
    n = sum(nc)
    sn2 = sum(x * x for x in nc)
    alpha = 1.0 - (np.float64(n) - 1.0) * np.float64(dis) \
        / (2.0 * (np.float64(n) * np.float64(n)
                  - np.float64(sn2)))
    return pd.DataFrame({
        "n_units": [np.int64(n_units)],
        "n_categories": [np.int64(len(nc))],
        "krippendorff_alpha": [np.float64(alpha)]})


@register("robust_shape", sql="""
    WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS v
               FROM orders),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
    r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM o),
    e AS (SELECT
        max(CASE WHEN rk = ((SELECT n FROM t) * 1 + 7) // 8
            THEN v END) AS e1,
        max(CASE WHEN rk = ((SELECT n FROM t) * 2 + 7) // 8
            THEN v END) AS e2,
        max(CASE WHEN rk = ((SELECT n FROM t) * 3 + 7) // 8
            THEN v END) AS e3,
        max(CASE WHEN rk = ((SELECT n FROM t) * 4 + 7) // 8
            THEN v END) AS e4,
        max(CASE WHEN rk = ((SELECT n FROM t) * 5 + 7) // 8
            THEN v END) AS e5,
        max(CASE WHEN rk = ((SELECT n FROM t) * 6 + 7) // 8
            THEN v END) AS e6,
        max(CASE WHEN rk = ((SELECT n FROM t) * 7 + 7) // 8
            THEN v END) AS e7
        FROM r)
    SELECT (SELECT n FROM t) AS n_orders,
           CAST(e2 AS BIGINT) AS q1_cents,
           CAST(e4 AS BIGINT) AS median_cents,
           CAST(e6 AS BIGINT) AS q3_cents,
           (CAST(e6 AS DOUBLE) + CAST(e2 AS DOUBLE)
            - 2.0 * CAST(e4 AS DOUBLE))
           / (CAST(e6 AS DOUBLE) - CAST(e2 AS DOUBLE))
             AS bowley_skew,
           ((CAST(e7 AS DOUBLE) - CAST(e5 AS DOUBLE))
            + (CAST(e3 AS DOUBLE) - CAST(e1 AS DOUBLE)))
           / (CAST(e6 AS DOUBLE) - CAST(e2 AS DOUBLE))
             AS moors_kurtosis
    FROM e""")
def robust_shape(sf_dir: str):
    """ROBUST DISTRIBUTION SHAPE of order totals from the seven
    octiles (type-1 order statistics at exact ranks
    ceil(n*i/8)): Bowley quartile skewness (Q3 + Q1 - 2*median) /
    IQR and Moors octile kurtosis ((E7-E5)+(E3-E1))/IQR — the
    outlier-immune skew/kurtosis pair (jarque_bera's moment-based
    versions explode on one fat order; these cannot), calibrated
    at 0 and ~1.23 for the normal. Every octile is an exact
    integer cent value selected by an exact integer rank; the two
    shape statistics are shared float expressions. Scale plan:
    cent-value histogram combine (guarded); rank selection is the
    two-phase rank exchange at fleet scale, here a cumulative
    walk."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"v": cents,
                          "c": np.ones(len(b), np.int64)}) \
            .groupby("v", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["v"], ["c"]).sort_values("v").reset_index(drop=True)
    vals = h["v"].to_numpy(np.int64)
    cum = np.cumsum(h["c"].to_numpy(np.int64))
    n = int(cum[-1])
    e = {}
    for i in range(1, 8):
        rk = (n * i + 7) // 8
        e[i] = int(vals[int(np.searchsorted(cum, rk))])
    bow = (np.float64(e[6]) + np.float64(e[2])
           - 2.0 * np.float64(e[4])) \
        / (np.float64(e[6]) - np.float64(e[2]))
    moors = ((np.float64(e[7]) - np.float64(e[5]))
             + (np.float64(e[3]) - np.float64(e[1]))) \
        / (np.float64(e[6]) - np.float64(e[2]))
    return pd.DataFrame({
        "n_orders": [np.int64(n)],
        "q1_cents": [np.int64(e[2])],
        "median_cents": [np.int64(e[4])],
        "q3_cents": [np.int64(e[6])],
        "bowley_skew": [np.float64(bow)],
        "moors_kurtosis": [np.float64(moors)]})


@register("cusum_peak", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM d),
    x AS (SELECT day,
                 CAST((SELECT n FROM t) AS HUGEINT) * v
                 - (SELECT s FROM t) AS dev
          FROM d),
    p AS (SELECT day,
                 CAST(sum(dev) OVER (ORDER BY day) AS HUGEINT)
                   AS pre
          FROM x),
    c AS (SELECT day,
                 pre - least(CAST(0 AS HUGEINT),
                             min(pre) OVER (ORDER BY day))
                   AS cus
          FROM p),
    w AS (SELECT day, cus FROM c ORDER BY cus DESC, day LIMIT 1)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_days,
           (SELECT day FROM w) AS peak_day,
           CAST((SELECT cus FROM w) AS DOUBLE)
           / CAST((SELECT s FROM t) AS DOUBLE) AS max_cusum_rel""")
def cusum_peak(sf_dir: str):
    """CUSUM PEAK on daily revenue via the prefix-minimum
    identity: the running one-sided CUSUM against the global mean,
    S_t = max(0, S_{t-1} + (x_t - mean)), equals P_t - min(0,
    min_{j<=t} P_j) for prefix sums P of the deviations — turning
    an apparently serial recursion into two window scans (the same
    de-recursion trick double_changepoint uses for split scoring).
    Deviations are scaled by n (dev = n*x - S) so everything is
    EXACT integer; the argmax day is an exact comparison with
    earliest-day tie-break; the peak is reported relative to total
    revenue as one shared float division. Scale plan: bounded
    day-domain combine; the prefix walk is O(days) driver work."""
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
        ["day"], ["v"], exact_int=True).sort_values("day")
    days = [int(x) for x in d["day"]]
    v = [int(x) for x in d["v"]]
    n = len(v)
    s = sum(v)
    pre = 0
    mn = 0
    best = None
    for day, x in zip(days, v):
        pre += n * x - s
        mn = min(mn, pre)
        cus = pre - min(0, mn)
        if best is None or cus > best[1]:
            best = (day, cus)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "peak_day": [np.int64(best[0])],
        "max_cusum_rel": [np.float64(best[1])
                          / np.float64(s)]})
