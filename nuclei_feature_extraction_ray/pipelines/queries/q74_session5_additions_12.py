# round-5 session-5 additions, batch 12: two-regressor OLS via exact
# Cramer determinants, the Qn robust scale estimator as an exact
# pairwise-difference order statistic, and restricted mean survival
# time on the Kaplan-Meier curve.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from .q34_session2_additions_7 import _KM_CENSOR_DAYS, _micro_ln

_QN_C = 2.2219         # Qn consistency constant for the normal
_RMST_TAU = 365


@register("multi_ols", sql="""
    WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS y,
                      CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                        AS x1,
                      CAST(floor(l_tax * 100 + 0.5) AS BIGINT)
                        AS x2
               FROM lineitem),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x1) AS HUGEINT) AS s1,
                 CAST(sum(x2) AS HUGEINT) AS s2,
                 CAST(sum(x1 * x1) AS HUGEINT) AS s11,
                 CAST(sum(x2 * x2) AS HUGEINT) AS s22,
                 CAST(sum(x1 * x2) AS HUGEINT) AS s12,
                 CAST(sum(x1 * y) AS HUGEINT) AS s1y,
                 CAST(sum(x2 * y) AS HUGEINT) AS s2y
          FROM r),
    c AS (SELECT n, sy, s1, s2,
                 n * s11 - s1 * s1 AS a11,
                 n * s22 - s2 * s2 AS a22,
                 n * s12 - s1 * s2 AS a12,
                 n * s1y - s1 * sy AS b1,
                 n * s2y - s2 * sy AS b2
          FROM m),
    b AS (SELECT n, sy, s1, s2,
                 CAST(b1 * a22 - b2 * a12 AS DOUBLE)
                 / CAST(a11 * a22 - a12 * a12 AS DOUBLE) AS beta1,
                 CAST(b2 * a11 - b1 * a12 AS DOUBLE)
                 / CAST(a11 * a22 - a12 * a12 AS DOUBLE) AS beta2
          FROM c)
    SELECT CAST(n AS BIGINT) AS n_rows, beta1, beta2,
           (CAST(sy AS DOUBLE)
            - beta1 * CAST(s1 AS DOUBLE)
            - beta2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE)
             AS intercept
    FROM b""")
def multi_ols(sf_dir: str):
    """TWO-REGRESSOR OLS by exact Cramer's rule: quantity regressed
    on discount and tax (both quantized to integer percent points),
    solving the 2x2 normal equations with EXACT INTEGER centered
    moments and determinants (HUGEINT / python int — the
    embedding_covariance fold policy) so each coefficient is ONE
    shared float division of two exact integers — the multiple-
    regression upgrade of the single-feature ols/feature_corr
    family, with zero float accumulation anywhere. Scale plan:
    9-cell moment partials per batch (python-int second moments),
    map-only, O(blocks) driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_discount",
                                  "l_tax"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_quantity"].to_numpy(np.int64).astype(object)
        x1 = np.floor(b["l_discount"].to_numpy(np.float64) * 100
                      + 0.5).astype(np.int64).astype(object)
        x2 = np.floor(b["l_tax"].to_numpy(np.float64) * 100
                      + 0.5).astype(np.int64).astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sy": [int(y.sum())], "s1": [int(x1.sum())],
            "s2": [int(x2.sum())],
            "s11": [int((x1 * x1).sum())],
            "s22": [int((x2 * x2).sum())],
            "s12": [int((x1 * x2).sum())],
            "s1y": [int((x1 * y).sum())],
            "s2y": [int((x2 * y).sum())]})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "sy", "s1", "s2", "s11", "s22", "s12",
                "s1y", "s2y"], exact_int=True)
    n = int(s["n"].iloc[0])
    sy, s1, s2 = (int(s[c].iloc[0]) for c in ("sy", "s1", "s2"))
    s11, s22, s12 = (int(s[c].iloc[0])
                     for c in ("s11", "s22", "s12"))
    s1y, s2y = int(s["s1y"].iloc[0]), int(s["s2y"].iloc[0])
    a11 = n * s11 - s1 * s1
    a22 = n * s22 - s2 * s2
    a12 = n * s12 - s1 * s2
    b1 = n * s1y - s1 * sy
    b2 = n * s2y - s2 * sy
    det = a11 * a22 - a12 * a12
    beta1 = np.float64(b1 * a22 - b2 * a12) / np.float64(det)
    beta2 = np.float64(b2 * a11 - b1 * a12) / np.float64(det)
    icpt = (np.float64(sy) - beta1 * np.float64(s1)
            - beta2 * np.float64(s2)) / np.float64(n)
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "beta1": [np.float64(beta1)],
        "beta2": [np.float64(beta2)],
        "intercept": [np.float64(icpt)]})


@register("qn_scale", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    k AS (SELECT CAST(((SELECT n FROM m) // 2 + 1)
                      * ((SELECT n FROM m) // 2)
                      // 2 AS BIGINT) AS kk),
    p AS (SELECT abs(a.v - b.v) AS dv,
                 row_number() OVER (ORDER BY abs(a.v - b.v),
                                    a.day, b.day) AS i
          FROM d a JOIN d b ON a.day < b.day)
    SELECT (SELECT n FROM m) AS n_days,
           (SELECT kk FROM k) AS k_index,
           CAST((SELECT dv FROM p
                 WHERE i = (SELECT kk FROM k)) AS BIGINT)
             AS qn_raw_cents,
           {c} * CAST((SELECT dv FROM p
                       WHERE i = (SELECT kk FROM k)) AS DOUBLE)
             AS qn_scale_cents""".format(c=_QN_C))
def qn_scale(sf_dir: str):
    """Qn ROBUST SCALE (Rousseeuw-Croux) of daily revenue: the k-th
    smallest pairwise absolute difference with k = C(h,2),
    h = n//2 + 1, times the normal-consistency constant 2.2219 —
    the 50%-breakdown scale estimator that needs NO location and
    beats MAD's efficiency, completing the value_outliers /
    winsorized_stats robust family. The order statistic is an EXACT
    integer (tie order cannot change the k-th VALUE), so only the
    final constant multiplication is float. Scale plan: per-batch
    (day, cents) partials through the bounded day-domain combine;
    the O(days^2) pairwise scan runs on the driver — the day
    domain, not row count, bounds the quadratic."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True)
    v = np.array([int(x) for x in d["v"]], np.int64)
    n = len(v)
    h = n // 2 + 1
    k = h * (n // 2) // 2
    diffs = np.abs(v[:, None] - v[None, :])
    iu = np.triu_indices(n, 1)
    flat = np.sort(diffs[iu])
    raw = int(flat[k - 1])
    return pd.DataFrame({
        "n_days": [np.int64(n)], "k_index": [np.int64(k)],
        "qn_raw_cents": [np.int64(raw)],
        "qn_scale_cents": [_QN_C * np.float64(raw)]})


@register("rmst", sql="""
    WITH span AS (SELECT max(o_orderdate) AS mx FROM orders),
    c AS (SELECT o_custkey,
                 CAST(date_diff('day', min(o_orderdate),
                                max(o_orderdate)) AS BIGINT) AS dur,
                 CAST(CASE WHEN date_diff('day', max(o_orderdate),
                             (SELECT mx FROM span)) > {cd}
                      THEN 1 ELSE 0 END AS BIGINT) AS ev
          FROM orders GROUP BY 1),
    h AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
                 CAST(sum(ev) AS BIGINT) AS d
          FROM c GROUP BY 1),
    r AS (SELECT dur, d,
                 CAST(sum(n_all) OVER (ORDER BY dur DESC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS n_risk
          FROM h),
    t AS (SELECT dur, n_risk, d,
                 CASE WHEN d < n_risk THEN {term} ELSE 0 END
                   AS term,
                 CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS hit0
          FROM r WHERE d > 0),
    km AS (SELECT dur,
                  CAST(sum(term) OVER w AS BIGINT) AS cl,
                  CAST(max(hit0) OVER w AS BIGINT) AS z
           FROM t WINDOW w AS (ORDER BY dur
                               ROWS UNBOUNDED PRECEDING)),
    seg AS (SELECT dur, cl, z,
                   COALESCE(lead(dur) OVER (ORDER BY dur), {tau})
                     AS nxt
            FROM km WHERE dur < {tau}),
    first_t AS (SELECT COALESCE(least(min(dur), {tau}), {tau})
                  AS t1 FROM km),
    terms AS (SELECT CAST(sum(CASE WHEN z = 1 THEN 0 ELSE
                   CAST(floor(exp(CAST(cl AS DOUBLE) / 1000000.0)
                        * CAST(least(nxt, {tau}) - dur AS DOUBLE)
                        * 1000000.0 + 0.5) AS BIGINT) END)
                   AS BIGINT) AS s
             FROM seg),
    f AS (SELECT (SELECT t1 FROM first_t) * 1000000
                 + COALESCE((SELECT s FROM terms), 0) AS rm)
    SELECT CAST((SELECT count(*) FROM km) AS BIGINT)
             AS n_event_times,
           CAST({tau} AS BIGINT) AS horizon_days,
           CAST((SELECT rm FROM f) AS BIGINT) AS rmst_micro,
           CAST((SELECT rm FROM f) AS DOUBLE) / 1000000.0
             AS rmst_days""".format(
    cd=_KM_CENSOR_DAYS, tau=_RMST_TAU,
    term="""CASE WHEN CAST(n_risk - d AS DOUBLE)
                      / CAST(n_risk AS DOUBLE) >= 1.0
            THEN CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
                 / CAST(n_risk AS DOUBLE)) * 1000000.0 + 0.5)
                 AS BIGINT)
            ELSE -CAST(floor(-ln(CAST(n_risk - d AS DOUBLE)
                 / CAST(n_risk AS DOUBLE)) * 1000000.0 + 0.5)
                 AS BIGINT) END"""))
def rmst(sf_dir: str):
    """RESTRICTED MEAN SURVIVAL TIME to a 365-day horizon on the
    kaplan_meier curve (same lifetimes, censoring and exact
    micro-nat log-survival folds): the area under S(t) up to tau —
    'expected active days per customer in their first year', the
    clinically standard scalar summary a survival CURVE needs before
    it can drive a business decision. Each step's S*(interval width)
    term rebuilds S from the exact integer log fold (identical
    doubles on both engines), quantizes to micro units half-up, and
    folds as exact ints; steps after the curve hits zero contribute
    exactly 0. Scale plan: identical to kaplan_meier — duration-day
    histogram partials through one customer exchange, O(day-domain)
    driver scan."""
    from ...stages.partition import partition_map
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    mx_all = int(ds.map_batches(
        lambda b: pd.DataFrame({
            "mx": [b["o_orderdate"].to_numpy("datetime64[D]")
                   .astype(np.int64).max()]}),
        batch_format="pandas").to_pandas()["mx"].max())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        return pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "mn": d, "mx": d}).groupby(
            "cust", as_index=False).agg(mn=("mn", "min"),
                                        mx=("mx", "max"))

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("cust", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"))
        dur = (a["mx"] - a["mn"]).to_numpy(np.int64)
        ev = ((mx_all - a["mx"].to_numpy(np.int64))
              > _KM_CENSOR_DAYS).astype(np.int64)
        out = pd.DataFrame({"dur": dur,
                            "n_all": np.ones(len(a), np.int64),
                            "d": ev}) \
            .groupby("dur", as_index=False).sum()
        for c in ("n_all", "d"):
            out[c] = out[c].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["cust"], cells, 16),
        ["dur"], ["n_all", "d"]).sort_values("dur") \
        .reset_index(drop=True)
    n_all = h["n_all"].to_numpy(np.int64)
    dd = h["d"].to_numpy(np.int64)
    n_risk = np.cumsum(n_all[::-1])[::-1]
    msk = dd > 0
    t_ev = h["dur"].to_numpy(np.int64)[msk]
    nr = n_risk[msk]
    de = dd[msk]
    ok = de < nr
    terms = np.zeros(len(t_ev), np.int64)
    terms[ok] = _micro_ln((nr[ok] - de[ok]).astype(np.float64)
                          / nr[ok].astype(np.float64))
    cl = np.cumsum(terms)
    z = np.cumsum((de >= nr).astype(np.int64)) > 0
    tau = _RMST_TAU
    t1 = int(min(t_ev[0], tau)) if len(t_ev) else tau
    rm = t1 * 1000000
    for i in range(len(t_ev)):
        if t_ev[i] >= tau or z[i]:
            continue
        nxt = int(t_ev[i + 1]) if i + 1 < len(t_ev) else tau
        width = min(nxt, tau) - int(t_ev[i])
        rm += int(np.floor(
            np.exp(np.float64(int(cl[i])) / 1000000.0)
            * np.float64(width) * 1000000.0 + 0.5))
    return pd.DataFrame({
        "n_event_times": [np.int64(len(t_ev))],
        "horizon_days": [np.int64(tau)],
        "rmst_micro": [np.int64(rm)],
        "rmst_days": [np.float64(rm) / 1000000.0]})
