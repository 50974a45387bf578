# round-5 session-5 additions, batch 10: Tukey HSD post-hoc pairwise
# comparisons after the weekday ANOVA, split-conformal prediction
# intervals for daily revenue, and the sample-ratio-mismatch guard
# over hash-assigned experiment arms.
from __future__ import annotations

from ...functions.hashing import md5_id64_flat
from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_TUKEY_Q = 4.17        # studentized range q(0.05, k=7, df=inf)
_CONF_ALPHA = 0.9      # split-conformal target coverage


@register("tukey_hsd", sql="""
    WITH o AS (SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow,
                      CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS x
               FROM orders),
    g AS (SELECT dow, CAST(count(*) AS BIGINT) AS ng,
                 CAST(sum(x) AS BIGINT) AS sg,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS qg
          FROM o GROUP BY dow),
    w AS (SELECT dow, ng, sg,
                 CAST(floor(CAST(qg AS DOUBLE)
                            - CAST(sg AS DOUBLE)
                              * CAST(sg AS DOUBLE)
                              / CAST(ng AS DOUBLE) + 0.5)
                      AS HUGEINT) AS den_unit
          FROM g),
    t AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(den_unit) AS HUGEINT) AS sse FROM w),
    mse AS (SELECT CAST((SELECT sse FROM t) AS DOUBLE)
                   / CAST((SELECT n FROM t) - (SELECT k FROM t)
                          AS DOUBLE) AS v),
    p AS (SELECT a.dow AS dow_i, b.dow AS dow_j,
                 a.ng AS ni, b.ng AS nj,
                 CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
                   AS mean_i,
                 CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE)
                   AS mean_j,
                 sqrt((SELECT v FROM mse) / 2.0
                      * (1.0 / CAST(a.ng AS DOUBLE)
                         + 1.0 / CAST(b.ng AS DOUBLE))) AS se
          FROM w a JOIN w b ON a.dow < b.dow)
    SELECT dow_i, dow_j, ni AS n_i, nj AS n_j, mean_i, mean_j,
           mean_i - mean_j AS diff, se,
           CAST(CASE WHEN abs(mean_i - mean_j) > {q} * se
                     THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM p ORDER BY dow_i, dow_j""".format(q=_TUKEY_Q))
def tukey_hsd(sf_dir: str):
    """TUKEY HSD post-hoc pairwise comparisons after the weekday
    ANOVA: all 21 weekday-pair mean differences with the studentized-
    range honest significance test (q = 4.17 at k=7, df=inf —
    documented constant), answering WHICH days differ once dow_anova
    says SOME do — the multiple-comparison follow-up operator beside
    benjamini_hochberg's FDR. Group moments fold as exact ints
    (HUGEINT / python-int second moment), per-group SSE quantizes
    half-up before the pooled fold, and every mean / SE / flag is
    the SAME float expression on both engines. Scale plan: 7-cell
    moment partials, map-only; the 21-pair scan is driver-side."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        dow = b["o_orderdate"].dt.dayofweek.to_numpy(np.int64) + 1
        x = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        rows = []
        for d in np.unique(dow):
            m = dow == d
            xs = x[m].astype(object)
            rows.append({"dow": int(d), "ng": int(m.sum()),
                         "sg": int(xs.sum()),
                         "qg": int((xs * xs).sum())})
        return pd.DataFrame(rows)

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["dow"], ["ng", "sg", "qg"],
        exact_int=True).sort_values("dow").reset_index(drop=True)
    den = []
    for _, r in g.iterrows():
        ngf, sgf = np.float64(int(r["ng"])), np.float64(int(r["sg"]))
        qgf = np.float64(int(r["qg"]))
        den.append(int(np.floor(qgf - sgf * sgf / ngf + 0.5)))
    n = sum(int(x) for x in g["ng"])
    k = len(g)
    mse = np.float64(sum(den)) / np.float64(n - k)
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            ni, nj = int(g["ng"].iloc[i]), int(g["ng"].iloc[j])
            mi = np.float64(int(g["sg"].iloc[i])) / np.float64(ni)
            mj = np.float64(int(g["sg"].iloc[j])) / np.float64(nj)
            se = np.sqrt(mse / 2.0 * (1.0 / np.float64(ni)
                                      + 1.0 / np.float64(nj)))
            rows.append({
                "dow_i": np.int64(int(g["dow"].iloc[i])),
                "dow_j": np.int64(int(g["dow"].iloc[j])),
                "n_i": np.int64(ni), "n_j": np.int64(nj),
                "mean_i": mi, "mean_j": mj, "diff": mi - mj,
                "se": se,
                "significant": np.int64(
                    1 if np.abs(mi - mj) > _TUKEY_Q * se else 0)})
    return pd.DataFrame(rows)


@register("conformal_interval", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    cal AS (SELECT day, v FROM d WHERE day % 2 = 0),
    tst AS (SELECT day, v FROM d WHERE day % 2 = 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS nc,
                 CAST(sum(v) AS HUGEINT) AS sc FROM cal),
    r AS (SELECT CAST(floor(CAST(abs(CAST(v AS HUGEINT)
                                     * (SELECT nc FROM m)
                                     - (SELECT sc FROM m))
                                 AS DOUBLE)
                            / CAST((SELECT nc FROM m) AS DOUBLE)
                            + 0.5) AS BIGINT) AS resid
          FROM cal),
    rk AS (SELECT resid, row_number() OVER (ORDER BY resid) AS i
           FROM r),
    q AS (SELECT resid AS qr FROM rk
          WHERE i = CAST(ceil({a} * ((SELECT nc FROM m) + 1))
                         AS BIGINT)),
    cov AS (SELECT CAST(count(*) AS BIGINT) AS nt,
                   CAST(sum(CASE WHEN CAST(floor(
                        CAST(abs(CAST(v AS HUGEINT)
                                 * (SELECT nc FROM m)
                                 - (SELECT sc FROM m)) AS DOUBLE)
                        / CAST((SELECT nc FROM m) AS DOUBLE) + 0.5)
                        AS BIGINT) <= (SELECT qr FROM q)
                        THEN 1 ELSE 0 END) AS BIGINT) AS hit
            FROM tst)
    SELECT (SELECT nc FROM m) AS n_cal,
           (SELECT nt FROM cov) AS n_test,
           (SELECT qr FROM q) AS q_resid_cents,
           (SELECT hit FROM cov) AS n_covered,
           CAST((SELECT hit FROM cov) AS DOUBLE)
             / CAST((SELECT nt FROM cov) AS DOUBLE)
             AS coverage_rate""".format(a=_CONF_ALPHA))
def conformal_interval(sf_dir: str):
    """SPLIT-CONFORMAL PREDICTION INTERVAL for daily revenue: even
    epoch-days calibrate (point prediction = calibration mean;
    nonconformity = |v - mean| as the exact rational |v*n - S|/n
    quantized to whole cents), the ceil(0.9*(n+1))-th smallest
    residual is the EXACT integer conformal quantile, and coverage
    on the held-out odd days is an exact integer comparison — the
    distribution-free uncertainty-quantification operator with
    finite-sample guarantees that modern forecast pipelines bolt
    onto any point model. Zero float boundaries anywhere in the
    quantile or the coverage count. Scale plan: per-batch
    (day, cents) partials through the bounded day-domain combine;
    ranking and coverage are O(days) on the driver."""
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
    days = d["day"].map(int)
    vals = d["v"].map(int)
    cal = [(dy, v) for dy, v in zip(days, vals) if dy % 2 == 0]
    tst = [(dy, v) for dy, v in zip(days, vals) if dy % 2 == 1]
    nc = len(cal)
    sc = sum(v for _, v in cal)

    def resid(v: int) -> int:
        return int(np.floor(
            np.float64(abs(v * nc - sc)) / np.float64(nc) + 0.5))

    rs = sorted(resid(v) for _, v in cal)
    k = int(np.ceil(_CONF_ALPHA * (nc + 1)))
    qr = rs[k - 1]
    nt = len(tst)
    hit = sum(1 for _, v in tst if resid(v) <= qr)
    return pd.DataFrame({
        "n_cal": [np.int64(nc)], "n_test": [np.int64(nt)],
        "q_resid_cents": [np.int64(qr)],
        "n_covered": [np.int64(hit)],
        "coverage_rate": [np.float64(hit) / np.float64(nt)]})


@register("srm_check", sql="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    a AS (SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                       || ':arm'), 1, 16))::UBIGINT % 2 AS BIGINT)
                   AS arm
          FROM u),
    c AS (SELECT CAST(sum(1 - arm) AS BIGINT) AS n0,
                 CAST(sum(arm) AS BIGINT) AS n1 FROM a)
    SELECT n0 AS n_control, n1 AS n_treatment,
           (CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
           * (CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
           / CAST(n0 + n1 AS DOUBLE) AS srm_chi2,
           CAST(CASE WHEN (CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))
                          * (CAST(n0 AS DOUBLE)
                             - CAST(n1 AS DOUBLE))
                          / CAST(n0 + n1 AS DOUBLE) > 10.828
                     THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
    FROM c""")
def srm_check(sf_dir: str):
    """SAMPLE-RATIO-MISMATCH guard for a hash-randomized experiment:
    users assign to arms by a deterministic md5 coin (the
    randomized_response seeding policy), and the 1-df chi-square
    against the intended 50/50 split flags broken randomization at
    the p < 0.001 threshold (10.828) BEFORE anyone reads the metric
    movement — the trust gate every experimentation platform runs
    first. Counts are exact integer folds over the deduplicated user
    set; the statistic and flag are shared float expressions. Scale
    plan: per-batch distinct users ride ONE user-keyed exchange
    whose partitions emit 2-cell arm counts; the chi-square is
    driver-side arithmetic."""
    ds = _events(sf_dir, ["user_id"])

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": np.unique(b["user_id"].to_numpy(np.int64))})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["user_id"].to_numpy(np.int64))
        arm = (md5_id64_flat(ids, ":arm")[0] % 2).astype(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n0": np.array([int((arm == 0).sum())], np.int64),
            "n1": np.array([int((arm == 1).sum())], np.int64)})

    s = _combine_partials(
        partition_map(ds.map_batches(pre, batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["j"], ["n0", "n1"])
    n0, n1 = int(s["n0"].iloc[0]), int(s["n1"].iloc[0])
    diff = np.float64(n0) - np.float64(n1)
    chi2 = diff * diff / np.float64(n0 + n1)
    return pd.DataFrame({
        "n_control": [np.int64(n0)], "n_treatment": [np.int64(n1)],
        "srm_chi2": [np.float64(chi2)],
        "srm_flag": [np.int64(1 if chi2 > 10.828 else 0)]})
