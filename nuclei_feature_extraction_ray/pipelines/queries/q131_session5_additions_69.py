# round-5 session-5 additions, batch 69: Taylor's variance-mean
# power law across parts, the daily-revenue semivariogram at three
# lags, and the cohort retention half-life fit.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply

_RH_MAXK = 14


@register("taylors_law", sql="""
    WITH p AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CAST(l_quantity AS BIGINT))
                           AS BIGINT) AS s,
                      CAST(sum(CAST(l_quantity AS BIGINT)
                               * CAST(l_quantity AS BIGINT))
                           AS BIGINT) AS s2
               FROM lineitem GROUP BY 1),
    v AS (SELECT CAST(floor(ln(CAST(s AS DOUBLE)
                               / CAST(n AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS lx,
                 CAST(floor(ln(CAST(n * s2 - s * s AS DOUBLE)
                               / CAST(n * (n - 1) AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS ly
          FROM p WHERE n >= 2 AND n * s2 - s * s > 0),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                 CAST(sum(lx) AS HUGEINT) AS sx,
                 CAST(sum(ly) AS HUGEINT) AS sy,
                 CAST(sum(CAST(lx AS HUGEINT) * ly) AS HUGEINT)
                   AS sxy,
                 CAST(sum(CAST(lx AS HUGEINT) * lx) AS HUGEINT)
                   AS sxx
          FROM v)
    SELECT CAST(k AS BIGINT) AS n_parts,
           (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS taylor_slope,
           CAST(sy AS DOUBLE) / CAST(k AS DOUBLE)
           - ((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * (CAST(sx AS DOUBLE) / CAST(k AS DOUBLE))
             AS taylor_intercept
    FROM m""")
def taylors_law(sf_dir: str):
    """TAYLOR'S POWER LAW across parts: the slope of ln(variance)
    on ln(mean) of per-part order quantities — the
    variance-mean scaling exponent from ecology (slope 1 =
    Poisson-like demand, 2 = proportional/clustered) that tells
    demand planners whether safety stock should scale with sqrt
    of volume or linearly (the missing global companion to
    safety_stock_params' per-part view). Per-part moments fold
    exactly; each part's ln(mean) and ln(sample variance) are
    shared float expressions on exact integer ratios, quantized
    to micro ints BEFORE the cross-part OLS, which is then exact
    big-int arithmetic with two final shared float expressions.
    Scale plan: part-keyed combine (bounded domain); the OLS
    moments are a second 5-cell combine at fleet scale."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = b["l_quantity"].to_numpy(np.float64).astype(np.int64)
        g = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64),
            "s": q, "s2": q * q}) \
            .groupby("l_partkey", as_index=False).sum()
        for c in ("n", "s", "s2"):
            g[c] = g[c].astype(np.int64)
        return g

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], ["n", "s", "s2"], exact_int=True)
    k = sx = sy = sxy = sxx = 0
    for _, r in p.iterrows():
        n, s, s2 = int(r["n"]), int(r["s"]), int(r["s2"])
        num = n * s2 - s * s
        if n < 2 or num <= 0:
            continue
        lx = int(np.floor(np.log(np.float64(s) / np.float64(n))
                          * 1000000.0 + 0.5))
        ly = int(np.floor(np.log(np.float64(num)
                                 / np.float64(n * (n - 1)))
                          * 1000000.0 + 0.5))
        k += 1
        sx += lx
        sy += ly
        sxy += lx * ly
        sxx += lx * lx
    slope = (np.float64(k) * np.float64(sxy)
             - np.float64(sx) * np.float64(sy)) \
        / (np.float64(k) * np.float64(sxx)
           - np.float64(sx) * np.float64(sx))
    icept = np.float64(sy) / np.float64(k) \
        - slope * (np.float64(sx) / np.float64(k))
    return pd.DataFrame({
        "n_parts": [np.int64(k)],
        "taylor_slope": [np.float64(slope)],
        "taylor_intercept": [np.float64(icept)]})


@register("variogram_lags", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    g AS (SELECT CAST(l.h AS BIGINT) AS lag,
                 CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(CAST(b.v - a.v AS HUGEINT)
                          * (b.v - a.v)) AS HUGEINT) AS ss
          FROM (VALUES (1), (7), (14)) l(h)
          JOIN d a ON TRUE
          JOIN d b ON b.day = a.day + l.h
          GROUP BY 1)
    SELECT lag, n_pairs,
           CAST(ss AS DOUBLE) / (2.0 * CAST(n_pairs AS DOUBLE))
             AS semivariance
    FROM g ORDER BY lag""")
def variogram_lags(sf_dir: str):
    """SEMIVARIOGRAM of daily revenue at lags 1, 7 and 14 days:
    gamma(h) = sum (v_{t+h} - v_t)^2 / (2 N_h) over all day pairs
    h apart — the geostatistics view of temporal structure (a
    gamma(7) well below gamma(1) exposes weekly periodicity as a
    RANGE effect, complementary to ljung_box's correlation test
    and variance_ratio's random-walk scaling). Squared cent
    differences fold as exact big ints per lag; one division per
    row. Scale plan: bounded day-domain combine; the three lagged
    scans are O(days) driver work."""
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
        ["day"], ["v"], exact_int=True)
    vm = {int(r["day"]): int(r["v"]) for _, r in d.iterrows()}
    rows = []
    for h in (1, 7, 14):
        ss = 0
        n = 0
        for day, v in vm.items():
            w = vm.get(day + h)
            if w is not None:
                n += 1
                ss += (w - v) * (w - v)
        rows.append((h, n,
                     np.float64(ss) / (2.0 * np.float64(n))))
    return pd.DataFrame({
        "lag": np.array([r[0] for r in rows], np.int64),
        "n_pairs": np.array([r[1] for r in rows], np.int64),
        "semivariance": np.array([r[2] for r in rows],
                                 np.float64)})


@register("retention_halflife", sql="""
    WITH u AS (SELECT DISTINCT user_id,
                      CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day
               FROM events),
    b AS (SELECT max(day) AS mx FROM u),
    f AS (SELECT user_id, min(day) AS fd FROM u GROUP BY 1),
    ks AS (SELECT CAST(kk AS BIGINT) AS kk
           FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10),
                        (11),(12),(13),(14)) t(kk)),
    cell AS (SELECT ks.kk, CAST(count(*) AS BIGINT) AS elig,
                    CAST(count(u.user_id) AS BIGINT) AS act
             FROM f CROSS JOIN ks
             LEFT JOIN u ON u.user_id = f.user_id
                        AND u.day = f.fd + ks.kk
             WHERE f.fd + ks.kk <= (SELECT mx FROM b)
             GROUP BY ks.kk),
    v AS (SELECT kk,
                 CAST(floor(ln(CAST(act AS DOUBLE)
                               / CAST(elig AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS ly
          FROM cell WHERE act > 0),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                 CAST(sum(kk) AS HUGEINT) AS sx,
                 CAST(sum(ly) AS HUGEINT) AS sy,
                 CAST(sum(CAST(kk AS HUGEINT) * ly) AS HUGEINT)
                   AS sxy,
                 CAST(sum(CAST(kk AS HUGEINT) * kk) AS HUGEINT)
                   AS sxx
          FROM v),
    s AS (SELECT CAST(k AS BIGINT) AS n_points,
                 (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / 1000000.0 AS slope
          FROM m)
    SELECT n_points, slope AS decay_slope,
           CASE WHEN slope < 0 THEN ln(2.0) / (-slope)
                ELSE NULL END AS half_life_days
    FROM s""")
def retention_halflife(sf_dir: str):
    """RETENTION HALF-LIFE: day-k return rates (share of users
    active EXACTLY k days after their first day, k = 1..14,
    restricted to users observable at offset k) fit to an
    exponential decay by regressing ln(r_k) on k; half-life =
    ln2 / (-slope) — the single number product teams quote from
    retention_cohorts' full matrix. Eligibility and activity
    counts are exact integers; each ln rate is a shared float on
    an exact ratio, micro-quantized before the exact-integer OLS;
    slope and half-life are shared float expressions. Scale plan:
    one user-keyed exchange emits 14-cell partials (per-user day
    sets are partition-local); the k-domain combine is O(1)."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def bounds(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"mx": [int(day.max())]})

    mx = int(ds.map_batches(bounds, batch_format="pandas")
             .to_pandas()["mx"].max())

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        day = (g["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        uid = g["user_id"].to_numpy(np.int64)
        ud = pd.DataFrame({"u": uid, "d": day}) \
            .drop_duplicates()
        fd = ud.groupby("u")["d"].min()
        m = ud.merge(fd.rename("fd"), left_on="u",
                     right_index=True)
        off = (m["d"] - m["fd"]).to_numpy(np.int64)
        act = np.bincount(off[(off >= 1) & (off <= _RH_MAXK)],
                          minlength=_RH_MAXK + 1)[1:]
        cap = np.clip(mx - fd.to_numpy(np.int64), 0, _RH_MAXK)
        cnt = np.bincount(cap, minlength=_RH_MAXK + 1)
        elig = np.cumsum(cnt[::-1])[::-1]
        return pd.DataFrame({
            "kk": np.arange(1, _RH_MAXK + 1, dtype=np.int64),
            "elig": elig[1:].astype(np.int64),
            "act": act.astype(np.int64)})

    cell = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts"]),
        ["kk"], ["elig", "act"])
    k = sx = sy = sxy = sxx = 0
    for _, r in cell.iterrows():
        kk, elig, act = int(r["kk"]), int(r["elig"]), int(r["act"])
        if act <= 0:
            continue
        ly = int(np.floor(np.log(np.float64(act)
                                 / np.float64(elig))
                          * 1000000.0 + 0.5))
        k += 1
        sx += kk
        sy += ly
        sxy += kk * ly
        sxx += kk * kk
    slope = (np.float64(k) * np.float64(sxy)
             - np.float64(sx) * np.float64(sy)) \
        / (np.float64(k) * np.float64(sxx)
           - np.float64(sx) * np.float64(sx)) / 1000000.0
    hl = np.log(2.0) / (-slope) if slope < 0 else np.nan
    return pd.DataFrame({
        "n_points": [np.int64(k)],
        "decay_slope": [np.float64(slope)],
        "half_life_days": [np.float64(hl)]})
