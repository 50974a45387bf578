# round-5 session-5 additions, batch 40: the Fieller confidence
# interval for a ratio of means, a binomial dispersion test on
# daily conversions, and the customer purchase-regularity census.
from __future__ import annotations

from ...functions.hashing import md5_id64_flat
from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_FI_Z = 1.96


@register("fieller_ci", sql="""
    WITH r AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                           AS BIGINT) AS y,
                      CAST(l_quantity AS BIGINT) AS x
               FROM lineitem),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM r),
    c AS (SELECT CAST(n AS BIGINT) AS n,
                 CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                 CAST(n * syy - sy * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0)) AS vy,
                 CAST(n * sxx - sx * sx AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0)) AS vx,
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0)) AS vxy
          FROM m),
    f AS (SELECT n, my, mx, my / mx AS ratio,
                 mx * mx - {z} * {z} * vx AS a,
                 my * mx - {z} * {z} * vxy AS b,
                 my * my - {z} * {z} * vy AS g
          FROM c)
    SELECT n AS n_rows, ratio AS unit_value_ratio,
           (b - sqrt(b * b - a * g)) / a AS ci_lower,
           (b + sqrt(b * b - a * g)) / a AS ci_upper
    FROM f""".format(z=_FI_Z))
def fieller_ci(sf_dir: str):
    """FIELLER CONFIDENCE INTERVAL for the ratio of means (mean
    line revenue over mean quantity — the corpus unit value): the
    EXACT ratio-CI from the quadratic (mx^2 - z^2 vx) r^2 -
    2(mxmy - z^2 vxy) r + (my^2 - z^2 vy) <= 0, which stays valid
    when the denominator mean is noisy and the delta method
    (ratio_delta_se) breaks down. All variance/covariance-of-means
    terms come from exact integer moments; the three quadratic
    coefficients and both roots are shared float expressions.
    Scale plan: map-only 6-cell moment partials, O(blocks) driver
    combine."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_extendedprice",
                                  "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64).astype(object)
        x = b["l_quantity"].to_numpy(np.int64).astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sy": [int(y.sum())], "sx": [int(x.sum())],
            "syy": [int((y * y).sum())],
            "sxx": [int((x * x).sum())],
            "sxy": [int((x * y).sum())]})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "sy", "sx", "syy", "sxx", "sxy"],
        exact_int=True)
    n = int(s["n"].iloc[0])
    sy, sx = int(s["sy"].iloc[0]), int(s["sx"].iloc[0])
    syy, sxx = int(s["syy"].iloc[0]), int(s["sxx"].iloc[0])
    sxy = int(s["sxy"].iloc[0])
    fn_ = np.float64(n)
    my = np.float64(sy) / fn_
    mx = np.float64(sx) / fn_
    den = fn_ * fn_ * (fn_ - 1.0)
    vy = np.float64(n * syy - sy * sy) / den
    vx = np.float64(n * sxx - sx * sx) / den
    vxy = np.float64(n * sxy - sx * sy) / den
    z2 = _FI_Z * _FI_Z
    a = mx * mx - z2 * vx
    b = my * mx - z2 * vxy
    g = my * my - z2 * vy
    disc = np.sqrt(b * b - a * g)
    return pd.DataFrame({
        "n_rows": [np.int64(n)],
        "unit_value_ratio": [my / mx],
        "ci_lower": [(b - disc) / a],
        "ci_upper": [(b + disc) / a]})


@register("binomial_dispersion", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      CAST(count(*) AS BIGINT) AS t,
                      CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS s
               FROM events GROUP BY 1),
    g AS (SELECT CAST(sum(t) AS HUGEINT) AS tt,
                 CAST(sum(s) AS HUGEINT) AS ss,
                 CAST(count(*) AS BIGINT) AS nd FROM d),
    q AS (SELECT CAST(sum(CAST(floor(
                 (CAST(s AS DOUBLE)
                  - CAST(t AS DOUBLE)
                    * (CAST((SELECT ss FROM g) AS DOUBLE)
                       / CAST((SELECT tt FROM g) AS DOUBLE)))
                 * (CAST(s AS DOUBLE)
                    - CAST(t AS DOUBLE)
                      * (CAST((SELECT ss FROM g) AS DOUBLE)
                         / CAST((SELECT tt FROM g) AS DOUBLE)))
                 / (CAST(t AS DOUBLE)
                    * (CAST((SELECT ss FROM g) AS DOUBLE)
                       / CAST((SELECT tt FROM g) AS DOUBLE))
                    * (1.0 - CAST((SELECT ss FROM g) AS DOUBLE)
                       / CAST((SELECT tt FROM g) AS DOUBLE)))
                 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS chi_micro
          FROM d)
    SELECT (SELECT nd FROM g) AS n_days,
           CAST((SELECT ss FROM g) AS BIGINT) AS total_purchases,
           (SELECT chi_micro FROM q) AS chi_sum_micro,
           CAST((SELECT chi_micro FROM q) AS DOUBLE) / 1000000.0
             AS dispersion_chi2,
           CAST((SELECT chi_micro FROM q) AS DOUBLE) / 1000000.0
             / (CAST((SELECT nd FROM g) AS DOUBLE) - 1.0)
             AS dispersion_ratio""")
def binomial_dispersion(sf_dir: str):
    """BINOMIAL DISPERSION TEST of daily purchase conversions:
    chi-square of each day's successes against its trials at the
    pooled rate, with the ratio to its df — ratio >> 1 means the
    conversion RATE itself moves day to day (negbin_fit's
    overdispersion story for rates, not counts), which widens every
    CI the experiment family (ab_test/newcombe/sprt) reports. Day
    cells are exact integer folds; each day's term is built from
    identical pooled-rate doubles and quantizes to micro units
    half-up before the fold. Scale plan: bounded day-domain
    combine; the term fold is O(days) driver work."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        s = (b["event_type"].to_numpy(object)
             == "purchase").astype(np.int64)
        g = pd.DataFrame({"day": day,
                          "t": np.ones(len(b), np.int64),
                          "s": s}).groupby("day",
                                           as_index=False).sum()
        for c in ("t", "s"):
            g[c] = g[c].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["t", "s"], exact_int=True)
    tt = sum(int(v) for v in d["t"])
    ss = sum(int(v) for v in d["s"])
    p = np.float64(ss) / np.float64(tt)
    chi = 0
    for _, r in d.iterrows():
        t, s = int(r["t"]), int(r["s"])
        e = np.float64(t) * p
        chi += int(np.floor(
            (np.float64(s) - e) * (np.float64(s) - e)
            / (e * (1.0 - p)) * 1000000.0 + 0.5))
    nd = len(d)
    return pd.DataFrame({
        "n_days": [np.int64(nd)],
        "total_purchases": [np.int64(ss)],
        "chi_sum_micro": [np.int64(chi)],
        "dispersion_chi2": [np.float64(chi) / 1000000.0],
        "dispersion_ratio": [np.float64(chi) / 1000000.0
                             / (np.float64(nd) - 1.0)]})


@register("purchase_regularity", sql="""
    WITH o AS (SELECT o_custkey AS cust, o_orderdate AS d
               FROM orders),
    g AS (SELECT cust, d,
                 lag(d) OVER (PARTITION BY cust ORDER BY d)
                   AS pd_
          FROM o),
    gaps AS (SELECT cust,
                    CAST(date_diff('day', pd_, d) AS BIGINT)
                      AS gap
             FROM g WHERE pd_ IS NOT NULL),
    st AS (SELECT cust, CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(gap) AS BIGINT) AS s,
                  CAST(sum(CAST(gap AS HUGEINT) * gap)
                       AS HUGEINT) AS s2
           FROM gaps GROUP BY cust HAVING count(*) >= 3),
    cls AS (SELECT cust,
                   CASE WHEN 4 * (k * s2
                                  - CAST(s AS HUGEINT) * s)
                             <= CAST(s AS HUGEINT) * s
                        THEN 'regular'
                        WHEN k * s2 - CAST(s AS HUGEINT) * s
                             <= CAST(s AS HUGEINT) * s
                        THEN 'mixed' ELSE 'clumpy' END AS cls
            FROM st)
    SELECT cls AS regularity_class,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM cls GROUP BY cls ORDER BY cls""")
def purchase_regularity(sf_dir: str):
    """PURCHASE-REGULARITY (clumpiness) CENSUS: customers with
    >= 3 inter-order gaps classified by the gap coefficient of
    variation — 'regular' (CV <= 0.5, metronome buyers), 'mixed',
    or 'clumpy' (CV > 1, burst-then-silence) — the marketing
    clumpiness segmentation that RFM misses entirely (two
    customers with identical R/F/M can differ wildly here). The CV
    thresholds are EXACT integer cross-multiplications
    (4(k S2 - S^2) <= S^2 — the abc_xyz trick), so not one float
    exists in the whole operator. Scale plan: gaps fold inside the
    one custkey exchange's ordered partitions; the 3-cell class
    census leaves each partition pre-aggregated."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "d": b["o_orderdate"].to_numpy("datetime64[D]")
            .astype(np.int64)})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.sort_values(["cust", "d"], kind="mergesort")
        cust = a["cust"].to_numpy(np.int64)
        d = a["d"].to_numpy(np.int64)
        same = np.zeros(len(a), bool)
        same[1:] = cust[1:] == cust[:-1]
        gap = np.where(same, d - np.roll(d, 1), 0)
        df = pd.DataFrame({"cust": cust[same],
                           "gap": gap[same]})
        st = df.groupby("cust").agg(
            k=("gap", "size"),
            s=("gap", lambda x: sum(int(v) for v in x)),
            s2=("gap", lambda x: sum(int(v) * int(v)
                                     for v in x)))
        st = st[st["k"] >= 3]
        counts = {"regular": 0, "mixed": 0, "clumpy": 0}
        for _, r in st.iterrows():
            k, s, s2 = int(r["k"]), int(r["s"]), int(r["s2"])
            var_t = k * s2 - s * s
            if 4 * var_t <= s * s:
                counts["regular"] += 1
            elif var_t <= s * s:
                counts["mixed"] += 1
            else:
                counts["clumpy"] += 1
        return pd.DataFrame({
            "regularity_class": list(counts),
            "n_customers": pd.Series(list(counts.values()),
                                     dtype=np.int64)})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["cust"], cells, 16),
        ["regularity_class"], ["n_customers"])
    s = s[s["n_customers"] > 0]
    s["n_customers"] = s["n_customers"].astype(np.int64)
    return s.sort_values("regularity_class",
                         kind="mergesort").reset_index(drop=True)
