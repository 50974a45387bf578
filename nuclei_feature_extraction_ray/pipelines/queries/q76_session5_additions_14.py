# round-5 session-5 additions, batch 14: negative-binomial
# overdispersion fit of daily event counts, the Hodges-Lehmann
# pseudo-median from Walsh averages, and shift-share decomposition
# of brand revenue growth.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_SS_Y0, _SS_Y1 = 1996, 1997


@register("negbin_fit", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                 CAST(sum(n) AS HUGEINT) AS s,
                 CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2
          FROM d),
    f AS (SELECT nd, CAST(s AS BIGINT) AS s,
                 CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) AS mean_,
                 (CAST(s2 AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(nd AS DOUBLE)) / CAST(nd AS DOUBLE)
                   AS var_
          FROM m)
    SELECT nd AS n_days, s AS total_events, mean_ AS mean_daily,
           var_ AS var_daily, var_ / mean_ AS dispersion_index,
           CASE WHEN var_ > mean_
                THEN mean_ * mean_ / (var_ - mean_)
                ELSE NULL END AS nb_r,
           CASE WHEN var_ > mean_ THEN mean_ / var_
                ELSE NULL END AS nb_p
    FROM f""")
def negbin_fit(sf_dir: str):
    """NEGATIVE-BINOMIAL method-of-moments fit of daily event
    counts: dispersion index var/mean, and when the data is
    overdispersed (var > mean — the Poisson assumption fails) the
    NB size r = mean^2/(var - mean) and p = mean/var — the standard
    count-model upgrade every event-volume forecaster reaches for
    when hourly_fano flags burstiness (NULL when equidispersed,
    matching the oracle CASE). Moments are exact integer folds
    (HUGEINT / python-int second moment); every derived value is a
    shared float expression. Scale plan: per-batch (day, count)
    partials through the bounded day-domain combine; the fit is
    O(1) driver arithmetic."""
    ds = _events(sf_dir, ["ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        g = pd.DataFrame({"day": day,
                          "n": np.ones(len(b), np.int64)}) \
            .groupby("day", as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["n"], exact_int=True)
    n = [int(x) for x in d["n"]]
    nd = len(n)
    s = sum(n)
    s2 = sum(x * x for x in n)
    mean = np.float64(s) / np.float64(nd)
    var = (np.float64(s2)
           - np.float64(s) * np.float64(s) / np.float64(nd)) \
        / np.float64(nd)
    over = var > mean
    return pd.DataFrame({
        "n_days": [np.int64(nd)], "total_events": [np.int64(s)],
        "mean_daily": [np.float64(mean)],
        "var_daily": [np.float64(var)],
        "dispersion_index": [np.float64(var / mean)],
        "nb_r": [np.float64(mean * mean / (var - mean))
                 if over else np.nan],
        "nb_p": [np.float64(mean / var) if over else np.nan]})


@register("hodges_lehmann", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    w AS (SELECT a.v + b.v AS w2,
                 row_number() OVER (ORDER BY a.v + b.v,
                                    a.day, b.day) AS i
          FROM d a JOIN d b ON a.day <= b.day),
    m AS (SELECT CAST(count(*) AS BIGINT) AS np_ FROM w),
    k AS (SELECT ((SELECT np_ FROM m) + 1) // 2 AS lo,
                 ((SELECT np_ FROM m) + 2) // 2 AS hi)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           (SELECT np_ FROM m) AS n_walsh,
           CAST((SELECT w2 FROM w WHERE i = (SELECT lo FROM k))
                AS BIGINT) AS lo_w2_cents,
           CAST((SELECT w2 FROM w WHERE i = (SELECT hi FROM k))
                AS BIGINT) AS hi_w2_cents,
           (CAST((SELECT w2 FROM w WHERE i = (SELECT lo FROM k))
                 AS DOUBLE)
            + CAST((SELECT w2 FROM w WHERE i = (SELECT hi FROM k))
                   AS DOUBLE)) / 4.0 AS hl_estimate_cents""")
def hodges_lehmann(sf_dir: str):
    """HODGES-LEHMANN pseudo-median of daily revenue: the median of
    all n(n+1)/2 Walsh averages (x_i + x_j)/2, i <= j — the location
    estimator dual to the Wilcoxon signed-rank test, ~29% breakdown
    with near-full normal efficiency (the location sibling of
    qn_scale's pairwise-difference scale). Walsh averages are kept
    as EXACT 2-scaled integer sums; the two middle order statistics
    are exact integers regardless of tie order, and only the final
    /4 (average of the two middles, halved back) is float. Scale
    plan: per-batch (day, cents) partials through the bounded
    day-domain combine; the O(days^2) Walsh scan runs on the driver
    — the day domain, not row count, bounds the quadratic."""
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
    iu = np.triu_indices(n, 0)           # i <= j includes diagonal
    w2 = np.sort(v[iu[0]] + v[iu[1]])
    npr = len(w2)
    lo = (npr + 1) // 2
    hi = (npr + 2) // 2
    lw, hw = int(w2[lo - 1]), int(w2[hi - 1])
    return pd.DataFrame({
        "n_days": [np.int64(n)], "n_walsh": [np.int64(npr)],
        "lo_w2_cents": [np.int64(lw)],
        "hi_w2_cents": [np.int64(hw)],
        "hl_estimate_cents": [(np.float64(lw) + np.float64(hw))
                              / 4.0]})


@register("shift_share", sql="""
    WITH li AS (SELECT l.l_partkey AS pk,
                       CAST(year(l.l_shipdate) AS BIGINT) AS y,
                       CAST(floor(l.l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS r
                FROM lineitem l
                WHERE year(l.l_shipdate) IN ({y0}, {y1})),
    b AS (SELECT p.p_brand AS brand, li.y,
                 CAST(sum(li.r) AS BIGINT) AS rev
          FROM li JOIN part p ON li.pk = p.p_partkey
          GROUP BY 1, 2),
    w AS (SELECT brand,
                 CAST(sum(CASE WHEN y = {y0} THEN rev ELSE 0 END)
                      AS BIGINT) AS r0,
                 CAST(sum(CASE WHEN y = {y1} THEN rev ELSE 0 END)
                      AS BIGINT) AS r1
          FROM b GROUP BY brand),
    t AS (SELECT CAST(sum(r0) AS HUGEINT) AS t0,
                 CAST(sum(r1) AS HUGEINT) AS t1 FROM w)
    SELECT brand, r0 AS base_cents, r1 AS curr_cents,
           r1 - r0 AS actual_growth_cents,
           CAST(floor(CAST(r0 AS DOUBLE)
                * (CAST((SELECT t1 FROM t) AS DOUBLE)
                   / CAST((SELECT t0 FROM t) AS DOUBLE) - 1.0)
                + 0.5) AS BIGINT) AS expected_growth_cents,
           r1 - r0 - CAST(floor(CAST(r0 AS DOUBLE)
                * (CAST((SELECT t1 FROM t) AS DOUBLE)
                   / CAST((SELECT t0 FROM t) AS DOUBLE) - 1.0)
                + 0.5) AS BIGINT) AS differential_shift_cents
    FROM w ORDER BY brand""".format(y0=_SS_Y0, y1=_SS_Y1))
def shift_share(sf_dir: str):
    """SHIFT-SHARE DECOMPOSITION of brand revenue growth {y0} ->
    {y1}: each brand's actual growth splits into the expected share
    (base revenue times the market-wide growth rate, quantized to
    whole cents half-up) and the differential shift — did the brand
    out- or under-perform the market? The regional-economics
    decomposition operator, the growth-accounting sibling of
    abc_class / nation_top2_gap. Revenue cells are exact integer
    cents; the growth rate is one shared float ratio and each
    expected value quantizes before the exact integer subtraction.
    Scale plan: per-batch (part, year, cents) partials; brand labels
    attach via the guarded broadcast part dim inside the partial
    (the q11 searchsorted pattern); the brand x year grid combine is
    bounded."""
    from ._shared import _read_dim
    part = _read_dim(_path(sf_dir, "part"), ["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(np.int64)
    order_ = np.argsort(pk, kind="stable")
    pk = pk[order_]
    brand = part["p_brand"].to_numpy()[order_]

    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_shipdate"].dt.year.to_numpy(np.int64)
        m = (y == _SS_Y0) | (y == _SS_Y1)
        keys = b["l_partkey"].to_numpy(np.int64)[m]
        r = np.floor(
            b["l_extendedprice"].to_numpy(np.float64)[m] * 100
            + 0.5).astype(np.int64)
        br = brand[np.searchsorted(pk, keys)]
        g = pd.DataFrame({"brand": br, "y": y[m], "rev": r}) \
            .groupby(["brand", "y"], as_index=False).sum()
        g["rev"] = g["rev"].astype(np.int64)
        return g

    w = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["brand", "y"], ["rev"], exact_int=True)
    piv = w.pivot_table(index="brand", columns="y", values="rev",
                        aggfunc="sum", fill_value=0)
    r0 = piv.get(_SS_Y0, pd.Series(0, index=piv.index)).map(int)
    r1 = piv.get(_SS_Y1, pd.Series(0, index=piv.index)).map(int)
    t0, t1 = sum(r0), sum(r1)
    g = np.float64(t1) / np.float64(t0) - 1.0
    rows = []
    for brand_ in sorted(piv.index):
        b0, b1 = int(r0[brand_]), int(r1[brand_])
        exp = int(np.floor(np.float64(b0) * g + 0.5))
        rows.append({
            "brand": brand_, "base_cents": np.int64(b0),
            "curr_cents": np.int64(b1),
            "actual_growth_cents": np.int64(b1 - b0),
            "expected_growth_cents": np.int64(exp),
            "differential_shift_cents": np.int64(b1 - b0 - exp)})
    return pd.DataFrame(rows)
