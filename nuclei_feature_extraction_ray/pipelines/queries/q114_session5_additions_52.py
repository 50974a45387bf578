# round-5 session-5 additions, batch 52: Bass diffusion fit of
# customer adoption, the cannibalization pair scan over weekly
# brand revenue, and novelty-effect decay of the arm difference.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, _read_dim,
                      np, pd, rd, register)
from ...stages.partition import partition_map

_CN_TOP = 5


@register("bass_diffusion", sql="""
    WITH fo AS (SELECT o_custkey,
                       CAST(year(min(o_orderdate)) * 12
                            + month(min(o_orderdate)) AS BIGINT)
                         AS mo
                FROM orders GROUP BY o_custkey),
    a AS (SELECT mo, CAST(count(*) AS BIGINT) AS n_new
          FROM fo GROUP BY mo),
    x AS (SELECT mo, n_new,
                 CAST(COALESCE(sum(n_new) OVER (ORDER BY mo
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS BIGINT) AS cum
          FROM a),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(n_new) AS HUGEINT) AS sy,
                 CAST(sum(cum) AS HUGEINT) AS s1,
                 CAST(sum(CAST(cum AS HUGEINT) * cum) AS HUGEINT)
                   AS s2,
                 CAST(sum(CAST(cum AS HUGEINT) * cum * cum)
                      AS HUGEINT) AS s3,
                 CAST(sum(CAST(cum AS HUGEINT) * cum * cum * cum)
                      AS HUGEINT) AS s4,
                 CAST(sum(CAST(cum AS HUGEINT) * n_new)
                      AS HUGEINT) AS s1y,
                 CAST(sum(CAST(cum AS HUGEINT) * cum * n_new)
                      AS HUGEINT) AS s2y
          FROM x),
    c AS (SELECT CAST(n AS BIGINT) AS n,
                 CAST(n * s2 - s1 * s1 AS DOUBLE) AS c11,
                 CAST(n * s4 - s2 * s2 AS DOUBLE) AS c22,
                 CAST(n * s3 - s1 * s2 AS DOUBLE) AS c12,
                 CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
                 CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y,
                 CAST(sy AS DOUBLE) AS fy,
                 CAST(s1 AS DOUBLE) AS f1,
                 CAST(s2 AS DOUBLE) AS f2
          FROM m),
    b AS (SELECT n, fy, f1, f2,
                 (c1y * c22 - c2y * c12)
                 / (c11 * c22 - c12 * c12) AS b1,
                 (c2y * c11 - c1y * c12)
                 / (c11 * c22 - c12 * c12) AS b2
          FROM c),
    f AS (SELECT n, b1, b2,
                 (fy - b1 * f1 - b2 * f2) / CAST(n AS DOUBLE)
                   AS b0
          FROM b)
    SELECT n AS n_months, b0 AS coef_const, b1 AS coef_cum,
           b2 AS coef_cum_sq,
           (-b1 - sqrt(b1 * b1 - 4.0 * b2 * b0)) / (2.0 * b2)
             AS market_size_m,
           b0 / ((-b1 - sqrt(b1 * b1 - 4.0 * b2 * b0))
                 / (2.0 * b2)) AS innovation_p,
           b1 + b0 / ((-b1 - sqrt(b1 * b1 - 4.0 * b2 * b0))
                      / (2.0 * b2)) AS imitation_q
    FROM f""")
def bass_diffusion(sf_dir: str):
    """BASS DIFFUSION fit of customer adoption: monthly first-order
    counts regressed on prior cumulative adopters and its square
    (n_t = b0 + b1 N + b2 N^2), then the classic inversion M =
    (-b1 - sqrt(b1^2 - 4 b2 b0)) / (2 b2), p = b0/M, q = b1 + p —
    the marketing-science growth model that says whether adoption
    is innovation- or imitation-driven and how big the market gets
    (the mechanistic upgrade of orders_growth's descriptive
    curve). Adoption counts and all regression moments are exact
    big-integer folds (first-order month via one custkey
    exchange); coefficients and the (M, p, q) inversion are shared
    float expressions. Scale plan: per-customer first-month cells
    through the custkey exchange; the month-domain regression is
    O(months) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mo = (b["o_orderdate"].dt.year.to_numpy(np.int64) * 12
              + b["o_orderdate"].dt.month.to_numpy(np.int64))
        return pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "mo": mo}).groupby("cust", as_index=False).min()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("cust", as_index=False)["mo"].min()
        out = a.groupby("mo", as_index=False).size() \
            .rename(columns={"size": "n_new"})
        out["n_new"] = out["n_new"].astype(np.int64)
        return out

    a = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["cust"], cells, 16),
        ["mo"], ["n_new"]).sort_values("mo").reset_index(drop=True)
    ny = [int(x) for x in a["n_new"]]
    cum = [0]
    for v in ny[:-1]:
        cum.append(cum[-1] + v)
    n = len(ny)
    sy = sum(ny)
    s1 = sum(cum)
    s2 = sum(c * c for c in cum)
    s3 = sum(c * c * c for c in cum)
    s4 = sum(c * c * c * c for c in cum)
    s1y = sum(c * y for c, y in zip(cum, ny))
    s2y = sum(c * c * y for c, y in zip(cum, ny))
    c11 = np.float64(n * s2 - s1 * s1)
    c22 = np.float64(n * s4 - s2 * s2)
    c12 = np.float64(n * s3 - s1 * s2)
    c1y = np.float64(n * s1y - s1 * sy)
    c2y = np.float64(n * s2y - s2 * sy)
    det = c11 * c22 - c12 * c12
    b1 = (c1y * c22 - c2y * c12) / det
    b2 = (c2y * c11 - c1y * c12) / det
    b0 = (np.float64(sy) - b1 * np.float64(s1)
          - b2 * np.float64(s2)) / np.float64(n)
    m_ = (-b1 - np.sqrt(b1 * b1 - 4.0 * b2 * b0)) / (2.0 * b2)
    p = b0 / m_
    return pd.DataFrame({
        "n_months": [np.int64(n)], "coef_const": [b0],
        "coef_cum": [b1], "coef_cum_sq": [b2],
        "market_size_m": [m_], "innovation_p": [p],
        "imitation_q": [b1 + p]})


@register("cannibalization_pairs", sql="""
    WITH li AS (SELECT p.p_brand AS brand,
                       CAST(floor(epoch(CAST(l.l_shipdate AS
                            TIMESTAMP)) / 604800) AS BIGINT)
                         AS wk,
                       CAST(floor(l.l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS r
                FROM lineitem l JOIN part p
                  ON l.l_partkey = p.p_partkey),
    w AS (SELECT brand, wk, CAST(sum(r) AS BIGINT) AS rev
          FROM li GROUP BY brand, wk),
    wk_all AS (SELECT DISTINCT wk FROM w),
    grid AS (SELECT b.brand, k.wk,
                    CAST(COALESCE(w.rev, 0) AS BIGINT) AS rev
             FROM (SELECT DISTINCT brand FROM w) b
             CROSS JOIN wk_all k
             LEFT JOIN w ON w.brand = b.brand AND w.wk = k.wk),
    m AS (SELECT brand, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(rev) AS HUGEINT) AS s,
                 CAST(sum(CAST(rev AS HUGEINT) * rev) AS HUGEINT)
                   AS s2
          FROM grid GROUP BY brand),
    x AS (SELECT a.brand AS b1, b.brand AS b2,
                 CAST((SELECT count(*) FROM wk_all) AS HUGEINT)
                   AS n,
                 ma.s AS s1, mb.s AS s2_,
                 ma.s2 AS s11, mb.s2 AS s22,
                 CAST((SELECT sum(CAST(ga.rev AS HUGEINT)
                                  * gb.rev)
                       FROM grid ga JOIN grid gb
                         ON ga.wk = gb.wk
                        AND ga.brand = a.brand
                        AND gb.brand = b.brand) AS HUGEINT)
                   AS s12
          FROM (SELECT DISTINCT brand FROM w) a
          JOIN (SELECT DISTINCT brand FROM w) b
            ON a.brand < b.brand
          JOIN m ma ON ma.brand = a.brand
          JOIN m mb ON mb.brand = b.brand),
    corr AS (SELECT b1, b2,
                    CAST(n * s12 - s1 * s2_ AS DOUBLE)
                    / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
                           * CAST(n * s22 - s2_ * s2_
                                  AS DOUBLE)) AS r
             FROM x)
    SELECT b1 AS brand_a, b2 AS brand_b, r AS weekly_corr
    FROM corr ORDER BY r, b1, b2 LIMIT {k}""".format(k=_CN_TOP))
def cannibalization_pairs(sf_dir: str):
    """CANNIBALIZATION PAIR SCAN: the {k} most NEGATIVELY
    correlated brand pairs on zero-filled weekly revenue — when one
    brand's week is up while another's is reliably down, they are
    trading the same customers (the substitution signal basket
    analytics' positive-lift view is blind to). Weekly brand cells
    are exact integer cents on the dense week grid (absent weeks
    are true zeros); every pairwise correlation uses exact integer
    moments with one shared float expression, ranked ascending with
    brand tie-breaks. Scale plan: the brands x weeks grid is
    bounded; per-brand moments and the O(brands^2) pair scan are
    driver grid work."""
    part = _read_dim(_path(sf_dir, "part"),
                     ["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(np.int64)
    order_ = np.argsort(pk, kind="stable")
    pk = pk[order_]
    brand = part["p_brand"].to_numpy()[order_]

    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        wk = (b["l_shipdate"].to_numpy("datetime64[D]")
              .astype(np.int64)) // 7
        r = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "brand": brand[np.searchsorted(
                pk, b["l_partkey"].to_numpy(np.int64))],
            "wk": wk, "rev": r}) \
            .groupby(["brand", "wk"], as_index=False).sum()
        g["rev"] = g["rev"].astype(np.int64)
        return g

    w = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["brand", "wk"], ["rev"], exact_int=True)
    weeks = np.sort(w["wk"].unique())
    brands = sorted(w["brand"].unique())
    wi = {int(x): i for i, x in enumerate(weeks)}
    series = {b_: np.zeros(len(weeks), object) for b_ in brands}
    for _, r in w.iterrows():
        series[r["brand"]][wi[int(r["wk"])]] = int(r["rev"])
    n = len(weeks)
    mom = {}
    for b_ in brands:
        v = [int(x) for x in series[b_]]
        mom[b_] = (sum(v), sum(x * x for x in v), v)
    rows = []
    for i, a_ in enumerate(brands):
        s1, s11, va = mom[a_]
        for b_ in brands[i + 1:]:
            s2_, s22, vb = mom[b_]
            s12 = sum(x * y for x, y in zip(va, vb))
            r = np.float64(n * s12 - s1 * s2_) \
                / np.sqrt(np.float64(n * s11 - s1 * s1)
                          * np.float64(n * s22 - s2_ * s2_))
            rows.append((r, a_, b_))
    rows.sort(key=lambda t: (t[0], t[1], t[2]))
    top = rows[:_CN_TOP]
    return pd.DataFrame({
        "brand_a": [t[1] for t in top],
        "brand_b": [t[2] for t in top],
        "weekly_corr": [np.float64(t[0]) for t in top]})


@register("novelty_decay", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1
                               ELSE 0 END) AS BIGINT) AS t0,
                      CAST(sum(CASE WHEN user_id % 2 = 0
                                    AND event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT)
                        AS s0,
                      CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1
                               ELSE 0 END) AS BIGINT) AS t1,
                      CAST(sum(CASE WHEN user_id % 2 = 1
                                    AND event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT)
                        AS s1
               FROM events GROUP BY 1),
    v AS (SELECT CAST(row_number() OVER (ORDER BY day)
                      AS BIGINT) AS t,
                 CAST(floor((CAST(s1 AS DOUBLE)
                             / CAST(t1 AS DOUBLE)
                             - CAST(s0 AS DOUBLE)
                               / CAST(t0 AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS dm
          FROM d WHERE t0 > 0 AND t1 > 0),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(dm) AS HUGEINT) AS sy,
                 CAST(sum(t) AS HUGEINT) AS sx,
                 CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(t AS HUGEINT) * dm) AS HUGEINT)
                   AS sxy
          FROM v)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
             AS mean_effect,
           CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) / 1000000.0
             AS effect_slope_per_day,
           CAST(CASE WHEN n * sxy - sx * sy < 0 THEN 1 ELSE 0 END
                AS BIGINT) AS is_decaying
    FROM m""")
def novelty_decay(sf_dir: str):
    """NOVELTY-EFFECT DECAY: regress the daily arm conversion-rate
    difference (paired_t's series) on the day index — a negative
    slope means the treatment effect is FADING with exposure, the
    novelty artifact that makes a short A/B read overstate the
    long-run lift (sprt_ab stops early; this says whether early
    means inflated). Daily differences quantize to micro units;
    trend moments fold as exact big ints; mean, slope and the
    exact-integer decay verdict (sign of the centered
    cross-moment) are shared expressions. Scale plan: day-arm
    cells through the bounded day-domain combine; the trend is
    O(days) driver work."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        arm = b["user_id"].to_numpy(np.int64) % 2
        pur = (b["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        g = pd.DataFrame({
            "day": day,
            "t0": (arm == 0).astype(np.int64),
            "s0": ((arm == 0) & (pur == 1)).astype(np.int64),
            "t1": (arm == 1).astype(np.int64),
            "s1": ((arm == 1) & (pur == 1)).astype(np.int64)}) \
            .groupby("day", as_index=False).sum()
        for c in ("t0", "s0", "t1", "s1"):
            g[c] = g[c].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["t0", "s0", "t1", "s1"],
        exact_int=True).sort_values("day").reset_index(drop=True)
    dms = []
    for _, r in d.iterrows():
        t0, s0 = int(r["t0"]), int(r["s0"])
        t1, s1 = int(r["t1"]), int(r["s1"])
        if t0 > 0 and t1 > 0:
            dms.append(int(np.floor(
                (np.float64(s1) / np.float64(t1)
                 - np.float64(s0) / np.float64(t0))
                * 1000000.0 + 0.5)))
    n = len(dms)
    t = list(range(1, n + 1))
    sy = sum(dms)
    sx = sum(t)
    sxx = sum(x * x for x in t)
    sxy = sum(x * y for x, y in zip(t, dms))
    num = n * sxy - sx * sy
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "mean_effect": [np.float64(sy) / np.float64(n)
                        / 1000000.0],
        "effect_slope_per_day": [np.float64(num)
                                 / np.float64(n * sxx - sx * sx)
                                 / 1000000.0],
        "is_decaying": [np.int64(1 if num < 0 else 0)]})
