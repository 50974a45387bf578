# round-5 session-5 additions, batch 37: Elo ratings over daily arm
# contests, Cook's distance influence ranking for the trend fit,
# and quadratic weighted kappa between two ordinal raters.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)

_ELO_K = 32.0
_CD_TOP = 5
_QWK_CH = (250, 350)
_QWK_TK = (45, 60)


@register("elo_ratings", sql="""
    WITH RECURSIVE d AS (
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0
                      END) AS BIGINT) AS t0,
             CAST(sum(CASE WHEN user_id % 2 = 0
                           AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0
                      END) AS BIGINT) AS t1,
             CAST(sum(CASE WHEN user_id % 2 = 1
                           AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS s1
      FROM events GROUP BY 1),
    x AS (SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                   AS i,
                 CASE WHEN s0 * t1 > s1 * t0 THEN 1.0
                      WHEN s0 * t1 < s1 * t0 THEN 0.0
                      ELSE 0.5 END AS sc
          FROM d),
    rec AS (
      SELECT i, sc,
             CAST(1500000000 + CAST(floor({k} * (sc - 0.5)
                  * 1000000.0 + 0.5) AS BIGINT) AS BIGINT) AS r0,
             CAST(1500000000 - CAST(floor({k} * (sc - 0.5)
                  * 1000000.0 + 0.5) AS BIGINT) AS BIGINT) AS r1
      FROM x WHERE i = 1
      UNION ALL
      SELECT x.i, x.sc,
             r.r0 + CAST(floor({k} * (x.sc
                  - 1.0 / (1.0 + exp((CAST(r.r1 AS DOUBLE)
                                      - CAST(r.r0 AS DOUBLE))
                                     / 1000000.0
                                     * (ln(10.0) / 400.0))))
                  * 1000000.0 + 0.5) AS BIGINT),
             r.r1 - CAST(floor({k} * (x.sc
                  - 1.0 / (1.0 + exp((CAST(r.r1 AS DOUBLE)
                                      - CAST(r.r0 AS DOUBLE))
                                     / 1000000.0
                                     * (ln(10.0) / 400.0))))
                  * 1000000.0 + 0.5) AS BIGINT)
      FROM rec r JOIN x ON x.i = r.i + 1),
    fin AS (SELECT *, row_number() OVER (ORDER BY i DESC) AS rn
            FROM rec)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           r0 AS arm0_rating_micro, r1 AS arm1_rating_micro,
           CAST(r0 AS DOUBLE) / 1000000.0 AS arm0_rating,
           CAST(r1 AS DOUBLE) / 1000000.0 AS arm1_rating
    FROM fin WHERE rn = 1""".format(k=_ELO_K))
def elo_ratings(sf_dir: str):
    """ELO RATINGS over daily arm contests: each day the two
    user-parity arms 'play' (winner = higher exact conversion rate
    by integer cross-multiplication, ties at half) and ratings
    update by K*(score - expected) with the logistic expectation
    exp-form of the 10^(d/400) curve — the sequential skill-rating
    operator (the online sibling of bt_strength/colley's batch
    fits). Ratings live as micro ints seeded at 1500; every
    update's expectation is computed from the SAME integer ratings
    on both engines and the delta quantizes half-up, so the whole
    day-ordered recursion is bit-identical to the recursive-CTE
    oracle. Scale plan: bounded day-domain combine; the inherently
    sequential rating pass is O(days) on the driver."""
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
    cc = np.log(10.0) / 400.0
    r0 = r1 = 1500000000
    first = True
    for _, r in d.iterrows():
        t0, s0 = int(r["t0"]), int(r["s0"])
        t1, s1 = int(r["t1"]), int(r["s1"])
        if s0 * t1 > s1 * t0:
            sc = 1.0
        elif s0 * t1 < s1 * t0:
            sc = 0.0
        else:
            sc = 0.5
        if first:
            delta = int(np.floor(_ELO_K * (sc - 0.5)
                                 * 1000000.0 + 0.5))
            first = False
        else:
            e0 = 1.0 / (1.0 + np.exp(
                (np.float64(r1) - np.float64(r0)) / 1000000.0
                * cc))
            delta = int(np.floor(_ELO_K * (sc - e0)
                                 * 1000000.0 + 0.5))
        r0 += delta
        r1 -= delta
    return pd.DataFrame({
        "n_days": [np.int64(len(d))],
        "arm0_rating_micro": [np.int64(r0)],
        "arm1_rating_micro": [np.int64(r1)],
        "arm0_rating": [np.float64(r0) / 1000000.0],
        "arm1_rating": [np.float64(r1) / 1000000.0]})


@register("cooks_distance", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT day, v, CAST(row_number() OVER (ORDER BY day)
                              AS BIGINT) AS t
          FROM d),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS sy,
                 CAST(sum(t) AS HUGEINT) AS sx,
                 CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(t AS HUGEINT) * v) AS HUGEINT)
                   AS sxy,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                   AS syy
          FROM x),
    cf AS (SELECT CAST(n AS DOUBLE) AS fn,
                  CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
                  (CAST(sy AS DOUBLE)
                   - CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                    AS a,
                  CAST((n * syy - sy * sy) * (n * sxx - sx * sx)
                       - (n * sxy - sx * sy)
                         * (n * sxy - sx * sy) AS DOUBLE)
                  / CAST(n * (n * sxx - sx * sx) AS DOUBLE)
                  / (CAST(n AS DOUBLE) - 2.0) AS s2
           FROM m),
    cd AS (SELECT day,
                  ((CAST(v AS DOUBLE) - (SELECT a FROM cf)
                    - (SELECT b FROM cf) * CAST(t AS DOUBLE))
                   * (CAST(v AS DOUBLE) - (SELECT a FROM cf)
                      - (SELECT b FROM cf) * CAST(t AS DOUBLE)))
                  * (1.0 / (SELECT fn FROM cf)
                     + (CAST(t AS DOUBLE)
                        - ((SELECT fn FROM cf) + 1.0) / 2.0)
                       * (CAST(t AS DOUBLE)
                          - ((SELECT fn FROM cf) + 1.0) / 2.0)
                       / (((SELECT fn FROM cf)
                           * (SELECT fn FROM cf)
                           * (SELECT fn FROM cf)
                           - (SELECT fn FROM cf)) / 12.0))
                  / (2.0 * (SELECT s2 FROM cf)
                     * (1.0 - (1.0 / (SELECT fn FROM cf)
                        + (CAST(t AS DOUBLE)
                           - ((SELECT fn FROM cf) + 1.0) / 2.0)
                          * (CAST(t AS DOUBLE)
                             - ((SELECT fn FROM cf) + 1.0) / 2.0)
                          / (((SELECT fn FROM cf)
                              * (SELECT fn FROM cf)
                              * (SELECT fn FROM cf)
                              - (SELECT fn FROM cf)) / 12.0)))
                     * (1.0 - (1.0 / (SELECT fn FROM cf)
                        + (CAST(t AS DOUBLE)
                           - ((SELECT fn FROM cf) + 1.0) / 2.0)
                          * (CAST(t AS DOUBLE)
                             - ((SELECT fn FROM cf) + 1.0) / 2.0)
                          / (((SELECT fn FROM cf)
                              * (SELECT fn FROM cf)
                              * (SELECT fn FROM cf)
                              - (SELECT fn FROM cf)) / 12.0))))
                    AS dist
           FROM x)
    SELECT day AS epoch_day,
           CAST(floor(dist * 1000000.0 + 0.5) AS BIGINT)
             AS cooks_d_micro,
           dist AS cooks_d
    FROM cd ORDER BY dist DESC, day LIMIT {t}""".format(t=_CD_TOP))
def cooks_distance(sf_dir: str):
    """COOK'S DISTANCE influence ranking for the daily-revenue
    trend fit: D_i = e_i^2 h_i / (p s^2 (1-h_i)^2) with the exact
    equispaced leverage — the top-{t} days that single-handedly
    bend the regression line, the influence companion of
    press_statistic (PRESS sums deleted error; Cook's D names the
    culprits). Residuals, leverages and s^2 are identical doubles
    built from exact integer moments (the SSR closed form), so the
    ranking (D DESC, day) is deterministic on both engines. Scale
    plan: one moment pass then one scoring pass over the bounded
    day domain — O(days) driver work."""
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
    days = d["day"].to_numpy(np.int64)
    v = [int(x) for x in d["v"]]
    n = len(v)
    t = list(range(1, n + 1))
    sy = sum(v)
    sx = sum(t)
    sxx = sum(x * x for x in t)
    sxy = sum(a_ * b_ for a_, b_ in zip(t, v))
    syy = sum(x * x for x in v)
    fn_ = np.float64(n)
    dd = n * sxx - sx * sx
    bb = n * sxy - sx * sy
    b = np.float64(bb) / np.float64(dd)
    a = (np.float64(sy) - b * np.float64(sx)) / fn_
    s2 = np.float64((n * syy - sy * sy) * dd - bb * bb) \
        / np.float64(n * dd) / (fn_ - 2.0)
    tb = (fn_ + 1.0) / 2.0
    sxc = (fn_ * fn_ * fn_ - fn_) / 12.0
    dist = np.empty(n, np.float64)
    for i in range(n):
        ft = np.float64(t[i])
        e = np.float64(v[i]) - a - b * ft
        h = 1.0 / fn_ + (ft - tb) * (ft - tb) / sxc
        dist[i] = (e * e) * h / (2.0 * s2 * (1.0 - h)
                                 * (1.0 - h))
    order = np.lexsort((days, -dist))[:_CD_TOP]
    return pd.DataFrame({
        "epoch_day": days[order],
        "cooks_d_micro": np.floor(dist[order] * 1000000.0
                                  + 0.5).astype(np.int64),
        "cooks_d": dist[order]}).reset_index(drop=True)


@register("qwk", sql="""
    WITH lab AS (SELECT
        CASE WHEN n_chars < {c0} THEN 0
             WHEN n_chars < {c1} THEN 1 ELSE 2 END AS r1,
        CASE WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+')) END AS BIGINT) < {t0}
             THEN 0
             WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+')) END AS BIGINT) < {t1}
             THEN 1 ELSE 2 END AS r2
        FROM documents),
    o AS (SELECT r1, r2, CAST(count(*) AS BIGINT) AS n
          FROM lab GROUP BY r1, r2),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM o),
    rm AS (SELECT r1, CAST(sum(n) AS BIGINT) AS row_n
           FROM o GROUP BY r1),
    cm AS (SELECT r2, CAST(sum(n) AS BIGINT) AS col_n
           FROM o GROUP BY r2),
    wo AS (SELECT CAST(sum((r1 - r2) * (r1 - r2) * n)
                       AS HUGEINT) AS s
           FROM o),
    we AS (SELECT CAST(sum(CAST((rm.r1 - cm.r2)
                        * (rm.r1 - cm.r2) AS HUGEINT)
                        * rm.row_n * cm.col_n) AS HUGEINT) AS s
           FROM rm CROSS JOIN cm)
    SELECT (SELECT nn FROM t) AS n_docs,
           CAST((SELECT s FROM wo) AS BIGINT) AS weighted_obs,
           CAST((SELECT s FROM we) AS BIGINT) AS weighted_exp,
           1.0 - CAST((SELECT s FROM wo)
                      * (SELECT nn FROM t) AS DOUBLE)
                 / CAST((SELECT s FROM we) AS DOUBLE) AS qwk
    """.format(c0=_QWK_CH[0], c1=_QWK_CH[1],
               t0=_QWK_TK[0], t1=_QWK_TK[1]))
def qwk(sf_dir: str):
    """QUADRATIC WEIGHTED KAPPA between the two ordinal length
    raters (char-bins vs token-bins, 3 grades each): agreement
    penalized by the SQUARE of the grade gap, chance-corrected via
    the marginal outer product — the ordinal-label metric (Kaggle's
    competition staple) that fleiss_kappa's nominal agreement and
    lang_kappa's binary form both miss. Everything reduces to
    exact integers: the weighted observed sum, the weighted
    expected sum from the marginals, and QWK = 1 - N*O/E as one
    shared float division. Scale plan: map-only 3x3 confusion
    partials, O(blocks) driver combine."""
    from ...functions.hashing import tokens_flat
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["n_chars", "text"])

    def cat(vals: np.ndarray, lo: int, hi: int) -> np.ndarray:
        return np.where(vals < lo, 0,
                        np.where(vals < hi, 1, 2)).astype(np.int64)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        _, k = tokens_flat(b["text"])
        r1 = cat(b["n_chars"].to_numpy(np.int64), *_QWK_CH)
        r2 = cat(k, *_QWK_TK)
        g = pd.DataFrame({"r1": r1, "r2": r2,
                          "n": np.ones(len(b), np.int64)}) \
            .groupby(["r1", "r2"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    o = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["r1", "r2"], ["n"])
    nn = int(o["n"].sum())
    wo = sum((int(r["r1"]) - int(r["r2"])) ** 2 * int(r["n"])
             for _, r in o.iterrows())
    rowm = o.groupby("r1")["n"].sum()
    colm = o.groupby("r2")["n"].sum()
    we = sum((int(i) - int(j)) ** 2 * int(rowm[i]) * int(colm[j])
             for i in rowm.index for j in colm.index)
    return pd.DataFrame({
        "n_docs": [np.int64(nn)],
        "weighted_obs": [np.int64(wo)],
        "weighted_exp": [np.int64(we)],
        "qwk": [1.0 - np.float64(wo * nn) / np.float64(we)]})
