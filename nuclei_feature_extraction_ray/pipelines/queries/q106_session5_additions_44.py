# round-5 session-5 additions, batch 44: the Duncan dissimilarity
# index per source, value-at-risk / expected shortfall of daily
# revenue changes, and a Simpson's-paradox detector.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)

_VAR_PCT = 95


@register("duncan_dissimilarity", sql="""
    WITH c AS (SELECT source, lang,
                      CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY source, lang),
    st AS (SELECT source, CAST(sum(n) AS BIGINT) AS t
           FROM c GROUP BY source),
    lt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS g
           FROM c GROUP BY lang),
    tt AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
    grid AS (SELECT st.source, lt.lang, st.t, lt.g,
                    CAST(COALESCE(c.n, 0) AS BIGINT) AS n
             FROM st CROSS JOIN lt
             LEFT JOIN c ON c.source = st.source
                        AND c.lang = lt.lang),
    d AS (SELECT source,
                 CAST(sum(abs(
                      CAST(n AS HUGEINT) * ((SELECT nn FROM tt)
                                            - t)
                      - CAST(g - n AS HUGEINT) * t)) AS HUGEINT)
                   AS num,
                 CAST(max(t) AS BIGINT) AS t
          FROM grid GROUP BY source)
    SELECT source, t AS n_docs,
           CAST(num AS DOUBLE)
           / (2.0 * CAST(t AS DOUBLE)
              * CAST((SELECT nn FROM tt) - t AS DOUBLE))
             AS dissimilarity
    FROM d ORDER BY source""")
def duncan_dissimilarity(sf_dir: str):
    """DUNCAN DISSIMILARITY INDEX of each source's language mix
    against the REST of the corpus: D = 1/2 sum_l |p_l - q_l| —
    the share of the source's documents that would need to change
    language to match everyone else; the segregation index
    sociology uses for residential mixing, here ranking which
    crawl sources are linguistic islands (the per-source sibling
    of chi2_lang_source's omnibus and source_kl's divergence).
    Each |p - q| term cross-multiplies to the EXACT integer
    |n_l(N-T) - (g_l - n_l)T| — the entire numerator folds as
    exact big ints with ONE final division. Scale plan: the
    bounded source x lang grid census; per-source sums are driver
    grid work."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"source": b["source"].to_numpy(object),
                          "lang": b["lang"].to_numpy(object),
                          "n": np.ones(len(b), np.int64)}) \
            .groupby(["source", "lang"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "lang"], ["n"])
    nn = int(c["n"].sum())
    st = c.groupby("source")["n"].sum()
    lt = c.groupby("lang")["n"].sum()
    cell = {(r["source"], r["lang"]): int(r["n"])
            for _, r in c.iterrows()}
    rows = []
    for src in sorted(st.index):
        t = int(st[src])
        num = 0
        for lang in lt.index:
            n = cell.get((src, lang), 0)
            g = int(lt[lang])
            num += abs(n * (nn - t) - (g - n) * t)
        rows.append({
            "source": src, "n_docs": np.int64(t),
            "dissimilarity": np.float64(num)
            / (2.0 * np.float64(t) * np.float64(nn - t))})
    return pd.DataFrame(rows)


@register("var_cvar", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v - lag(v) OVER (ORDER BY day) AS chg,
                 day
          FROM d),
    l AS (SELECT -chg AS loss, day FROM x WHERE chg IS NOT NULL),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM l),
    r AS (SELECT loss, row_number() OVER (ORDER BY loss, day)
                        AS i
          FROM l),
    q AS (SELECT loss AS var_ FROM r
          WHERE i = CAST(ceil({p} / 100.0 * (SELECT n FROM n))
                         AS BIGINT)),
    es AS (SELECT CAST(count(*) AS BIGINT) AS k,
                  CAST(sum(loss) AS HUGEINT) AS s
           FROM r WHERE i > CAST(ceil({p} / 100.0
                                      * (SELECT n FROM n))
                                 AS BIGINT))
    SELECT (SELECT n FROM n) AS n_changes,
           CAST((SELECT var_ FROM q) AS BIGINT) AS var_cents,
           (SELECT k FROM es) AS n_tail,
           CAST((SELECT s FROM es) AS DOUBLE)
             / CAST((SELECT k FROM es) AS DOUBLE)
             AS cvar_cents""".format(p=_VAR_PCT))
def var_cvar(sf_dir: str):
    """VALUE-AT-RISK and EXPECTED SHORTFALL of day-over-day revenue
    losses: the {p}th-percentile loss (exact order statistic, day
    tie-break) and the mean of the losses STRICTLY beyond it — the
    coherent tail-risk pair (ES is subadditive where VaR is not)
    that turns max_drawdown's single worst path into a
    distributional risk number. Losses are exact integer cents;
    VaR is an exact order statistic and ES one exact-int division.
    Scale plan: bounded day-domain combine; ranking and the tail
    fold are O(days) driver work."""
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
    days = d["day"].to_numpy(np.int64)
    loss = np.array([-(b - a) for a, b in zip(v, v[1:])],
                    np.int64)
    ldays = days[1:]
    n = len(loss)
    order = np.lexsort((ldays, loss))
    k = int(np.ceil(_VAR_PCT / 100.0 * np.float64(n)))
    var_ = int(loss[order][k - 1])
    tail = loss[order][k:]
    return pd.DataFrame({
        "n_changes": [np.int64(n)],
        "var_cents": [np.int64(var_)],
        "n_tail": [np.int64(len(tail))],
        "cvar_cents": [np.float64(int(tail.sum()))
                       / np.float64(len(tail))]})


@register("simpson_paradox", sql="""
    WITH r AS (SELECT l_returnflag AS g,
                      CAST(l_quantity AS BIGINT) AS y,
                      CAST(floor(l_discount * 100 + 0.5)
                           AS BIGINT) AS x
               FROM lineitem),
    st AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(x) AS HUGEINT) AS sx,
                  CAST(sum(y) AS HUGEINT) AS sy,
                  CAST(sum(x * x) AS HUGEINT) AS sxx,
                  CAST(sum(x * y) AS HUGEINT) AS sxy
           FROM r GROUP BY g),
    agg AS (SELECT CAST(sum(n) AS HUGEINT) AS n,
                   CAST(sum(sx) AS HUGEINT) AS sx,
                   CAST(sum(sy) AS HUGEINT) AS sy,
                   CAST(sum(sxx) AS HUGEINT) AS sxx,
                   CAST(sum(sxy) AS HUGEINT) AS sxy
            FROM st),
    sl AS (SELECT g,
                  CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
                  CASE WHEN n * sxy - sx * sy > 0 THEN 1
                       WHEN n * sxy - sx * sy < 0 THEN -1
                       ELSE 0 END AS sgn
           FROM st),
    asl AS (SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
                   CASE WHEN n * sxy - sx * sy > 0 THEN 1
                        WHEN n * sxy - sx * sy < 0 THEN -1
                        ELSE 0 END AS sgn
            FROM agg)
    SELECT sl.g AS stratum, sl.slope AS stratum_slope,
           (SELECT slope FROM asl) AS aggregate_slope,
           CAST(CASE WHEN sl.sgn * (SELECT sgn FROM asl) < 0
                     THEN 1 ELSE 0 END AS BIGINT) AS sign_flip
    FROM sl ORDER BY sl.g""")
def simpson_paradox(sf_dir: str):
    """SIMPSON'S-PARADOX DETECTOR for the discount-quantity slope:
    the aggregate OLS slope against each return-flag stratum's own
    slope, flagging strata whose association REVERSES sign — the
    confounding alarm that says any pooled readout
    (discount_quantity_corr, multi_ols) is lying about the
    within-group relationship. The sign test is the EXACT integer
    sign of the centered cross-moment n*Sxy - Sx*Sy (no float can
    flip it); slopes are shared float divisions of exact big ints.
    Scale plan: per-stratum 5-cell moment partials (bounded
    strata), map-only; the comparison is driver arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity",
                                  "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_quantity"].to_numpy(np.int64).astype(object)
        x = np.floor(b["l_discount"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64).astype(object)
        g = b["l_returnflag"].to_numpy(object)
        rows = []
        for gv in np.unique(g):
            m = g == gv
            rows.append({"g": gv, "n": int(m.sum()),
                         "sx": int(x[m].sum()),
                         "sy": int(y[m].sum()),
                         "sxx": int((x[m] * x[m]).sum()),
                         "sxy": int((x[m] * y[m]).sum())})
        return pd.DataFrame(rows)

    st = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["g"], ["n", "sx", "sy", "sxx", "sxy"], exact_int=True)
    tot = {c: sum(int(v) for v in st[c])
           for c in ("n", "sx", "sy", "sxx", "sxy")}
    anum = tot["n"] * tot["sxy"] - tot["sx"] * tot["sy"]
    aden = tot["n"] * tot["sxx"] - tot["sx"] * tot["sx"]
    aslope = np.float64(anum) / np.float64(aden)
    asgn = 1 if anum > 0 else (-1 if anum < 0 else 0)
    rows = []
    for _, r in st.sort_values("g").iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, sxy = int(r["sxx"]), int(r["sxy"])
        num = n * sxy - sx * sy
        sgn = 1 if num > 0 else (-1 if num < 0 else 0)
        rows.append({
            "stratum": r["g"],
            "stratum_slope": np.float64(num)
            / np.float64(n * sxx - sx * sx),
            "aggregate_slope": aslope,
            "sign_flip": np.int64(1 if sgn * asgn < 0 else 0)})
    return pd.DataFrame(rows)
