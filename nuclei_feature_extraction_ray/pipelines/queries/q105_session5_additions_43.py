# round-5 session-5 additions, batch 43: pinball-loss evaluation of
# a naive quantile forecast, James-Stein shrinkage of per-source
# means, and the Breslow-Day odds-ratio homogeneity test.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)

_PB_QS = (10, 50, 90)          # percent levels
_BD_CH = (250, 350)
_BD_TK = 55
_BD_DS = 25


@register("pinball_loss", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    tr AS (SELECT v, row_number() OVER (ORDER BY v, day) AS i,
                  CAST((SELECT count(*) FROM d
                        WHERE day <= (SELECT min(day) FROM d)
                          + ((SELECT max(day) FROM d)
                             - (SELECT min(day) FROM d)) // 2)
                       AS BIGINT) AS nt
           FROM d WHERE day <= (SELECT min(day) FROM d)
                          + ((SELECT max(day) FROM d)
                             - (SELECT min(day) FROM d)) // 2),
    qs AS (SELECT CAST(q AS BIGINT) AS q,
                  (SELECT v FROM (
                     SELECT v, row_number() OVER (ORDER BY v)
                              AS i
                     FROM tr) r
                   WHERE r.i = CAST(ceil(q / 100.0
                       * (SELECT max(nt) FROM tr)) AS BIGINT))
                    AS pred
           FROM (SELECT unnest([{qs}]) AS q)),
    te AS (SELECT v FROM d
           WHERE day > (SELECT min(day) FROM d)
                       + ((SELECT max(day) FROM d)
                          - (SELECT min(day) FROM d)) // 2),
    pl AS (SELECT qs.q, qs.pred,
                  CAST(sum(CASE WHEN te.v >= qs.pred
                           THEN qs.q * (te.v - qs.pred)
                           ELSE (100 - qs.q)
                                * (qs.pred - te.v) END)
                       AS HUGEINT) AS loss100,
                  CAST(count(*) AS BIGINT) AS nt
           FROM qs CROSS JOIN te GROUP BY qs.q, qs.pred)
    SELECT q AS quantile_pct, pred AS predicted_cents,
           CAST(loss100 AS DOUBLE) / 100.0 / CAST(nt AS DOUBLE)
             AS mean_pinball_loss_cents
    FROM pl ORDER BY q""".format(
    qs=", ".join(str(q) for q in _PB_QS)))
def pinball_loss(sf_dir: str):
    """PINBALL (QUANTILE) LOSS evaluation of a naive quantile
    forecast: the first half of the day span fixes the p10/p50/p90
    order statistics as flat predictions, and the second half
    scores them with the asymmetric pinball loss — the proper
    scoring rule that makes quantile forecasts comparable (the
    quantile counterpart of forecast_backtest's MAPE and
    conformal_interval's coverage). Predictions are exact order
    statistics; each loss term q*(y-p) or (100-q)*(p-y) is kept in
    EXACT integer hundredths and folded exactly — only the final
    per-day mean divides. Scale plan: bounded day-domain combine;
    train-half ranking and the test-half hinge folds are O(days)
    driver work."""
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
    day = d["day"].to_numpy(np.int64)
    v = np.array([int(x) for x in d["v"]], np.int64)
    mid = int(day.min()) + (int(day.max()) - int(day.min())) // 2
    tr = np.sort(v[day <= mid])
    te = v[day > mid]
    nt = len(tr)
    rows = []
    for q in _PB_QS:
        k = int(np.ceil(q / 100.0 * np.float64(nt)))
        pred = int(tr[k - 1])
        loss100 = 0
        for y in te:
            y = int(y)
            if y >= pred:
                loss100 += q * (y - pred)
            else:
                loss100 += (100 - q) * (pred - y)
        rows.append({
            "quantile_pct": np.int64(q),
            "predicted_cents": np.int64(pred),
            "mean_pinball_loss_cents":
                np.float64(loss100) / 100.0
                / np.float64(len(te))})
    return pd.DataFrame(rows)


@register("james_stein", sql="""
    WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(n_chars) AS BIGINT) AS s,
                      CAST(sum(CAST(n_chars AS HUGEINT)
                               * n_chars) AS HUGEINT) AS s2
               FROM documents GROUP BY source),
    q AS (SELECT source, n,
                 CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS mm,
                 CAST(s2 AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE) AS wss
          FROM g),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(mm) AS HUGEINT) AS smm,
                 CAST(sum(CAST(mm AS HUGEINT) * mm) AS HUGEINT)
                   AS smm2,
                 CAST(sum(wss) AS DOUBLE) AS wss_tot,
                 CAST(sum(n) AS BIGINT) AS ntot,
                 CAST(min(n) AS BIGINT) AS nmin
          FROM q),
    f AS (SELECT k, smm, wss_tot, ntot, nmin,
                 (wss_tot / CAST(ntot - k AS DOUBLE))
                 / CAST(nmin AS DOUBLE)
                 * 1000000000000.0 AS sig2_micro2,
                 CAST(smm2 AS DOUBLE)
                 - CAST(smm AS DOUBLE) * CAST(smm AS DOUBLE)
                   / CAST(k AS DOUBLE) AS ss_micro2
          FROM t),
    sh AS (SELECT k,
                  greatest(0.0, 1.0 - CAST(k - 3 AS DOUBLE)
                           * sig2_micro2 / ss_micro2)
                    AS shrink
           FROM f)
    SELECT q.source, q.n AS n_docs,
           CAST(q.mm AS DOUBLE) / 1000000.0 AS raw_mean,
           (SELECT shrink FROM sh) AS shrink_factor,
           (CAST((SELECT smm FROM t) AS DOUBLE)
            / CAST((SELECT k FROM t) AS DOUBLE)
            + (SELECT shrink FROM sh)
              * (CAST(q.mm AS DOUBLE)
                 - CAST((SELECT smm FROM t) AS DOUBLE)
                   / CAST((SELECT k FROM t) AS DOUBLE)))
           / 1000000.0 AS js_mean
    FROM q ORDER BY q.source""")
def james_stein(sf_dir: str):
    """JAMES-STEIN SHRINKAGE of per-source mean document lengths
    toward the grand mean: factor 1 - (k-3) sigma^2 / sum
    (m_i - mbar)^2 (positive-part, with sigma^2 the pooled within
    variance over the SMALLEST source size — the documented
    conservative plug-in), the estimator that uniformly dominates
    raw group means for k >= 4 and the theory underneath every
    empirical-Bayes encoder here (ctr_shrinkage, target_encode).
    Source means quantize to micro units (exact ints); the
    between-mean scatter folds exactly on those; the factor and
    shrunk means are shared float expressions. Scale plan:
    per-source 3-cell moment partials; O(sources) driver
    arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["n_chars"].to_numpy(np.int64).astype(object)
        g = pd.DataFrame({
            "source": b["source"].to_numpy(object),
            "n": np.ones(len(b), np.int64),
            "s": b["n_chars"].to_numpy(np.int64)}) \
            .groupby("source", as_index=False).sum()
        g2 = pd.DataFrame({
            "source": b["source"].to_numpy(object),
            "s2": x * x}).groupby("source",
                                  as_index=False).sum()
        out = g.merge(g2, on="source")
        for c in ("n", "s"):
            out[c] = out[c].astype(np.int64)
        return out

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["n", "s", "s2"], exact_int=True)
    mm = {}
    wss_tot = np.float64(0.0)
    ntot = 0
    nmin = None
    for _, r in g.iterrows():
        n, s, s2 = int(r["n"]), int(r["s"]), int(r["s2"])
        mm[r["source"]] = int(np.floor(
            np.float64(s) / np.float64(n) * 1000000.0 + 0.5))
        wss_tot += np.float64(s2) \
            - np.float64(s) * np.float64(s) / np.float64(n)
        ntot += n
        nmin = n if nmin is None else min(nmin, n)
    k = len(mm)
    smm = sum(mm.values())
    smm2 = sum(v * v for v in mm.values())
    sig2 = (wss_tot / np.float64(ntot - k)) / np.float64(nmin) \
        * 1000000000000.0
    ss = np.float64(smm2) \
        - np.float64(smm) * np.float64(smm) / np.float64(k)
    shrink = max(np.float64(0.0),
                 1.0 - np.float64(k - 3) * sig2 / ss)
    gbar = np.float64(smm) / np.float64(k)
    rows = []
    nn = {r["source"]: int(r["n"]) for _, r in g.iterrows()}
    for src in sorted(mm):
        rows.append({
            "source": src, "n_docs": np.int64(nn[src]),
            "raw_mean": np.float64(mm[src]) / 1000000.0,
            "shrink_factor": np.float64(shrink),
            "js_mean": (gbar + shrink * (np.float64(mm[src])
                                         - gbar)) / 1000000.0})
    return pd.DataFrame(rows)


@register("breslow_day", sql="""
    WITH lab AS (SELECT
        CASE WHEN n_chars < {b0} THEN 0
             WHEN n_chars < {b1} THEN 1 ELSE 2 END AS stratum,
        CASE WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+')) END AS BIGINT) >= {tk}
             THEN 1 ELSE 0 END AS x,
        CASE WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(list_distinct(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+'))) END AS BIGINT) >= {ds}
             THEN 1 ELSE 0 END AS y
        FROM documents),
    s AS (SELECT stratum,
                 CAST(sum(x * y) AS BIGINT) AS a,
                 CAST(sum(x * (1 - y)) AS BIGINT) AS b,
                 CAST(sum((1 - x) * y) AS BIGINT) AS c,
                 CAST(sum((1 - x) * (1 - y)) AS BIGINT) AS d
          FROM lab GROUP BY stratum),
    mh AS (SELECT CAST(sum(CAST(a AS DOUBLE) * d
                       / CAST(a + b + c + d AS DOUBLE))
                       AS DOUBLE) AS r,
                  CAST(sum(CAST(b AS DOUBLE) * c
                       / CAST(a + b + c + d AS DOUBLE))
                       AS DOUBLE) AS s_
           FROM s),
    bd AS (SELECT s.stratum, s.a,
                  (SELECT r / s_ FROM mh) AS orr,
                  CAST(s.a + s.b AS DOUBLE) AS n1,
                  CAST(s.c + s.d AS DOUBLE) AS n2,
                  CAST(s.a + s.c AS DOUBLE) AS m1
           FROM s),
    roots AS (SELECT stratum, a, orr, n1, n2, m1,
                  ((n1 + m1) * orr + (n2 - m1)
                   - sqrt(((n1 + m1) * orr + (n2 - m1))
                          * ((n1 + m1) * orr + (n2 - m1))
                          - 4.0 * (orr - 1.0) * orr * n1 * m1))
                  / (2.0 * (orr - 1.0)) AS ae
              FROM bd),
    q AS (SELECT CAST(sum(CASE WHEN n1 > 0 AND n2 > 0
                               AND m1 > 0 AND n1 + n2 - m1 > 0
                          THEN CAST(floor(
                 (CAST(a AS DOUBLE) - ae)
                 * (CAST(a AS DOUBLE) - ae)
                 / (1.0 / (1.0 / ae + 1.0 / (n1 - ae)
                           + 1.0 / (m1 - ae)
                           + 1.0 / (n2 - m1 + ae)))
                 * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END)
                 AS BIGINT) AS chi_micro,
                 CAST(count(*) AS BIGINT) AS k
          FROM roots)
    SELECT (SELECT k FROM q) AS n_strata,
           (SELECT r / s_ FROM mh) AS or_mh,
           (SELECT chi_micro FROM q) AS chi_sum_micro,
           CAST((SELECT chi_micro FROM q) AS DOUBLE) / 1000000.0
             AS breslow_day_chi2""".format(
    b0=_BD_CH[0], b1=_BD_CH[1], tk=_BD_TK, ds=_BD_DS))
def breslow_day(sf_dir: str):
    """BRESLOW-DAY HOMOGENEITY TEST: is the odds ratio between the
    token-flag and distinct-token-flag the SAME in every
    char-length stratum? The validity gate for mantel_haenszel's
    pooled OR (pooling heterogeneous strata is meaningless): each
    stratum's expected cell under the common MH odds ratio solves
    the standard quadratic in closed form (smaller root), the
    variance is the harmonic sum of expected cells, and the
    chi-square terms — built entirely from identical doubles over
    exact integer margins — quantize to micro units half-up before
    the fold; strata with an empty margin contribute exactly 0 on
    both engines. Scale plan: map-only 4-cell-per-stratum confusion
    partials (bounded grid); the quadratic solve is O(strata)
    driver arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["n_chars", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        doc = np.repeat(np.arange(len(b), dtype=np.int64), k)
        dis = pd.DataFrame(
            {"doc": doc,
             "term": vals.to_numpy(zero_copy_only=False)}) \
            .drop_duplicates().groupby("doc").size() \
            .reindex(np.arange(len(b)), fill_value=0) \
            .to_numpy(np.int64)
        nc = b["n_chars"].to_numpy(np.int64)
        st = np.where(nc < _BD_CH[0], 0,
                      np.where(nc < _BD_CH[1], 1, 2))
        x = (k >= _BD_TK).astype(np.int64)
        y = (dis >= _BD_DS).astype(np.int64)
        g = pd.DataFrame({
            "stratum": st.astype(np.int64),
            "a": x * y, "b": x * (1 - y), "c": (1 - x) * y,
            "d": (1 - x) * (1 - y)}) \
            .groupby("stratum", as_index=False).sum()
        for col in ("a", "b", "c", "d"):
            g[col] = g[col].astype(np.int64)
        return g

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["stratum"], ["a", "b", "c", "d"]).sort_values("stratum") \
        .reset_index(drop=True)
    r = np.float64(0.0)
    s_ = np.float64(0.0)
    for _, row in s.iterrows():
        a, b = int(row["a"]), int(row["b"])
        c, d = int(row["c"]), int(row["d"])
        t = np.float64(a + b + c + d)
        r += np.float64(a) * np.float64(d) / t
        s_ += np.float64(b) * np.float64(c) / t
    orr = r / s_
    chi = 0
    for _, row in s.iterrows():
        a = np.float64(int(row["a"]))
        n1 = np.float64(int(row["a"]) + int(row["b"]))
        n2 = np.float64(int(row["c"]) + int(row["d"]))
        m1 = np.float64(int(row["a"]) + int(row["c"]))
        if not (n1 > 0 and n2 > 0 and m1 > 0
                and n1 + n2 - m1 > 0):
            continue   # degenerate stratum: oracle CASE emits 0
        bq = (n1 + m1) * orr + (n2 - m1)
        ae = (bq - np.sqrt(bq * bq
                           - 4.0 * (orr - 1.0) * orr * n1 * m1)) \
            / (2.0 * (orr - 1.0))
        var = 1.0 / (1.0 / ae + 1.0 / (n1 - ae)
                     + 1.0 / (m1 - ae) + 1.0 / (n2 - m1 + ae))
        chi += int(np.floor((a - ae) * (a - ae) / var
                            * 1000000.0 + 0.5))
    return pd.DataFrame({
        "n_strata": [np.int64(len(s))],
        "or_mh": [np.float64(orr)],
        "chi_sum_micro": [np.int64(chi)],
        "breslow_day_chi2": [np.float64(chi) / 1000000.0]})
