# round-5 session-5 additions, batch 9: Bradley-Terry pairwise
# strength of sources from exact histogram win counts, Huber robust
# location via two unrolled IRLS iterations, and PRR
# disproportionality signal detection over the lang x source grid.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)

_HUBER_K = 1.345
_PRR_MIN_A = 3


@register("bt_strength", sql="""
    WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
                      CAST(count(*) AS BIGINT) AS c
               FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
            FROM h GROUP BY 1),
    nn AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM tot),
    vals AS (SELECT DISTINCT x FROM h),
    grid AS (SELECT t.source, v.x, COALESCE(h.c, 0) AS c
             FROM tot t CROSS JOIN vals v
             LEFT JOIN h ON h.source = t.source AND h.x = v.x),
    cum AS (SELECT source, x, c,
                   CAST(sum(c) OVER (PARTITION BY source
                        ORDER BY x) - c AS BIGINT) AS cl
            FROM grid),
    w AS (SELECT a.source,
                 CAST(sum(a.c * (2 * b.cl + b.c)) AS BIGINT) AS w2
          FROM h a JOIN cum b ON a.x = b.x
                             AND b.source <> a.source
          GROUP BY a.source),
    s1 AS (SELECT t.source, t.n, w.w2,
                  CAST(t.n * ((SELECT big_n FROM nn) - t.n)
                       AS BIGINT) AS games,
                  CAST(floor(CAST(w.w2 AS DOUBLE)
                       / CAST(t.n * ((SELECT big_n FROM nn) - t.n)
                              AS DOUBLE)
                       * 1000000.0 + 0.5) AS BIGINT) AS s1m
           FROM tot t JOIN w ON w.source = t.source),
    d AS (SELECT a.source,
                 CAST(sum(CAST(floor(CAST(a.n * b.n AS DOUBLE)
                      / ((CAST(a.s1m AS DOUBLE)
                          + CAST(b.s1m AS DOUBLE)) / 1000000.0)
                      + 0.5) AS BIGINT)) AS BIGINT) AS di
          FROM s1 a JOIN s1 b ON b.source <> a.source
          GROUP BY a.source)
    SELECT s1.source, s1.n AS n_docs, s1.w2 AS wins2,
           s1.s1m AS s1_micro,
           (CAST(s1.w2 AS DOUBLE) / 2.0) / CAST(d.di AS DOUBLE)
             AS bt_strength
    FROM s1 JOIN d ON d.source = s1.source ORDER BY s1.source""")
def bt_strength(sf_dir: str):
    """BRADLEY-TERRY pairwise strength of sources from document-
    length 'matches': every cross-source doc pair is a comparison
    won by the longer document (ties count half), and one
    minorization-maximization update from uniform strengths —
    refined by a second update on the micro-quantized first
    iterate — ranks the sources. The pairwise-preference operator
    behind LLM eval leaderboards, recast so the quadratic pair count
    collapses to EXACT integer wins via per-source histograms over
    the bounded length domain (W2_ij = sum_x h_i(x)*(2*C_j(<x) +
    h_j(x)) — no pair enumeration anywhere). Strengths are shared
    float expressions over exact integer folds; the per-pair MM
    denominators quantize half-up before the integer sum. Scale
    plan: per-batch (source, length) histogram partials — the
    bounded-domain census replaces the quadratic join; the S x S
    driver scan is source-bounded."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"source": b["source"].to_numpy(object),
                          "x": b["n_chars"].to_numpy(np.int64),
                          "c": np.ones(len(b), np.int64)}) \
            .groupby(["source", "x"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "x"], ["c"])
    sources = sorted(h["source"].unique())
    xs = np.sort(h["x"].unique())
    S, X = len(sources), len(xs)
    H = np.zeros((S, X), np.int64)
    si = {s: i for i, s in enumerate(sources)}
    xi = {int(x): i for i, x in enumerate(xs)}
    for _, r in h.iterrows():
        H[si[r["source"]], xi[int(r["x"])]] = int(r["c"])
    CL = np.cumsum(H, axis=1) - H
    opp = 2 * CL + H
    opp_tot = opp.sum(axis=0)
    n = H.sum(axis=1)
    big_n = int(n.sum())
    w2 = np.array([int((H[i] * (opp_tot - opp[i])).sum())
                   for i in range(S)], np.int64)
    games = n * (big_n - n)
    s1m = np.floor(w2.astype(np.float64)
                   / games.astype(np.float64)
                   * 1000000.0 + 0.5).astype(np.int64)
    di = np.zeros(S, np.int64)
    for i in range(S):
        acc = 0
        for j in range(S):
            if j == i:
                continue
            acc += int(np.floor(
                np.float64(int(n[i]) * int(n[j]))
                / ((np.float64(s1m[i]) + np.float64(s1m[j]))
                   / 1000000.0) + 0.5))
        di[i] = acc
    bt = (w2.astype(np.float64) / 2.0) / di.astype(np.float64)
    return pd.DataFrame({
        "source": sources, "n_docs": n, "wins2": w2,
        "s1_micro": s1m, "bt_strength": bt}).sort_values(
        "source", kind="mergesort").reset_index(drop=True)


@register("huber_location", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM d),
    sad AS (SELECT CAST(sum(CAST(floor(
                 CAST(abs(CAST(v AS HUGEINT) * (SELECT n FROM m)
                          - (SELECT s FROM m)) AS DOUBLE)
                 / CAST((SELECT n FROM m) AS DOUBLE) + 0.5)
                 AS BIGINT)) AS BIGINT) AS t FROM d),
    c0 AS (SELECT CAST(floor({k} * (CAST((SELECT t FROM sad)
                                         AS DOUBLE)
                                    / CAST((SELECT n FROM m)
                                           AS DOUBLE)) + 0.5)
                       AS BIGINT) AS c,
                  CAST((SELECT s FROM m) AS DOUBLE)
                    / CAST((SELECT n FROM m) AS DOUBLE) AS mu0),
    i1 AS (SELECT CAST(sum(CAST(floor(
               CASE WHEN CAST(v AS DOUBLE) = (SELECT mu0 FROM c0)
                    THEN 1.0
                    ELSE least(1.0, CAST((SELECT c FROM c0)
                                         AS DOUBLE)
                               / abs(CAST(v AS DOUBLE)
                                     - (SELECT mu0 FROM c0))) END
               * CAST(v AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))
               AS BIGINT) AS swx,
               CAST(sum(CAST(floor(
               CASE WHEN CAST(v AS DOUBLE) = (SELECT mu0 FROM c0)
                    THEN 1.0
                    ELSE least(1.0, CAST((SELECT c FROM c0)
                                         AS DOUBLE)
                               / abs(CAST(v AS DOUBLE)
                                     - (SELECT mu0 FROM c0))) END
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sw
           FROM d),
    m1 AS (SELECT (CAST(swx AS DOUBLE) / 1000.0)
                  / (CAST(sw AS DOUBLE) / 1000000.0) AS mu1
           FROM i1),
    i2 AS (SELECT CAST(sum(CAST(floor(
               CASE WHEN CAST(v AS DOUBLE) = (SELECT mu1 FROM m1)
                    THEN 1.0
                    ELSE least(1.0, CAST((SELECT c FROM c0)
                                         AS DOUBLE)
                               / abs(CAST(v AS DOUBLE)
                                     - (SELECT mu1 FROM m1))) END
               * CAST(v AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))
               AS BIGINT) AS swx,
               CAST(sum(CAST(floor(
               CASE WHEN CAST(v AS DOUBLE) = (SELECT mu1 FROM m1)
                    THEN 1.0
                    ELSE least(1.0, CAST((SELECT c FROM c0)
                                         AS DOUBLE)
                               / abs(CAST(v AS DOUBLE)
                                     - (SELECT mu1 FROM m1))) END
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sw
           FROM d)
    SELECT (SELECT n FROM m) AS n_days,
           (SELECT c FROM c0) AS c_cents,
           (SELECT mu0 FROM c0) AS mu0,
           (SELECT mu1 FROM m1) AS mu1,
           (SELECT (CAST(swx AS DOUBLE) / 1000.0)
                   / (CAST(sw AS DOUBLE) / 1000000.0) FROM i2)
             AS mu2""".format(k=_HUBER_K))
def huber_location(sf_dir: str):
    """HUBER M-ESTIMATOR of daily-revenue location via two unrolled
    IRLS iterations: weights w = min(1, c/|x - mu|) with the tuning
    constant c = 1.345 * mean absolute deviation (quantized to whole
    cents from the exact |x*n - S|/n rational — the levene_test
    policy), then mu' = sum(w*x)/sum(w) — the robust mean that
    downweights spike days instead of letting them drag the level
    (the location counterpart of value_outliers' MAD fences). Both
    weighted sums quantize per-day terms (milli-cents / micro-
    weights) before EXACT integer folds, so each iterate is one
    shared float division; the fixed iteration count makes it
    oracle-expressible as chained CTEs (the pagerank unroll policy).
    Scale plan: per-batch (day, cents) partials through the bounded
    day-domain combine; IRLS runs O(iters x days) on the driver."""
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
    v = [int(x) for x in d["v"]]
    n = len(v)
    s = sum(v)
    sad = sum(int(np.floor(
        np.float64(abs(x * n - s)) / np.float64(n) + 0.5))
        for x in v)
    c = int(np.floor(_HUBER_K * (np.float64(sad) / np.float64(n))
                     + 0.5))
    mu0 = np.float64(s) / np.float64(n)

    def iterate(mu: np.float64):
        swx = sw = 0
        for x in v:
            fx = np.float64(x)
            if fx == mu:
                w = np.float64(1.0)
            else:
                w = min(np.float64(1.0),
                        np.float64(c) / np.abs(fx - mu))
            swx += int(np.floor(w * fx * 1000.0 + 0.5))
            sw += int(np.floor(w * 1000000.0 + 0.5))
        return (np.float64(swx) / 1000.0) \
            / (np.float64(sw) / 1000000.0)

    mu1 = iterate(mu0)
    mu2 = iterate(mu1)
    return pd.DataFrame({
        "n_days": [np.int64(n)], "c_cents": [np.int64(c)],
        "mu0": [np.float64(mu0)], "mu1": [np.float64(mu1)],
        "mu2": [np.float64(mu2)]})


@register("prr_signals", sql="""
    WITH cell AS (SELECT source, lang,
                         CAST(count(*) AS BIGINT) AS a
                  FROM documents GROUP BY 1, 2),
    rs AS (SELECT source, CAST(sum(a) AS BIGINT) AS n_s
           FROM cell GROUP BY source),
    cs AS (SELECT lang, CAST(sum(a) AS BIGINT) AS n_l
           FROM cell GROUP BY lang),
    t AS (SELECT CAST(sum(a) AS BIGINT) AS big_n FROM cell),
    f AS (SELECT c.source, c.lang, c.a, rs.n_s, cs.n_l,
                 (SELECT big_n FROM t) AS big_n
          FROM cell c JOIN rs ON rs.source = c.source
                      JOIN cs ON cs.lang = c.lang
          WHERE c.a >= {ma} AND cs.n_l > c.a
                AND (SELECT big_n FROM t) > rs.n_s),
    p AS (SELECT source, lang, a, n_s, n_l,
                 (CAST(a AS DOUBLE) / CAST(n_s AS DOUBLE))
                 / (CAST(n_l - a AS DOUBLE)
                    / CAST(big_n - n_s AS DOUBLE)) AS prr,
                 sqrt(1.0 / CAST(a AS DOUBLE)
                      - 1.0 / CAST(n_s AS DOUBLE)
                      + 1.0 / CAST(n_l - a AS DOUBLE)
                      - 1.0 / CAST(big_n - n_s AS DOUBLE)) AS se
          FROM f)
    SELECT source, lang, a AS n_docs, prr,
           exp(ln(prr) - 1.96 * se) AS prr_lcl,
           exp(ln(prr) + 1.96 * se) AS prr_ucl,
           CAST(CASE WHEN exp(ln(prr) - 1.96 * se) > 1.0
                     THEN 1 ELSE 0 END AS BIGINT) AS signal
    FROM p ORDER BY source, lang""".format(ma=_PRR_MIN_A))
def prr_signals(sf_dir: str):
    """PRR (proportional reporting ratio) DISPROPORTIONALITY signals
    over the source x language grid: is language L over-represented
    in source S relative to every other source — the
    pharmacovigilance signal-detection operator applied to corpus
    composition drift, with the standard ln-scale 95% CI and the
    'lower bound above 1' signal flag (the inferential upgrade of
    chi2_lang_source's omnibus test). Cells below {ma} reports are
    excluded (the standard minimum). All counts are exact integer
    folds; PRR, its SE and the CI bounds are shared float
    expressions, and the signal flag compares the SAME double
    against 1.0 on both engines. Scale plan: one (source, lang)
    grid combine — bounded cells, map-only partials."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"source": b["source"].to_numpy(object),
                          "lang": b["lang"].to_numpy(object),
                          "a": np.ones(len(b), np.int64)}) \
            .groupby(["source", "lang"], as_index=False).sum()
        g["a"] = g["a"].astype(np.int64)
        return g

    cell = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "lang"], ["a"])
    n_s = cell.groupby("source")["a"].transform("sum") \
        .to_numpy(np.int64)
    n_l = cell.groupby("lang")["a"].transform("sum") \
        .to_numpy(np.int64)
    a = cell["a"].to_numpy(np.int64)
    big_n = int(a.sum())
    keep = (a >= _PRR_MIN_A) & (n_l > a) & (big_n > n_s)
    a, ns, nl = a[keep], n_s[keep], n_l[keep]
    sub = cell[keep]
    fa = a.astype(np.float64)
    fns = ns.astype(np.float64)
    fnl = nl.astype(np.float64)
    fbn = np.float64(big_n)
    prr = (fa / fns) / ((fnl - fa) / (fbn - fns))
    se = np.sqrt(1.0 / fa - 1.0 / fns + 1.0 / (fnl - fa)
                 - 1.0 / (fbn - fns))
    lcl = np.exp(np.log(prr) - 1.96 * se)
    ucl = np.exp(np.log(prr) + 1.96 * se)
    return pd.DataFrame({
        "source": sub["source"].to_numpy(object),
        "lang": sub["lang"].to_numpy(object),
        "n_docs": a, "prr": prr, "prr_lcl": lcl, "prr_ucl": ucl,
        "signal": (lcl > 1.0).astype(np.int64)}).sort_values(
        ["source", "lang"], kind="mergesort").reset_index(drop=True)
