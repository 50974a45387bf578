# round-5 session-5 additions, batch 97: Ewens/CRP concentration
# estimate by quantized Newton, the Cantelli/Chebyshev tail-bound
# audit, and CLT skewness decay under aggregation.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...functions.hashing import tokens_flat
from ...stages.partition import partition_map
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue
from .q157_session5_additions_95 import _tdiv


@register("crp_theta", sql="""
    WITH d AS (SELECT trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT term) AS BIGINT) AS k
          FROM w),
    seq AS (SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS i
            FROM w),
    s1 AS (SELECT
        CAST(sum(CAST(floor(CAST((SELECT k FROM t) AS DOUBLE)
             / (CAST((SELECT k FROM t) AS DOUBLE)
                + CAST(i AS DOUBLE)) * 1000000000.0 + 0.5)
             AS BIGINT)) AS HUGEINT)
        - CAST((SELECT k FROM t) AS HUGEINT) * 1000000000
          AS f,
        CAST(sum(CAST(floor(CAST(i AS DOUBLE)
             / ((CAST((SELECT k FROM t) AS DOUBLE)
                 + CAST(i AS DOUBLE))
                * (CAST((SELECT k FROM t) AS DOUBLE)
                   + CAST(i AS DOUBLE))) * 1000000000.0 + 0.5)
             AS BIGINT)) AS HUGEINT) AS fp
        FROM seq),
    b1 AS (SELECT CAST((SELECT k FROM t) AS HUGEINT) * 1000000
                  - CASE WHEN f >= 0
                    THEN f * 1000000 // fp
                    ELSE -((-f) * 1000000 // fp) END AS th
           FROM s1),
    s2 AS (SELECT
        CAST(sum(CAST(floor(
             (CAST((SELECT th FROM b1) AS DOUBLE) / 1000000.0)
             / ((CAST((SELECT th FROM b1) AS DOUBLE)
                 / 1000000.0) + CAST(i AS DOUBLE))
             * 1000000000.0 + 0.5) AS BIGINT)) AS HUGEINT)
        - CAST((SELECT k FROM t) AS HUGEINT) * 1000000000
          AS f,
        CAST(sum(CAST(floor(CAST(i AS DOUBLE)
             / (((CAST((SELECT th FROM b1) AS DOUBLE)
                  / 1000000.0) + CAST(i AS DOUBLE))
                * ((CAST((SELECT th FROM b1) AS DOUBLE)
                    / 1000000.0) + CAST(i AS DOUBLE)))
             * 1000000000.0 + 0.5) AS BIGINT)) AS HUGEINT) AS fp
        FROM seq),
    b2 AS (SELECT (SELECT th FROM b1)
                  - CASE WHEN f >= 0
                    THEN f * 1000000 // fp
                    ELSE -((-f) * 1000000 // fp) END AS th
           FROM s2)
    SELECT (SELECT n FROM t) AS n_tokens,
           (SELECT k FROM t) AS vocab,
           CAST((SELECT th FROM b2) AS DOUBLE) / 1000000.0
             AS ewens_theta""")
def crp_theta(sf_dir: str):
    """EWENS / CHINESE-RESTAURANT concentration parameter for the
    corpus vocabulary: solve E[K] = sum_{i<N} theta/(theta+i) = K
    by two Newton steps from theta_0 = K — the
    population-genetics / Bayesian-nonparametrics rate at which
    NEW types keep arriving, the generative counterpart of
    heaps_fit's curve fit (theta is what you plug into a CRP to
    simulate a corpus with this vocabulary growth). Each of the N
    harmonic terms is a shared float on the exact iterate,
    nano-quantized before the exact fold (dp_noisy policy), and
    each Newton increment is a sign-magnitude exact integer
    division, so the iterate is bit-identical across engines.
    Scale plan: token counts fold map-only; the harmonic sums are
    one vectorized pass per step (a map_batches fold over the
    index range at fleet scale)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        g = pd.DataFrame({
            "term": vals.to_numpy(zero_copy_only=False),
            "c": np.ones(int(k.sum()), np.int64)}) \
            .groupby("term", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    def census(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("term", as_index=False)["c"].sum()
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": [int(a["c"].astype(object).sum())],
            "k": np.array([len(a)], np.int64)})

    t = _combine_partials(
        partition_map(ds.map_batches(partial,
                                     batch_format="pandas"),
                      ["term"], census, 16),
        ["j"], ["n", "k"], exact_int=True)
    n = int(t["n"].iloc[0])
    k = int(t["k"].iloc[0])
    i = np.arange(n, dtype=np.float64)

    def newton(th_float):
        f = int(np.floor(th_float / (th_float + i)
                         * 1000000000.0 + 0.5)
                .astype(np.int64).sum()) - k * 1000000000
        fp = int(np.floor(i / ((th_float + i) * (th_float + i))
                          * 1000000000.0 + 0.5)
                 .astype(np.int64).sum())
        return _tdiv(f * 1000000, fp)

    th1 = k * 1000000 - newton(np.float64(k))
    th2 = th1 - newton(np.float64(th1) / 1000000.0)
    return pd.DataFrame({
        "n_tokens": [np.int64(n)], "vocab": [np.int64(k)],
        "ewens_theta": [np.float64(th2) / 1000000.0]})


@register("cantelli_audit", sql="""
    WITH """ + _DAILY_SQL + """,
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                   AS s2
          FROM d),
    z AS (SELECT (SELECT n FROM t) * v - (SELECT s FROM t)
                   AS dd
          FROM d),
    ks AS (SELECT CAST(k AS HUGEINT) AS k
           FROM (VALUES (1), (2), (3)) t(k)),
    c AS (SELECT ks.k,
                 CAST(sum(CASE WHEN z.dd > 0
                          AND z.dd * z.dd >= ks.k * ks.k
                              * ((SELECT n FROM t)
                                 * (SELECT s2 FROM t)
                                 - (SELECT s FROM t)
                                   * (SELECT s FROM t))
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS up,
                 CAST(sum(CASE WHEN z.dd * z.dd >= ks.k * ks.k
                              * ((SELECT n FROM t)
                                 * (SELECT s2 FROM t)
                                 - (SELECT s FROM t)
                                   * (SELECT s FROM t))
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS bo
          FROM ks JOIN z ON TRUE GROUP BY ks.k)
    SELECT CAST(k AS BIGINT) AS k, up AS n_above_k_sigma,
           bo AS n_beyond_k_sigma,
           CAST(up AS DOUBLE)
             / CAST((SELECT n FROM t) AS DOUBLE)
             AS upper_tail_rate,
           1.0 / (1.0 + CAST(k AS DOUBLE) * CAST(k AS DOUBLE))
             AS cantelli_bound,
           CAST(bo AS DOUBLE)
             / CAST((SELECT n FROM t) AS DOUBLE)
             AS two_sided_rate,
           1.0 / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE))
             AS chebyshev_bound
    FROM c ORDER BY k""")
def cantelli_audit(sf_dir: str):
    """CANTELLI / CHEBYSHEV TAIL-BOUND AUDIT of daily revenue:
    the exact share of days beyond k sigma (one- and two-sided,
    k = 1, 2, 3) against the distribution-free bounds 1/(1+k^2)
    and 1/k^2 — how much tail room the distribution actually
    leaves under the worst-case guarantees every alerting
    threshold silently relies on (rates near the bound mean the
    data is nearly the adversarial two-point distribution and
    sigma-based alerts will fire at their theoretical maximum).
    The k-sigma test is the EXACT integer comparison D^2 >= k^2 *
    (n*S2 - S^2) on scaled deviations D = n*v - S — no square
    roots anywhere; rates and bounds are shared float
    expressions. Scale plan: bounded day-domain combine; the
    censuses are map-only predicates."""
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    s = sum(v)
    s2 = sum(x * x for x in v)
    var_scaled = n * s2 - s * s
    rows = []
    for k in (1, 2, 3):
        up = both = 0
        for x in v:
            dd = n * x - s
            if dd * dd >= k * k * var_scaled:
                both += 1
                if dd > 0:
                    up += 1
        rows.append((k, up, both))
    return pd.DataFrame({
        "k": np.array([r[0] for r in rows], np.int64),
        "n_above_k_sigma": np.array([r[1] for r in rows],
                                    np.int64),
        "n_beyond_k_sigma": np.array([r[2] for r in rows],
                                     np.int64),
        "upper_tail_rate": np.array(
            [np.float64(r[1]) / np.float64(n) for r in rows],
            np.float64),
        "cantelli_bound": np.array(
            [1.0 / (1.0 + np.float64(r[0]) * np.float64(r[0]))
             for r in rows], np.float64),
        "two_sided_rate": np.array(
            [np.float64(r[2]) / np.float64(n) for r in rows],
            np.float64),
        "chebyshev_bound": np.array(
            [1.0 / (np.float64(r[0]) * np.float64(r[0]))
             for r in rows], np.float64)})


@register("clt_aggregation", sql="""
    WITH """ + _DAILY_SQL + """,
    lv AS (SELECT CAST(w AS BIGINT) AS w
           FROM (VALUES (1), (7), (30)) t(w)),
    g AS (SELECT lv.w, d.day // lv.w AS bucket,
                 CAST(CAST(sum(v) AS HUGEINT) // 100
                      AS HUGEINT) AS dv
          FROM lv JOIN d ON TRUE
          GROUP BY 1, 2),
    m AS (SELECT w, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(dv) AS HUGEINT) AS s,
                 CAST(sum(dv * dv) AS HUGEINT) AS s2,
                 CAST(sum(dv * dv * dv) AS HUGEINT) AS s3
          FROM g GROUP BY w)
    SELECT CAST(w AS BIGINT) AS window_days,
           CAST(n AS BIGINT) AS n_periods,
           CAST(n * n * s3 - 3 * n * s2 * s + 2 * s * s * s
                AS DOUBLE)
           / (sqrt(CAST(n * s2 - s * s AS DOUBLE))
              * sqrt(CAST(n * s2 - s * s AS DOUBLE))
              * sqrt(CAST(n * s2 - s * s AS DOUBLE)))
             AS skewness
    FROM m ORDER BY w""")
def clt_aggregation(sf_dir: str):
    """CLT SKEWNESS DECAY under aggregation: the third
    standardized moment of revenue summed at daily, weekly and
    monthly grain — for independent-ish days skewness must shrink
    like 1/sqrt(window) (the central limit theorem made
    measurable), so decay SLOWER than that exposes the serial
    dependence and heavy tails that invalidate normal-theory
    intervals at coarse grain (the aggregation-side complement of
    jarque_bera's single-scale test). Bucket sums are exact
    integer dollars; the scaled central moments n^2*S3 - 3nS2S +
    2S^3 and n*S2 - S^2 are exact big ints whose n-powers cancel,
    leaving one shared float expression per row. Scale plan: the
    bounded (window, bucket) combine; O(1) driver arithmetic per
    level."""
    days, v = _daily_revenue(sf_dir)
    rows = []
    for w in (1, 7, 30):
        agg = {}
        for day, x in zip(days, v):
            b = day // w
            agg[b] = agg.get(b, 0) + x
        dv = [x // 100 for x in agg.values()]
        n = len(dv)
        s = sum(dv)
        s2 = sum(x * x for x in dv)
        s3 = sum(x * x * x for x in dv)
        num = n * n * s3 - 3 * n * s2 * s + 2 * s * s * s
        den = np.sqrt(np.float64(n * s2 - s * s))
        rows.append((w, n, np.float64(num) / (den * den * den)))
    return pd.DataFrame({
        "window_days": np.array([r[0] for r in rows], np.int64),
        "n_periods": np.array([r[1] for r in rows], np.int64),
        "skewness": np.array([r[2] for r in rows], np.float64)})
