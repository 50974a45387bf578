# round-5 session-5 additions, batch 95: Tukey median polish on the
# weekday-by-month grid, generalized-ESD iterative outliers, and the
# half-sample robust mode.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's //."""
    return (a // b) if (a >= 0) == (b > 0) else -((-a) // b)


@register("median_polish", sql="""
    WITH """ + _DAILY_SQL + """,
    grid AS (SELECT CAST((day + 4) % 7 AS BIGINT) AS w,
                    CAST((day // 30) % 12 AS BIGINT) AS mo,
                    CAST(sum(v) AS HUGEINT) AS v
             FROM d GROUP BY 1, 2),
    r1 AS (SELECT w, mo, v,
                  row_number() OVER (PARTITION BY w
                      ORDER BY v, mo) AS rk
           FROM grid),
    rm1 AS (SELECT w, (max(CASE WHEN rk = 6 THEN v END)
                       + max(CASE WHEN rk = 7 THEN v END)) // 2
                     AS med
            FROM r1 GROUP BY w),
    g1 AS (SELECT r1.w, r1.mo, r1.v - rm1.med AS v
           FROM r1 JOIN rm1 ON rm1.w = r1.w),
    c1 AS (SELECT w, mo, v,
                  row_number() OVER (PARTITION BY mo
                      ORDER BY v, w) AS rk
           FROM g1),
    cm1 AS (SELECT mo, max(CASE WHEN rk = 4 THEN v END) AS med
            FROM c1 GROUP BY mo),
    g2 AS (SELECT c1.w, c1.mo, c1.v - cm1.med AS v
           FROM c1 JOIN cm1 ON cm1.mo = c1.mo),
    r2 AS (SELECT w, mo, v,
                  row_number() OVER (PARTITION BY w
                      ORDER BY v, mo) AS rk
           FROM g2),
    rm2 AS (SELECT w, (max(CASE WHEN rk = 6 THEN v END)
                       + max(CASE WHEN rk = 7 THEN v END)) // 2
                     AS med
            FROM r2 GROUP BY w),
    g3 AS (SELECT r2.w, r2.mo, r2.v - rm2.med AS v
           FROM r2 JOIN rm2 ON rm2.w = r2.w),
    c2 AS (SELECT w, mo, v,
                  row_number() OVER (PARTITION BY mo
                      ORDER BY v, w) AS rk
           FROM g3),
    cm2 AS (SELECT mo, max(CASE WHEN rk = 4 THEN v END) AS med
            FROM c2 GROUP BY mo),
    g4 AS (SELECT c2.w, c2.mo, c2.v - cm2.med AS v
           FROM c2 JOIN cm2 ON cm2.mo = c2.mo),
    re AS (SELECT rm1.w, rm1.med + rm2.med AS eff
           FROM rm1 JOIN rm2 ON rm2.w = rm1.w),
    ce AS (SELECT cm1.mo, cm1.med + cm2.med AS eff
           FROM cm1 JOIN cm2 ON cm2.mo = cm1.mo)
    SELECT CAST((SELECT count(*) FROM grid) AS BIGINT)
             AS n_cells,
           CAST((SELECT max(eff) - min(eff) FROM re)
                AS DOUBLE) / 100.0 AS weekday_effect_range,
           CAST((SELECT max(eff) - min(eff) FROM ce)
                AS DOUBLE) / 100.0 AS month_effect_range,
           CAST((SELECT max(abs(v)) FROM g4) AS DOUBLE)
             / 100.0 AS max_abs_residual""")
def median_polish(sf_dir: str):
    """TUKEY MEDIAN POLISH of the weekday x month revenue grid
    (two full row/column sweeps): alternately subtract row and
    column medians to decompose the 7x12 table into weekday
    effects, month effects, and residuals — the robust two-way
    decomposition that twoway_anova does with means (one freak
    day corrupts a mean-based effect; polish shrugs it off), with
    the largest residual pointing at the genuinely anomalous
    weekday-month cell. Cell totals are exact integers;
    even-count medians use the integer (a+b)//2 with DuckDB's
    truncation semantics mirrored exactly in the engine; every
    sweep stays in exact integer arithmetic. Scale plan: bounded
    84-cell combine; the sweeps are O(1) driver work."""
    days, v = _daily_revenue(sf_dir)
    grid = {}
    for day, x in zip(days, v):
        key = ((day + 4) % 7, (day // 30) % 12)
        grid[key] = grid.get(key, 0) + x
    ws = sorted(set(k[0] for k in grid))
    mos = sorted(set(k[1] for k in grid))
    g = dict(grid)

    def med_even(vals):  # 12 values: ranks 6,7 of (v, tie) order
        s = sorted(vals)
        return _tdiv(s[5] + s[6], 2)

    def med_odd(vals):  # 7 values
        return sorted(vals)[3]

    row_eff = {w: 0 for w in ws}
    col_eff = {m: 0 for m in mos}
    for _ in range(2):
        for w in ws:
            med = med_even([g[(w, m)] for m in mos])
            row_eff[w] += med
            for m in mos:
                g[(w, m)] -= med
        for m in mos:
            med = med_odd([g[(w, m)] for w in ws])
            col_eff[m] += med
            for w in ws:
                g[(w, m)] -= med
    return pd.DataFrame({
        "n_cells": [np.int64(len(grid))],
        "weekday_effect_range": [
            np.float64(max(row_eff.values())
                       - min(row_eff.values())) / 100.0],
        "month_effect_range": [
            np.float64(max(col_eff.values())
                       - min(col_eff.values())) / 100.0],
        "max_abs_residual": [
            np.float64(max(abs(x) for x in g.values()))
            / 100.0]})


@register("esd_outliers", sql="""
    WITH """ + _DAILY_SQL + """,
    t1 AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(v) AS HUGEINT) AS s FROM d),
    w1 AS (SELECT day, v FROM d
           ORDER BY abs(CAST(v AS HUGEINT) * (SELECT n FROM t1)
                        - (SELECT s FROM t1)) DESC, day
           LIMIT 1),
    d2 AS (SELECT day, v FROM d
           WHERE day <> (SELECT day FROM w1)),
    t2 AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(v) AS HUGEINT) AS s FROM d2),
    w2 AS (SELECT day, v FROM d2
           ORDER BY abs(CAST(v AS HUGEINT) * (SELECT n FROM t2)
                        - (SELECT s FROM t2)) DESC, day
           LIMIT 1),
    d3 AS (SELECT day, v FROM d2
           WHERE day <> (SELECT day FROM w2)),
    t3 AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(v) AS HUGEINT) AS s FROM d3),
    w3 AS (SELECT day, v FROM d3
           ORDER BY abs(CAST(v AS HUGEINT) * (SELECT n FROM t3)
                        - (SELECT s FROM t3)) DESC, day
           LIMIT 1)
    SELECT CAST(r AS BIGINT) AS round,
           day AS outlier_day,
           CAST(v AS BIGINT) AS outlier_cents
    FROM (SELECT 1 AS r, day, v FROM w1
          UNION ALL SELECT 2, day, v FROM w2
          UNION ALL SELECT 3, day, v FROM w3)
    ORDER BY r""")
def esd_outliers(sf_dir: str):
    """GENERALIZED ESD (iterative Grubbs) top-3 outlier days:
    repeatedly remove the day most deviant from the CURRENT mean
    and recompute — the iterative-removal scheme (the core of the
    S-H-ESD production anomaly detector) that fixes single-pass
    Grubbs' masking problem: two adjacent spikes hide each other
    from one global test but fall in successive ESD rounds. Each
    round's argmax is the exact integer deviation |v*n - S| with
    earliest-day tie-break, recomputed on the exactly-reduced
    population. Scale plan: bounded day-domain combine; the three
    rounds are O(days) driver scans."""
    days, v = _daily_revenue(sf_dir)
    pool = list(zip(days, v))
    rows = []
    for r in range(1, 4):
        n = len(pool)
        s = sum(x for _, x in pool)
        best = min(pool, key=lambda p: (-abs(p[1] * n - s),
                                        p[0]))
        rows.append((r, best[0], best[1]))
        pool = [p for p in pool if p[0] != best[0]]
    return pd.DataFrame({
        "round": np.array([r[0] for r in rows], np.int64),
        "outlier_day": np.array([r[1] for r in rows], np.int64),
        "outlier_cents": np.array([r[2] for r in rows],
                                  np.int64)})


@register("half_sample_mode", sql="""
    WITH RECURSIVE """ + _DAILY_SQL + """,
    arr AS (SELECT list(CAST(v AS HUGEINT) ORDER BY v) AS vl,
                   CAST(count(*) AS BIGINT) AS n
            FROM d),
    dp AS (
        SELECT CAST(1 AS BIGINT) AS lo,
               (SELECT n FROM arr) AS hi
        UNION ALL
        SELECT dp.lo
               + list_position(
                     list_transform(
                         range(1, dp.hi - dp.lo + 1
                                  - (dp.hi - dp.lo + 2) // 2
                                  + 2),
                         k -> arr.vl[dp.lo + k - 1
                                     + (dp.hi - dp.lo + 2) // 2
                                     - 1]
                              - arr.vl[dp.lo + k - 1]),
                     list_min(list_transform(
                         range(1, dp.hi - dp.lo + 1
                                  - (dp.hi - dp.lo + 2) // 2
                                  + 2),
                         k -> arr.vl[dp.lo + k - 1
                                     + (dp.hi - dp.lo + 2) // 2
                                     - 1]
                              - arr.vl[dp.lo + k - 1]))) - 1,
               dp.lo
               + list_position(
                     list_transform(
                         range(1, dp.hi - dp.lo + 1
                                  - (dp.hi - dp.lo + 2) // 2
                                  + 2),
                         k -> arr.vl[dp.lo + k - 1
                                     + (dp.hi - dp.lo + 2) // 2
                                     - 1]
                              - arr.vl[dp.lo + k - 1]),
                     list_min(list_transform(
                         range(1, dp.hi - dp.lo + 1
                                  - (dp.hi - dp.lo + 2) // 2
                                  + 2),
                         k -> arr.vl[dp.lo + k - 1
                                     + (dp.hi - dp.lo + 2) // 2
                                     - 1]
                              - arr.vl[dp.lo + k - 1]))) - 1
               + (dp.hi - dp.lo + 2) // 2 - 1
        FROM dp, arr
        WHERE dp.hi - dp.lo + 1 > 3)
    SELECT (SELECT n FROM arr) AS n_days,
           CAST(CASE WHEN hi - lo + 1 = 3
                THEN arr.vl[lo + 1]
                WHEN hi - lo + 1 = 2
                THEN (arr.vl[lo] + arr.vl[lo + 1]) // 2
                ELSE arr.vl[lo] END AS BIGINT) AS hsm_cents
    FROM dp, arr WHERE hi - lo + 1 <= 3""")
def half_sample_mode(sf_dir: str):
    """HALF-SAMPLE MODE of daily revenue: repeatedly keep the
    SHORTEST interval containing half the remaining sorted points
    (ceil(m/2), earliest interval on width ties) until <= 3
    points remain — the robust mode estimator (Robertson-Cryer /
    Bickel's HSM) that finds where the distribution is DENSEST,
    immune to outliers and skew that drag mean and even median
    (the location triple mean/median/mode completed:
    trimmed_mean, robust_shape, and now this). Interval widths
    and the shrink recursion are exact integer comparisons; the
    oracle replays the same shrink automaton in a recursive CTE
    over the sorted LIST. Scale plan: cent-histogram combine;
    the shrink is O(n log n) driver work."""
    days, v = _daily_revenue(sf_dir)
    vl = sorted(v)
    lo, hi = 0, len(vl) - 1  # 0-indexed inclusive
    while hi - lo + 1 > 3:
        m = hi - lo + 1
        h = (m + 1) // 2
        best = None
        for k in range(0, m - h + 1):
            width = vl[lo + k + h - 1] - vl[lo + k]
            if best is None or width < best[0]:
                best = (width, k)
        lo = lo + best[1]
        hi = lo + h - 1
    m = hi - lo + 1
    if m == 3:
        mode = vl[lo + 1]
    elif m == 2:
        mode = _tdiv(vl[lo] + vl[lo + 1], 2)
    else:
        mode = vl[lo]
    return pd.DataFrame({
        "n_days": [np.int64(len(vl))],
        "hsm_cents": [np.int64(mode)]})
