# round-5 session-5 additions, batch 100: the time-reversibility
# statistic, the turn-of-month calendar effect, and
# volatility-of-volatility.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue


@register("trev_asymmetry", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT day, v - lag(v) OVER (ORDER BY day) AS dv
          FROM d),
    w AS (SELECT CAST(CAST(dv AS HUGEINT) // 100 AS HUGEINT)
                   AS dv
          FROM x WHERE dv IS NOT NULL),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(dv * dv) AS HUGEINT) AS s2,
                 CAST(sum(dv * dv * dv) AS HUGEINT) AS s3
          FROM w)
    SELECT CAST(n AS BIGINT) AS n_changes,
           (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
           / (sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
              * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
              * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)))
             AS trev
    FROM m""")
def trev_asymmetry(sf_dir: str):
    """TIME-REVERSIBILITY STATISTIC of daily revenue: the
    standardized third moment of one-day CHANGES, trev =
    E[dv^3]/E[dv^2]^1.5 — exactly zero for any time-reversible
    (e.g. Gaussian linear) process, so a nonzero value is direct
    evidence of NONLINEAR dynamics (slow rises / sharp crashes or
    vice versa) that no autocorrelation-based test (ljung_box,
    variance_ratio) can see: they are blind to the arrow of time.
    Changes are truncated to exact integer dollars (DuckDB //
    semantics mirrored), the second and third moments fold as
    exact big ints, and trev is one shared float expression.
    Scale plan: bounded day-domain combine; O(1) driver
    arithmetic."""
    days, v = _daily_revenue(sf_dir)
    dv = [(b - a) // 100 if b >= a else -((a - b) // 100)
          for a, b in zip(v, v[1:])]
    n = len(dv)
    s2 = sum(x * x for x in dv)
    s3 = sum(x * x * x for x in dv)
    r = np.sqrt(np.float64(s2) / np.float64(n))
    return pd.DataFrame({
        "n_changes": [np.int64(n)],
        "trev": [(np.float64(s3) / np.float64(n))
                 / (r * r * r)]})


@register("turn_of_month", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT day, v,
                 CASE WHEN day % 30 <= 2 OR day % 30 >= 27
                      THEN 1 ELSE 0 END AS tom
          FROM d),
    m AS (SELECT CAST(sum(tom) AS BIGINT) AS n_tom,
                 CAST(count(*) - sum(tom) AS BIGINT) AS n_mid,
                 CAST(sum(CASE WHEN tom = 1 THEN v ELSE 0 END)
                      AS HUGEINT) AS s_tom,
                 CAST(sum(CASE WHEN tom = 0 THEN v ELSE 0 END)
                      AS HUGEINT) AS s_mid
          FROM x)
    SELECT n_tom AS n_turn_days, n_mid AS n_mid_days,
           CAST(s_tom AS DOUBLE) / CAST(n_tom AS DOUBLE)
           / (CAST(s_mid AS DOUBLE) / CAST(n_mid AS DOUBLE))
             AS turn_of_month_ratio,
           CAST(s_tom AS DOUBLE)
           / (CAST(s_tom AS DOUBLE) + CAST(s_mid AS DOUBLE))
             AS turn_revenue_share
    FROM m""")
def turn_of_month(sf_dir: str):
    """TURN-OF-MONTH EFFECT census: mean daily revenue in the
    six days around each (30-day-cycle) month boundary versus
    the mid-month days — the classic calendar anomaly (salaries,
    budget flushes, billing cycles) that weekly seasonality tools
    (weekly_spectrum, median_polish) fold away because it lives
    on a DIFFERENT clock. Day classification is an exact integer
    modulus test; revenue masses and day counts fold exactly;
    the ratio and share are shared float expressions. Scale
    plan: bounded day-domain combine; O(1) driver arithmetic."""
    days, v = _daily_revenue(sf_dir)
    s_tom = s_mid = n_tom = n_mid = 0
    for day, x in zip(days, v):
        if day % 30 <= 2 or day % 30 >= 27:
            s_tom += x
            n_tom += 1
        else:
            s_mid += x
            n_mid += 1
    return pd.DataFrame({
        "n_turn_days": [np.int64(n_tom)],
        "n_mid_days": [np.int64(n_mid)],
        "turn_of_month_ratio": [
            np.float64(s_tom) / np.float64(n_tom)
            / (np.float64(s_mid) / np.float64(n_mid))],
        "turn_revenue_share": [
            np.float64(s_tom)
            / (np.float64(s_tom) + np.float64(s_mid))]})


@register("vol_of_vol", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT CAST(row_number() OVER (ORDER BY day)
                      AS BIGINT) AS i,
                 CAST(CAST(v AS HUGEINT) // 100 AS HUGEINT)
                   AS v
          FROM d),
    wk AS (SELECT (i - 1) // 7 AS blk,
                  CAST(count(*) AS HUGEINT) AS m,
                  CAST(sum(v) AS HUGEINT) AS s,
                  CAST(sum(v * v) AS HUGEINT) AS s2
           FROM x GROUP BY 1),
    f AS (SELECT blk,
                 CAST((7 * s2 - s * s) // 49 AS HUGEINT) AS w
          FROM wk WHERE m = 7),
    m2 AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                  CAST(sum(w) AS HUGEINT) AS sw,
                  CAST(sum(w * w) AS HUGEINT) AS sw2
           FROM f)
    SELECT CAST(k AS BIGINT) AS n_weeks,
           sqrt(CAST(sw AS DOUBLE) / CAST(k AS DOUBLE))
             AS mean_weekly_vol_dollars,
           sqrt(sqrt(CAST(sw2 AS DOUBLE) / CAST(k AS DOUBLE)
                     - (CAST(sw AS DOUBLE) / CAST(k AS DOUBLE))
                       * (CAST(sw AS DOUBLE)
                          / CAST(k AS DOUBLE))))
             AS vol_of_vol_dollars,
           sqrt(sqrt(CAST(sw2 AS DOUBLE) / CAST(k AS DOUBLE)
                     - (CAST(sw AS DOUBLE) / CAST(k AS DOUBLE))
                       * (CAST(sw AS DOUBLE)
                          / CAST(k AS DOUBLE))))
           / sqrt(CAST(sw AS DOUBLE) / CAST(k AS DOUBLE))
             AS vvol_ratio
    FROM m2""")
def vol_of_vol(sf_dir: str):
    """VOLATILITY OF VOLATILITY: the week-to-week dispersion of
    the 7-day revenue variance — constant-vol processes have
    vvol near zero while regime-switching / GARCH-like dynamics
    (exactly what viterbi_regimes decodes and christoffersen's
    clustered violations imply) show a large ratio of vol-of-vol
    to mean vol. Each full week's variance is the exact integer
    (7*S2 - S^2)//49 in dollars^2; the across-week moments fold
    as exact big ints; the three outputs are shared float
    expressions (fourth root for the vvol scale). Scale plan:
    bounded week-domain combine; O(weeks) driver arithmetic."""
    days, v = _daily_revenue(sf_dir)
    dv = [x // 100 for x in v]
    ws = []
    for b0 in range(0, len(dv) - 6, 7):
        blk = dv[b0:b0 + 7]
        s = sum(blk)
        s2 = sum(x * x for x in blk)
        ws.append((7 * s2 - s * s) // 49)
    k = len(ws)
    sw = sum(ws)
    sw2 = sum(w * w for w in ws)
    mean = np.float64(sw) / np.float64(k)
    var = np.float64(sw2) / np.float64(k) - mean * mean
    return pd.DataFrame({
        "n_weeks": [np.int64(k)],
        "mean_weekly_vol_dollars": [np.sqrt(mean)],
        "vol_of_vol_dollars": [np.sqrt(np.sqrt(var))],
        "vvol_ratio": [np.sqrt(np.sqrt(var)) / np.sqrt(mean)]})
