# round-5 session-5 additions, batch 88: an anytime-valid e-process
# for daily wins, Blomqvist's medial correlation, and Chatterjee's
# xi rank correlation.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue

# micro-quantized ln(1.1) and ln(0.9): the e-process bets on win
# probability 0.55 against the fair-coin null (identical literal
# constants in both engines)
_EV_WIN = 95310   # floor(ln(2*0.55)*1e6+0.5)
_EV_LOSS = -105361  # floor(ln(2*0.45)*1e6+0.5)


_DAILY_PAIR_SQL = """
    d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                        TIMESTAMP)) / 86400)
                      AS BIGINT) AS day,
                 CAST(count(*) AS BIGINT) AS x,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                               AS BIGINT)) AS BIGINT) AS y
          FROM orders GROUP BY 1)"""


@register("evalue_process", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT day, v, lag(v) OVER (ORDER BY day) AS pv FROM d),
    b AS (SELECT day,
                 CASE WHEN v > pv THEN {win} ELSE {loss} END
                   AS le
          FROM x WHERE pv IS NOT NULL),
    c AS (SELECT day,
                 CAST(sum(le) OVER (ORDER BY day) AS BIGINT)
                   AS cum
          FROM b),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(max(cum) AS BIGINT) AS mx,
                 CAST(sum(CASE WHEN cum >= 2995732 THEN 1
                          ELSE 0 END) AS BIGINT) AS crossed
          FROM c),
    fin AS (SELECT cum FROM c ORDER BY day DESC LIMIT 1)
    SELECT (SELECT n FROM m) AS n_days,
           CAST((SELECT cum FROM fin) AS DOUBLE) / 1000000.0
             AS final_log_e,
           CAST((SELECT mx FROM m) AS DOUBLE) / 1000000.0
             AS max_log_e,
           CAST(CASE WHEN (SELECT mx FROM m) >= 2995732
                THEN 1 ELSE 0 END AS BIGINT)
             AS rejects_at_20""".format(win=_EV_WIN,
                                        loss=_EV_LOSS))
def evalue_process(sf_dir: str):
    """ANYTIME-VALID E-PROCESS for upward drift in daily revenue:
    bet each day on 'up' with probability 0.55 against the
    fair-coin null; the wealth process multiplies by 2*0.55 on
    wins and 2*0.45 on losses, and by Ville's inequality the null
    survives max E >= 20 (log 1e6-units >= 2995732 = ln 20) with
    probability <= 1/20 NO MATTER WHEN YOU LOOK — the modern
    always-valid replacement for the fixed-n runs_test that
    sprt_ab approximates with thresholds. Log-increments are the
    SAME micro-quantized integer literals in both engines; the
    wealth path, its running max and the threshold crossing are
    exact integer window arithmetic. Scale plan: bounded
    day-domain combine; the scan is O(days) driver work."""
    days, v = _daily_revenue(sf_dir)
    obs = [1 if b > a else 0 for a, b in zip(v, v[1:])]
    cum = 0
    mx = None
    for o in obs:
        cum += _EV_WIN if o else _EV_LOSS
        mx = cum if mx is None else max(mx, cum)
    return pd.DataFrame({
        "n_days": [np.int64(len(obs))],
        "final_log_e": [np.float64(cum) / 1000000.0],
        "max_log_e": [np.float64(mx) / 1000000.0],
        "rejects_at_20": [np.int64(1 if mx >= 2995732 else 0)]})


@register("blomqvist_beta", sql="""
    WITH """ + _DAILY_PAIR_SQL + """,
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    rx AS (SELECT day, x, y,
                  row_number() OVER (ORDER BY x, day) AS rkx,
                  row_number() OVER (ORDER BY y, day) AS rky
           FROM d),
    s AS (SELECT CAST(sum(CASE WHEN (2 * rkx
                               > (SELECT n FROM t))
                               = (2 * rky
                                  > (SELECT n FROM t))
                          THEN 1 ELSE -1 END) AS BIGINT) AS q
          FROM rx)
    SELECT (SELECT n FROM t) AS n_days,
           CAST((SELECT q FROM s) AS DOUBLE)
           / CAST((SELECT n FROM t) AS DOUBLE)
             AS blomqvist_beta""")
def blomqvist_beta(sf_dir: str):
    """BLOMQVIST'S BETA (medial correlation) between daily order
    count and daily revenue: split both series at their medians
    (exact rank test 2*rank > n with day tie-breaks) and score +1
    when a day falls in a concordant quadrant, -1 otherwise —
    the 2x2-quadrant dependence measure that is maximally robust
    (only median crossings matter) and feeds tail_dependence's
    copula view with its center-of-distribution counterpart.
    Every rank and quadrant decision is exact integer arithmetic;
    beta is one division. Scale plan: bounded day-domain combine;
    ranking is O(days) driver work."""
    d = _daily_pair(sf_dir)
    n = len(d)
    order_x = sorted(range(n), key=lambda i: (d[i][1], d[i][0]))
    order_y = sorted(range(n), key=lambda i: (d[i][2], d[i][0]))
    rkx = [0] * n
    rky = [0] * n
    for r, i in enumerate(order_x, start=1):
        rkx[i] = r
    for r, i in enumerate(order_y, start=1):
        rky[i] = r
    q = sum(1 if (2 * rkx[i] > n) == (2 * rky[i] > n) else -1
            for i in range(n))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "blomqvist_beta": [np.float64(q) / np.float64(n)]})


@register("chatterjee_xi", sql="""
    WITH """ + _DAILY_PAIR_SQL + """,
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    r AS (SELECT day, x, y,
                 CAST(row_number() OVER (ORDER BY y, day)
                      AS BIGINT) AS ry
          FROM d),
    o AS (SELECT ry,
                 lag(ry) OVER (ORDER BY x, day) AS pry
          FROM r),
    s AS (SELECT CAST(sum(abs(ry - pry)) AS HUGEINT) AS sd
          FROM o WHERE pry IS NOT NULL)
    SELECT (SELECT n FROM t) AS n_days,
           1.0 - 3.0 * CAST((SELECT sd FROM s) AS DOUBLE)
                 / (CAST((SELECT n FROM t) AS DOUBLE)
                    * CAST((SELECT n FROM t) AS DOUBLE) - 1.0)
             AS chatterjee_xi""")
def chatterjee_xi(sf_dir: str):
    """CHATTERJEE'S XI rank correlation of daily revenue against
    daily order count: sort days by x, take the y-ranks in that
    order, xi = 1 - 3*sum|r_{i+1} - r_i| / (n^2 - 1) — the 2020
    coefficient that, unlike Pearson/Spearman/Kendall, converges
    to a measure of FUNCTIONAL dependence (1 iff y is a
    measurable function of x, even non-monotone; 0 iff
    independent) — it would detect a perfect V-shaped
    relationship every classical coefficient scores as zero.
    Ranks use deterministic (value, day) tie-breaks so every rank
    and rank-jump is an exact integer; xi is one shared float
    expression. Scale plan: bounded day-domain combine; two
    sorts of O(days) driver work."""
    d = _daily_pair(sf_dir)
    n = len(d)
    order_y = sorted(range(n), key=lambda i: (d[i][2], d[i][0]))
    ry = [0] * n
    for r, i in enumerate(order_y, start=1):
        ry[i] = r
    order_x = sorted(range(n), key=lambda i: (d[i][1], d[i][0]))
    seq = [ry[i] for i in order_x]
    sd = sum(abs(b - a) for a, b in zip(seq, seq[1:]))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "chatterjee_xi": [1.0 - 3.0 * np.float64(sd)
                          / (np.float64(n) * np.float64(n)
                             - 1.0)]})


def _daily_pair(sf_dir: str) -> list:
    """[(day, order_count, revenue_cents)] exact rows."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day,
                          "x": np.ones(len(b), np.int64),
                          "y": cents}) \
            .groupby("day", as_index=False).sum()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["x", "y"], exact_int=True).sort_values("day")
    return [(int(r["day"]), int(r["x"]), int(r["y"]))
            for _, r in d.iterrows()]
