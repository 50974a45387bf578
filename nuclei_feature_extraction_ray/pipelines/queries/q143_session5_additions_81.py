# round-5 session-5 additions, batch 81: longest increasing
# subsequence of daily revenue by patience sorting, the 1/e
# secretary-rule replay, and gambler's-ruin probability from the
# up/down record.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)

_SEC_INV_E = 36788  # floor(1e5 / e)
_GR_A = 10
_GR_N = 50


def _daily_revenue(sf_dir: str) -> tuple[list, list]:
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
        ["day"], ["v"], exact_int=True).sort_values("day")
    return ([int(x) for x in d["day"]], [int(x) for x in d["v"]])


_DAILY_SQL = """
    d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                        TIMESTAMP)) / 86400)
                      AS BIGINT) AS day,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                               AS BIGINT)) AS BIGINT) AS v
          FROM orders GROUP BY 1)"""


@register("lis_days", sql="""
    WITH RECURSIVE """ + _DAILY_SQL + """,
    arr AS (SELECT list(CAST(v AS HUGEINT) ORDER BY day) AS vl,
                   CAST(count(*) AS BIGINT) AS n
            FROM d),
    dp AS (
        SELECT CAST(0 AS BIGINT) AS i,
               CAST([] AS HUGEINT[]) AS tails
        UNION ALL
        SELECT dp.i + 1,
               CASE WHEN len(list_filter(dp.tails,
                             t -> t < arr.vl[dp.i + 1])) + 1
                         > len(dp.tails)
               THEN list_append(dp.tails, arr.vl[dp.i + 1])
               ELSE list_transform(range(1, len(dp.tails) + 1),
                    k -> CASE WHEN k = len(list_filter(dp.tails,
                              t -> t < arr.vl[dp.i + 1])) + 1
                         THEN arr.vl[dp.i + 1]
                         ELSE dp.tails[k] END) END
        FROM dp, arr WHERE dp.i < arr.n)
    SELECT (SELECT n FROM arr) AS n_days,
           CAST(len(tails) AS BIGINT) AS lis_length,
           CAST(len(tails) AS DOUBLE)
           / (2.0 * sqrt(CAST((SELECT n FROM arr) AS DOUBLE)))
             AS lis_vs_random
    FROM dp, arr WHERE i = arr.n""")
def lis_days(sf_dir: str):
    """LONGEST STRICTLY-INCREASING SUBSEQUENCE of daily revenue by
    patience sorting: the maximum number of days you could pick,
    in order, with strictly rising revenue — for an i.i.d. series
    the length concentrates at 2*sqrt(n) (Ulam's problem /
    Vershik-Kerov), so the reported ratio against that baseline is
    a trend-vs-noise diagnostic orthogonal to cox_stuart (which
    compares halves) and lz_complexity (which sees only signs).
    The pile-tails array evolves by exact integer comparisons; the
    oracle replays the SAME replace-or-append automaton with a
    LIST in a recursive CTE (position found by counting tails <
    x). Scale plan: bounded day-domain combine; patience is
    O(n log n) driver work."""
    days, v = _daily_revenue(sf_dir)
    import bisect
    tails = []
    for x in v:
        pos = bisect.bisect_left(tails, x)
        if pos == len(tails):
            tails.append(x)
        else:
            tails[pos] = x
    n = len(v)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "lis_length": [np.int64(len(tails))],
        "lis_vs_random": [np.float64(len(tails))
                          / (2.0 * np.sqrt(np.float64(n)))]})


@register("secretary_rule", sql="""
    WITH """ + _DAILY_SQL + """,
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(*) * {inv_e} // 100000 AS BIGINT)
                   AS r
          FROM d),
    x AS (SELECT day, v,
                 CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                   AS i
          FROM d),
    m AS (SELECT CAST(max(v) AS BIGINT) AS obs_max FROM x
          WHERE i <= (SELECT r FROM t)),
    pick AS (SELECT day, v FROM x
             WHERE i > (SELECT r FROM t)
               AND v > (SELECT obs_max FROM m)
             ORDER BY day LIMIT 1),
    lastd AS (SELECT day, v FROM x
              WHERE i = (SELECT n FROM t)),
    ch AS (SELECT COALESCE((SELECT day FROM pick),
                           (SELECT day FROM lastd)) AS day,
                  COALESCE((SELECT v FROM pick),
                           (SELECT v FROM lastd)) AS v)
    SELECT (SELECT n FROM t) AS n_days,
           (SELECT r FROM t) AS n_observed,
           (SELECT day FROM ch) AS picked_day,
           CAST((SELECT v FROM ch) AS BIGINT) AS picked_cents,
           CAST(CASE WHEN (SELECT v FROM ch)
                          = (SELECT max(v) FROM x)
                THEN 1 ELSE 0 END AS BIGINT) AS is_global_max,
           CAST((SELECT count(*) FROM x
                 WHERE v > (SELECT v FROM ch)) + 1 AS BIGINT)
             AS picked_rank""".format(inv_e=_SEC_INV_E))
def secretary_rule(sf_dir: str):
    """SECRETARY-RULE (1/e optimal stopping) REPLAY on daily
    revenue: observe the first floor(n/e) days, then commit to the
    first later day that beats everything observed (falling back
    to the final day) — the classical rule that picks the true
    maximum with probability ~1/e; the replay reports what it
    chose, whether that WAS the global best, and the pick's exact
    rank — a deterministic benchmark for any 'when to lock in'
    launch-date policy. The 1/e cutoff is the exact integer
    n*36788//100000; every comparison, pick and rank is exact
    integer arithmetic (no floats at all). Scale plan: bounded
    day-domain combine; the replay is O(days) driver work."""
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    r = n * _SEC_INV_E // 100000
    obs_max = max(v[:r])
    pick = None
    for day, val in zip(days[r:], v[r:]):
        if val > obs_max:
            pick = (day, val)
            break
    if pick is None:
        pick = (days[-1], v[-1])
    rank = sum(1 for x in v if x > pick[1]) + 1
    return pd.DataFrame({
        "n_days": [np.int64(n)], "n_observed": [np.int64(r)],
        "picked_day": [np.int64(pick[0])],
        "picked_cents": [np.int64(pick[1])],
        "is_global_max": [np.int64(1 if pick[1] == max(v)
                                   else 0)],
        "picked_rank": [np.int64(rank)]})


@register("gamblers_ruin", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT v, lag(v) OVER (ORDER BY day) AS pv FROM d),
    s AS (SELECT CAST(sum(CASE WHEN v > pv THEN 1 ELSE 0 END)
                      AS BIGINT) AS u,
                 CAST(sum(CASE WHEN v < pv THEN 1 ELSE 0 END)
                      AS BIGINT) AS dn
          FROM x WHERE pv IS NOT NULL)
    SELECT u AS n_up, dn AS n_down,
           CASE WHEN u = dn
                THEN 1.0 - CAST({a} AS DOUBLE)
                           / CAST({N} AS DOUBLE)
                ELSE (exp(CAST({a} AS DOUBLE)
                          * ln(CAST(dn AS DOUBLE)
                               / CAST(u AS DOUBLE)))
                      - exp(CAST({N} AS DOUBLE)
                            * ln(CAST(dn AS DOUBLE)
                                 / CAST(u AS DOUBLE))))
                     / (1.0 - exp(CAST({N} AS DOUBLE)
                                  * ln(CAST(dn AS DOUBLE)
                                       / CAST(u AS DOUBLE))))
           END AS ruin_prob
    FROM s""".format(a=_GR_A, N=_GR_N))
def gamblers_ruin(sf_dir: str):
    """GAMBLER'S-RUIN PROBABILITY from the daily up/down record:
    with win odds p = u/(u+dn) estimated from revenue rises vs
    falls, the exact closed form for the chance a +1/-1 random
    walk starting at {a} hits 0 before {N} — ((q/p)^a - (q/p)^N)
    / (1 - (q/p)^N), degenerating to 1 - a/N at p = 1/2 — the
    classic absorbing-barrier risk readout that turns the drift
    runs_test measures into a bankruptcy-odds number. The up/down
    census is exact integers; the p = 1/2 branch is an EXACT
    integer equality test; powers are written exp(k*ln(dn/u)) on
    the exact ratio (libm-identical both engines). Scale plan:
    bounded day-domain combine; O(1) driver arithmetic.
    """.format(a=_GR_A, N=_GR_N)
    days, v = _daily_revenue(sf_dir)
    u = sum(1 for a, b in zip(v, v[1:]) if b > a)
    dn = sum(1 for a, b in zip(v, v[1:]) if b < a)
    if u == dn:
        ruin = 1.0 - np.float64(_GR_A) / np.float64(_GR_N)
    else:
        r = np.float64(dn) / np.float64(u)
        ruin = (np.exp(np.float64(_GR_A) * np.log(r))
                - np.exp(np.float64(_GR_N) * np.log(r))) \
            / (1.0 - np.exp(np.float64(_GR_N) * np.log(r)))
    return pd.DataFrame({
        "n_up": [np.int64(u)], "n_down": [np.int64(dn)],
        "ruin_prob": [np.float64(ruin)]})
