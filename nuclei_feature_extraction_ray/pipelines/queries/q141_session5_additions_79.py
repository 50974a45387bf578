# round-5 session-5 additions, batch 79: isotonic regression by
# pool-adjacent-violators, the 10% trimmed mean, and the Banzhaf
# power index for event-type coverage.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q140_session5_additions_78 import _SH_TYPES


@register("isotonic_pav", sql="""
    WITH RECURSIVE d AS (SELECT CAST(floor(epoch(CAST(o_orderdate
                                  AS TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    arr AS (SELECT list(CAST(v AS HUGEINT) ORDER BY day) AS vl,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                     AS sx2
            FROM d),
    dp AS (
        SELECT CAST(0 AS BIGINT) AS i,
               CAST([] AS HUGEINT[]) AS s,
               CAST([] AS BIGINT[]) AS c
        UNION ALL
        SELECT CASE WHEN len(dp.c) >= 2
                    AND dp.s[len(dp.s) - 1] * dp.c[len(dp.c)]
                        >= dp.s[len(dp.s)] * dp.c[len(dp.c) - 1]
               THEN dp.i ELSE dp.i + 1 END,
               CASE WHEN len(dp.c) >= 2
                    AND dp.s[len(dp.s) - 1] * dp.c[len(dp.c)]
                        >= dp.s[len(dp.s)] * dp.c[len(dp.c) - 1]
               THEN list_append(list_slice(dp.s, 1,
                                           len(dp.s) - 2),
                                dp.s[len(dp.s) - 1]
                                + dp.s[len(dp.s)])
               ELSE list_append(dp.s, arr.vl[dp.i + 1]) END,
               CASE WHEN len(dp.c) >= 2
                    AND dp.s[len(dp.s) - 1] * dp.c[len(dp.c)]
                        >= dp.s[len(dp.s)] * dp.c[len(dp.c) - 1]
               THEN list_append(list_slice(dp.c, 1,
                                           len(dp.c) - 2),
                                dp.c[len(dp.c) - 1]
                                + dp.c[len(dp.c)])
               ELSE list_append(dp.c, CAST(1 AS BIGINT)) END
        FROM dp, arr
        WHERE dp.i < arr.n
           OR (len(dp.c) >= 2
               AND dp.s[len(dp.s) - 1] * dp.c[len(dp.c)]
                   >= dp.s[len(dp.s)] * dp.c[len(dp.c) - 1]))
    SELECT (SELECT n FROM arr) AS n_days,
           CAST(len(c) AS BIGINT) AS n_blocks,
           CAST(list_max(c) AS BIGINT) AS largest_block_days,
           CAST(CAST((SELECT sx2 FROM arr) AS HUGEINT)
                - list_sum(list_transform(range(1, len(c) + 1),
                      k -> s[k] * s[k] // c[k])) AS DOUBLE)
           / 10000.0 AS sse_dollars2
    FROM dp, arr
    WHERE i = n AND NOT (len(c) >= 2
          AND s[len(s) - 1] * c[len(c)]
              >= s[len(s)] * c[len(c) - 1])""")
def isotonic_pav(sf_dir: str):
    """ISOTONIC REGRESSION of daily revenue on the day index by
    POOL-ADJACENT-VIOLATORS: the best monotone-nondecreasing fit,
    reported as its level-set structure (block count, widest flat
    stretch) and squared error — the shape-constrained view of
    trend that cox_stuart TESTS and trend_forecast fits linearly:
    few wide blocks mean long plateaus, SSE near the raw variance
    means monotonicity is a bad model. Block means are exact
    rationals compared by cross-multiplication (never divided);
    the oracle runs the SAME merge-or-consume automaton as a
    recursive CTE over (sums, counts) LISTs (one merge or one
    consume per step, <= 2n steps — the wagner_whitin list-DP
    policy), and the SSE uses exact integer floor-division per
    block identically on both engines. Scale plan: bounded
    day-domain combine; PAV is O(days) driver work."""
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
    v = [int(x) for x in d["v"]]
    n = len(v)
    sx2 = sum(x * x for x in v)
    s = []
    c = []
    for x in v:
        s.append(x)
        c.append(1)
        while len(c) >= 2 and s[-2] * c[-1] >= s[-1] * c[-2]:
            s[-2] += s[-1]
            c[-2] += c[-1]
            s.pop()
            c.pop()
    sse = sx2 - sum(si * si // ci for si, ci in zip(s, c))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "n_blocks": [np.int64(len(c))],
        "largest_block_days": [np.int64(max(c))],
        "sse_dollars2": [np.float64(sse) / 10000.0]})


@register("trimmed_mean", sql="""
    WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS v
               FROM orders),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(*) // 10 AS BIGINT) AS k FROM o),
    r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM o),
    m AS (SELECT CAST(sum(v) AS HUGEINT) AS s,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM r WHERE rk > (SELECT k FROM t)
                   AND rk <= (SELECT n FROM t)
                             - (SELECT k FROM t))
    SELECT (SELECT n FROM t) AS n_orders,
           (SELECT k FROM t) AS n_trimmed_each,
           CAST((SELECT s FROM m) AS DOUBLE)
           / (100.0 * CAST((SELECT cnt FROM m) AS DOUBLE))
             AS trimmed_mean_price""")
def trimmed_mean(sf_dir: str):
    """10% TRIMMED MEAN of order totals: drop the n/10 smallest
    and n/10 largest orders (exact integer rank cuts) and average
    the middle 80% — the simplest robust location estimator,
    sitting between the fragile mean and the information-discarding
    median (huber_location and hodges_lehmann are its
    sophisticated cousins; the trimmed mean is what monitoring
    dashboards actually deploy). The trimmed sum folds as an
    exact big int over exact rank boundaries; one final division
    to dollars. Scale plan: cent-value histogram combine; the two
    rank cuts are a cumulative walk (two-phase rank exchange at
    fleet scale)."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"v": cents,
                          "c": np.ones(len(b), np.int64)}) \
            .groupby("v", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["v"], ["c"]).sort_values("v").reset_index(drop=True)
    vals = h["v"].to_numpy(np.int64)
    cnts = h["c"].to_numpy(np.int64)
    n = int(cnts.sum())
    k = n // 10
    lo, hi = k, n - k
    s = 0
    cnt = 0
    cum = 0
    for val, c in zip(vals, cnts):
        a, b = cum, cum + int(c)
        take = max(0, min(b, hi) - max(a, lo))
        s += int(val) * take
        cnt += take
        cum = b
    return pd.DataFrame({
        "n_orders": [np.int64(n)],
        "n_trimmed_each": [np.int64(k)],
        "trimmed_mean_price": [np.float64(s)
                               / (100.0 * np.float64(cnt))]})


@register("banzhaf_coverage", sql="""
    WITH u AS (SELECT user_id,
                      bit_or(CASE event_type
                             WHEN 'click' THEN 1
                             WHEN 'error' THEN 2
                             WHEN 'purchase' THEN 4
                             WHEN 'signup' THEN 8
                             ELSE 16 END) AS mask
               FROM events GROUP BY user_id),
    mh AS (SELECT mask, CAST(count(*) AS BIGINT) AS cnt
           FROM u GROUP BY mask),
    subs AS (SELECT CAST(s AS BIGINT) AS s FROM range(0, 32) t(s)),
    v AS (SELECT subs.s,
                 CAST(COALESCE(sum(CASE WHEN mh.mask & subs.s <> 0
                               THEN mh.cnt ELSE 0 END), 0)
                      AS BIGINT) AS v
          FROM subs LEFT JOIN mh ON TRUE GROUP BY subs.s),
    pl AS (SELECT CAST(p AS BIGINT) AS p FROM range(0, 5) t(p)),
    contrib AS (SELECT pl.p,
                       CAST(sum(v1.v - v0.v) AS BIGINT) AS raw
                FROM pl
                JOIN v v0 ON (v0.s >> pl.p) & 1 = 0
                JOIN v v1 ON v1.s = v0.s | (1 << pl.p)
                GROUP BY pl.p),
    tot AS (SELECT CAST(sum(raw) AS BIGINT) AS t FROM contrib),
    names AS (SELECT 0 AS p, 'click' AS event_type UNION ALL
              SELECT 1, 'error' UNION ALL
              SELECT 2, 'purchase' UNION ALL
              SELECT 3, 'signup' UNION ALL
              SELECT 4, 'view')
    SELECT names.event_type,
           CAST(contrib.raw AS DOUBLE) / 16.0 AS banzhaf_users,
           CAST(contrib.raw AS DOUBLE)
           / CAST((SELECT t FROM tot) AS DOUBLE)
             AS banzhaf_share
    FROM contrib JOIN names ON names.p = contrib.p
    ORDER BY event_type""")
def banzhaf_coverage(sf_dir: str):
    """BANZHAF POWER INDEX for event-type user coverage: each
    type's average marginal contribution over ALL 2^4 coalitions
    of the other types, uniformly weighted — the power-index
    alternative to shapley_coverage (Shapley weights by coalition
    size and sums to v(N); Banzhaf treats every coalition as
    equally likely and generally does NOT sum to the total, which
    is exactly why comparing the two normalized vectors flags
    types whose value concentrates in small vs large coalitions).
    Raw Banzhaf sums are exact integers from the same 32-cell
    mask histogram; /16 and the normalized share are the only
    floats. Scale plan: one user exchange into the mask
    histogram; O(1) driver work."""
    from ...stages.partition import partition_map
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        et = b["event_type"].to_numpy(object)
        ind = {"b%d" % i: (et == t).astype(np.int64)
               for i, t in enumerate(_SH_TYPES[:4])}
        ind["b4"] = (1 - np.maximum.reduce(
            [ind["b%d" % i] for i in range(4)])).astype(np.int64)
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64), **ind}) \
            .groupby("user_id", as_index=False).max()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False).max()
        mask = np.zeros(len(a), np.int64)
        for i in range(5):
            mask |= a["b%d" % i].to_numpy(np.int64) << i
        out = pd.DataFrame({"mask": mask,
                            "cnt": np.ones(len(a), np.int64)}) \
            .groupby("mask", as_index=False).sum()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    mh = _combine_partials(
        partition_map(ds.map_batches(partial,
                                     batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["mask"], ["cnt"])
    cnt = {int(r["mask"]): int(r["cnt"]) for _, r in mh.iterrows()}
    v = [sum(c for m, c in cnt.items() if m & s)
         for s in range(32)]
    raws = []
    for p, name in enumerate(_SH_TYPES):
        raw = sum(v[s | (1 << p)] - v[s]
                  for s in range(32) if not (s >> p) & 1)
        raws.append((name, raw))
    raws.sort()
    tot = sum(r for _, r in raws)
    return pd.DataFrame({
        "event_type": [r[0] for r in raws],
        "banzhaf_users": [np.float64(r[1]) / 16.0
                          for r in raws],
        "banzhaf_share": [np.float64(r[1]) / np.float64(tot)
                          for r in raws]})
