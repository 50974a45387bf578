# round-5 session-5 additions, batch 78: Cronbach's alpha over
# quarterly activity items, the Lindley-recursion queue waits per
# user, and exact Shapley values for event-type coverage.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply, partition_map

_QL_S = 5
_SH_TYPES = ("click", "error", "purchase", "signup", "view")


@register("cronbach_alpha", sql="""
    WITH b AS (SELECT CAST(floor(epoch((SELECT min(ts)
                                        FROM events)) / 86400)
                           AS BIGINT) AS mn,
                      CAST(floor(epoch((SELECT max(ts)
                                        FROM events)) / 86400)
                           AS BIGINT) AS mx),
    u AS (SELECT user_id,
                 least(CAST((CAST(floor(epoch(ts) / 86400)
                                  AS BIGINT)
                             - (SELECT mn FROM b)) * 4
                            // ((SELECT mx FROM b)
                                - (SELECT mn FROM b) + 1)
                            AS BIGINT), 3) AS q
          FROM events),
    it AS (SELECT user_id,
                  CAST(sum(CASE WHEN q = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS x0,
                  CAST(sum(CASE WHEN q = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS x1,
                  CAST(sum(CASE WHEN q = 2 THEN 1 ELSE 0 END)
                       AS BIGINT) AS x2,
                  CAST(sum(CASE WHEN q = 3 THEN 1 ELSE 0 END)
                       AS BIGINT) AS x3
           FROM u GROUP BY user_id),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x0) AS HUGEINT) AS s0,
                 CAST(sum(CAST(x0 AS HUGEINT) * x0) AS HUGEINT)
                   AS ss0,
                 CAST(sum(x1) AS HUGEINT) AS s1,
                 CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT)
                   AS ss1,
                 CAST(sum(x2) AS HUGEINT) AS s2,
                 CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT)
                   AS ss2,
                 CAST(sum(x3) AS HUGEINT) AS s3,
                 CAST(sum(CAST(x3 AS HUGEINT) * x3) AS HUGEINT)
                   AS ss3,
                 CAST(sum(x0 + x1 + x2 + x3) AS HUGEINT) AS st,
                 CAST(sum(CAST(x0 + x1 + x2 + x3 AS HUGEINT)
                          * (x0 + x1 + x2 + x3)) AS HUGEINT)
                   AS sst
          FROM it)
    SELECT CAST(n AS BIGINT) AS n_users,
           (4.0 / 3.0)
           * (1.0 - CAST((n * ss0 - s0 * s0)
                         + (n * ss1 - s1 * s1)
                         + (n * ss2 - s2 * s2)
                         + (n * ss3 - s3 * s3) AS DOUBLE)
                    / CAST(n * sst - st * st AS DOUBLE))
             AS cronbach_alpha
    FROM m""")
def cronbach_alpha(sf_dir: str):
    """CRONBACH'S ALPHA over four quarterly activity 'items' per
    user (event counts in the four equal spans of the corpus day
    range): alpha = (k/(k-1)) * (1 - sum item variances / variance
    of totals) — the internal-consistency coefficient that says
    whether 'activity' behaves as ONE stable trait across time
    (split_half_reliability is its two-item special case; alpha
    generalizes to k items and is the score every survey /
    composite-metric pipeline reports). Multiplying every
    variance by n^2 turns the ratio into exact big-int sums; alpha
    is one shared float expression. Scale plan: one user exchange
    emits 11-cell moment partials; O(1) driver arithmetic."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def bounds(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"mn": [int(day.min())],
                             "mx": [int(day.max())]})

    bd = ds.map_batches(bounds, batch_format="pandas").to_pandas()
    mn, mx = int(bd["mn"].min()), int(bd["mx"].max())
    span = mx - mn + 1

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        q = np.minimum((day - mn) * 4 // span, 3)
        g = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "x0": (q == 0).astype(np.int64),
            "x1": (q == 1).astype(np.int64),
            "x2": (q == 2).astype(np.int64),
            "x3": (q == 3).astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()
        for c in ("x0", "x1", "x2", "x3"):
            g[c] = g[c].astype(np.int64)
        return g

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False).sum()
        xs = [a["x%d" % j].to_numpy(np.int64) for j in range(4)]
        tot = xs[0] + xs[1] + xs[2] + xs[3]
        row = {"j": np.zeros(1, np.int64),
               "n": np.array([len(a)], np.int64),
               "st": [int(tot.sum())],
               "sst": [int((tot.astype(object) * tot).sum())]}
        for j in range(4):
            row["s%d" % j] = [int(xs[j].sum())]
            row["ss%d" % j] = [int((xs[j].astype(object)
                                    * xs[j]).sum())]
        return pd.DataFrame(row)

    m = _combine_partials(
        partition_map(ds.map_batches(partial,
                                     batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["j"], ["n", "st", "sst"] + ["s%d" % j for j in range(4)]
        + ["ss%d" % j for j in range(4)], exact_int=True)
    n = int(m["n"].iloc[0])
    st, sst = int(m["st"].iloc[0]), int(m["sst"].iloc[0])
    item_num = sum(n * int(m["ss%d" % j].iloc[0])
                   - int(m["s%d" % j].iloc[0]) ** 2
                   for j in range(4))
    alpha = (4.0 / 3.0) * (1.0 - np.float64(item_num)
                           / np.float64(n * sst - st * st))
    return pd.DataFrame({
        "n_users": [np.int64(n)],
        "cronbach_alpha": [np.float64(alpha)]})


@register("queue_lindley", sql="""
    WITH s AS (SELECT user_id, ts, event_id,
                      lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_ts
               FROM events),
    g AS (SELECT user_id, ts, event_id,
                 CAST({S} AS BIGINT)
                 - CAST(floor(CAST(epoch_us(ts)
                                   - epoch_us(prev_ts)
                                   AS DOUBLE) / 60000000.0)
                        AS BIGINT) AS dlt
          FROM s WHERE prev_ts IS NOT NULL),
    p AS (SELECT user_id, ts, event_id,
                 CAST(sum(dlt) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS BIGINT) AS pre
          FROM g),
    w AS (SELECT pre - least(CAST(0 AS BIGINT),
                             min(pre) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id)) AS wait
          FROM p)
    SELECT CAST(count(*) AS BIGINT) AS n_jobs,
           CAST(max(wait) AS BIGINT) AS max_wait_min,
           CAST(sum(wait) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mean_wait_min
    FROM w""".format(S=_QL_S))
def queue_lindley(sf_dir: str):
    """LINDLEY-RECURSION QUEUE WAITS per user: treat each user's
    events as jobs arriving at a single server with constant
    {S}-minute service; the waiting time W_n = max(0, W_(n-1) + S
    - A_n) unrolls — via the same prefix-minimum identity as
    cusum_peak — into P_n - min(0, running-min P), P = prefix sums
    of (S - interarrival). Mean and max wait expose burst-induced
    backlog (the QUEUEING consequence of the burstiness that
    gap_burstiness indexes: B > 0 means these waits explode even
    at low utilization). All waits are exact integer minutes; one
    final division. Scale plan: the lag-plan user exchange; the
    scan is partition-local (window functions / vectorized
    cumsums), never a global sequence."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        from ...stages.window import segment_codes
        codes = segment_codes(g["user_id"].to_numpy())
        us = g["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        if len(us) < 2:
            return pd.DataFrame({
                "j": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "sw": pd.Series(dtype=object),
                "mw": pd.Series(dtype=np.int64)})
        same = codes[1:] == codes[:-1]
        gap = np.floor((us[1:] - us[:-1]).astype(np.float64)
                       / 60000000.0).astype(np.int64)
        seg = codes[1:]
        df = pd.DataFrame({"seg": seg[same],
                           "dlt": _QL_S - gap[same]})
        if not len(df):
            return pd.DataFrame({
                "j": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "sw": pd.Series(dtype=object),
                "mw": pd.Series(dtype=np.int64)})
        pre = df.groupby("seg")["dlt"].cumsum().to_numpy(np.int64)
        rmin = df.assign(pre=pre).groupby("seg")["pre"].cummin() \
            .to_numpy(np.int64)
        wait = pre - np.minimum(rmin, 0)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(wait)], np.int64),
            "sw": [int(wait.astype(object).sum())],
            "mw": np.array([int(wait.max())], np.int64)})

    # each partition reduces to one (n, sw, mw) row, so the frame
    # is tiny: fold sums and the max on the driver directly
    raw = partitioned_apply(ds, "user_id", fn, 16,
                            sort_cols=["user_id", "ts",
                                       "event_id"]).to_pandas()
    n = int(raw["n"].sum())
    sw = sum(int(x) for x in raw["sw"])
    mw = int(raw["mw"].max())
    return pd.DataFrame({
        "n_jobs": [np.int64(n)],
        "max_wait_min": [np.int64(mw)],
        "mean_wait_min": [np.float64(sw) / np.float64(n)]})


@register("shapley_coverage", sql="""
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
                       CAST(sum(CASE bit_count(v0.s)
                                WHEN 0 THEN 24 WHEN 1 THEN 6
                                WHEN 2 THEN 4 WHEN 3 THEN 6
                                ELSE 24 END
                                * (v1.v - v0.v)) AS BIGINT)
                         AS scaled
                FROM pl
                JOIN v v0 ON (v0.s >> pl.p) & 1 = 0
                JOIN v v1 ON v1.s = v0.s | (1 << pl.p)
                GROUP BY pl.p),
    names AS (SELECT 0 AS p, 'click' AS event_type UNION ALL
              SELECT 1, 'error' UNION ALL
              SELECT 2, 'purchase' UNION ALL
              SELECT 3, 'signup' UNION ALL
              SELECT 4, 'view')
    SELECT names.event_type,
           CAST(contrib.scaled AS DOUBLE) / 120.0
             AS shapley_users,
           CAST(contrib.scaled AS DOUBLE)
           / (120.0 * CAST((SELECT v FROM v WHERE s = 31)
                           AS DOUBLE)) AS shapley_share
    FROM contrib JOIN names ON names.p = contrib.p
    ORDER BY event_type""")
def shapley_coverage(sf_dir: str):
    """EXACT SHAPLEY VALUES for event-type USER COVERAGE: the
    coalition value v(S) = number of users who used at least one
    type in S, and each type's Shapley value — the canonical fair
    attribution of total reach across the five event types (the
    data-valuation question 'how many users does CLICK uniquely
    bring?' that raw per-type counts double-count and
    markov_attribution answers only for paths). With 5 players the
    game is EXACTLY enumerable from the 32-cell user-mask
    histogram: v(S) is an exact integer for all subsets,
    marginal contributions are weighted by the integer factorials
    s!(4-s)! (so 120 * Shapley is an exact integer), and only the
    final /120 and share divisions are float. Scale plan: one
    user exchange into the bounded mask histogram; the 32x5
    subset scan is O(1) driver work."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        et = b["event_type"].to_numpy(object)
        ind = {"b%d" % i: (et == t).astype(np.int64)
               for i, t in enumerate(_SH_TYPES[:4])}
        # mirror the SQL CASE's ELSE: anything not in the first
        # four types counts as the 'view' bit
        ind["b4"] = (1 - np.maximum.reduce(
            [ind["b%d" % i] for i in range(4)])).astype(np.int64)
        g = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64), **ind}) \
            .groupby("user_id", as_index=False).max()
        return g

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
    wgt = {0: 24, 1: 6, 2: 4, 3: 6, 4: 24}
    rows = []
    for p, name in enumerate(_SH_TYPES):
        scaled = 0
        for s in range(32):
            if (s >> p) & 1:
                continue
            scaled += wgt[bin(s).count("1")] \
                * (v[s | (1 << p)] - v[s])
        rows.append((name, scaled))
    rows.sort()
    full = v[31]
    return pd.DataFrame({
        "event_type": [r[0] for r in rows],
        "shapley_users": [np.float64(r[1]) / 120.0
                          for r in rows],
        "shapley_share": [np.float64(r[1])
                          / (120.0 * np.float64(full))
                          for r in rows]})
