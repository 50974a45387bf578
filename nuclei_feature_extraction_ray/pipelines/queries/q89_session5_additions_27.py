# round-5 session-5 additions, batch 27: sliding-window velocity
# alert census, the newsvendor optimal stocking quantile with its
# exact cost, and integer water-filling budget allocation across
# sources.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply
from ...stages.window import segment_codes

_VA_WINDOW_S = 7 * 86400
_VA_K = 3
_NV_CU, _NV_CO = 3, 1        # underage / overage unit costs


@register("velocity_alert", sql="""
    WITH c AS (SELECT user_id,
                      CAST(count(*) OVER (PARTITION BY user_id
                           ORDER BY ts RANGE BETWEEN INTERVAL 7 DAYS
                           PRECEDING AND CURRENT ROW) AS BIGINT)
                        AS w
               FROM events),
    s AS (SELECT user_id, CAST(max(w) AS BIGINT) AS mw,
                 CAST(sum(CASE WHEN w >= {k} THEN 1 ELSE 0 END)
                      AS BIGINT) AS alerts
          FROM c GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN mw >= {k} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_users_alerted,
           CAST(sum(alerts) AS BIGINT) AS n_alert_events,
           CAST(max(mw) AS BIGINT) AS max_burst
    FROM s""".format(k=_VA_K))
def velocity_alert(sf_dir: str):
    """SLIDING-WINDOW VELOCITY ALERT census: for every event, the
    count of that user's events in the trailing 7 days (a
    TIME-RANGE window including timestamp peers, not a row count),
    alerting at >= {k} — the fraud/abuse rate-limit primitive that
    complements sessionize's gap splitting with a threshold trigger
    (ST6's trailing-window semantics as an alarm, not a feature).
    Counts are exact integer range-containment censuses — the
    window [t-7d, t] resolves by binary search over each user's
    sorted exact microsecond timestamps, so there is no float or
    frame-order concern anywhere. Scale plan: the scan runs INSIDE
    the one user_id exchange's sorted partitions (zero window state
    crosses partitions); partitions emit per-user (max, alerts)
    cells."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        us = g["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        rows = []
        start = 0
        n = len(us)
        for end in range(n + 1):
            if end == n or (end > start
                            and codes[end] != codes[start]):
                t = np.sort(us[start:end])
                lo = np.searchsorted(
                    t, t - _VA_WINDOW_S * 1000000, side="left")
                hi = np.searchsorted(t, t, side="right")
                w = hi - lo
                rows.append({
                    "user_id": int(uid[start]),
                    "mw": int(w.max()),
                    "alerts": int((w >= _VA_K).sum())})
                start = end
        return pd.DataFrame(rows)

    s = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts", "event_id"]),
        ["user_id"], ["mw", "alerts"])
    mw = s["mw"].to_numpy(np.int64)
    al = s["alerts"].to_numpy(np.int64)
    return pd.DataFrame({
        "n_users": [np.int64(len(s))],
        "n_users_alerted": [np.int64(int((mw >= _VA_K).sum()))],
        "n_alert_events": [np.int64(int(al.sum()))],
        "max_burst": [np.int64(int(mw.max()))]})


@register("newsvendor_stock", sql="""
    WITH d AS (SELECT l_shipdate AS day,
                      CAST(sum(l_quantity) AS BIGINT) AS q
               FROM lineitem GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    r AS (SELECT q, row_number() OVER (ORDER BY q, day) AS i
          FROM d),
    s AS (SELECT q AS s_star FROM r
          WHERE i = CAST(ceil({cu}.0 / ({cu} + {co})
                         * (SELECT n FROM n)) AS BIGINT)),
    c AS (SELECT CAST(sum(greatest(q - (SELECT s_star FROM s), 0))
                      AS BIGINT) AS under_units,
                 CAST(sum(greatest((SELECT s_star FROM s) - q, 0))
                      AS BIGINT) AS over_units
          FROM d)
    SELECT (SELECT n FROM n) AS n_days,
           (SELECT s_star FROM s) AS stock_level,
           (SELECT under_units FROM c) AS under_units,
           (SELECT over_units FROM c) AS over_units,
           CAST({cu} * (SELECT under_units FROM c)
                + {co} * (SELECT over_units FROM c) AS BIGINT)
             AS total_cost""".format(cu=_NV_CU, co=_NV_CO))
def newsvendor_stock(sf_dir: str):
    """NEWSVENDOR OPTIMAL STOCKING: the critical-ratio quantile
    cu/(cu+co) = 3/4 of the daily shipped-quantity distribution as
    the stock level, with the EXACT realized underage/overage units
    and total cost at that level — the decision-theoretic operator
    that turns value_quantiles' descriptive percentile into an
    action with a priced loss. Everything is integer: the order
    statistic (ceil(q*n)-th by quantity, day tie-break), the
    hinge sums, and the cost — zero float boundaries. Scale plan:
    per-batch (day, quantity) partials through the bounded
    day-domain combine; ranking and the two hinge folds are
    O(days) on the driver."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_shipdate", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["l_shipdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        g = pd.DataFrame({"day": day,
                          "q": b["l_quantity"]
                          .to_numpy(np.int64)}) \
            .groupby("day", as_index=False).sum()
        g["q"] = g["q"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["q"], exact_int=True)
    q = np.array([int(x) for x in d["q"]], np.int64)
    day = d["day"].to_numpy(np.int64)
    n = len(q)
    order = np.lexsort((day, q))
    k = int(np.ceil(np.float64(_NV_CU) / (_NV_CU + _NV_CO)
                    * np.float64(n)))
    s_star = int(q[order][k - 1])
    under = int(np.maximum(q - s_star, 0).sum())
    over = int(np.maximum(s_star - q, 0).sum())
    return pd.DataFrame({
        "n_days": [np.int64(n)], "stock_level": [np.int64(s_star)],
        "under_units": [np.int64(under)],
        "over_units": [np.int64(over)],
        "total_cost": [np.int64(_NV_CU * under
                                + _NV_CO * over)]})


@register("waterfill_alloc", sql="""
    WITH cap AS (SELECT source, CAST(count(*) AS BIGINT) AS c
                 FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(c) // 2 AS BIGINT) AS b
          FROM cap),
    srt AS (SELECT source, c,
                   CAST(row_number() OVER (ORDER BY c, source)
                        AS BIGINT) AS j,
                   CAST(sum(c) OVER (ORDER BY c, source) - c
                        AS BIGINT) AS pj
            FROM cap),
    lv AS (SELECT CAST(max(least(
                 ((SELECT b FROM t) - pj)
                 // ((SELECT k FROM t) - j + 1),
                 c)) AS BIGINT) AS lvl
           FROM srt),
    a0 AS (SELECT source, c,
                  least(c, (SELECT lvl FROM lv)) AS base
           FROM cap),
    rem AS (SELECT CAST((SELECT b FROM t) - sum(base) AS BIGINT)
                     AS r
            FROM a0),
    unsat AS (SELECT source,
                     CAST(row_number() OVER (ORDER BY source)
                          AS BIGINT) AS u
              FROM a0 WHERE c > base)
    SELECT a0.source, a0.c AS cap_docs,
           CAST(a0.base + CASE WHEN unsat.u IS NOT NULL
                               AND unsat.u <= (SELECT r FROM rem)
                          THEN 1 ELSE 0 END AS BIGINT)
             AS allocation
    FROM a0 LEFT JOIN unsat ON unsat.source = a0.source
    ORDER BY a0.source""")
def waterfill_alloc(sf_dir: str):
    """INTEGER WATER-FILLING allocation of a sampling budget (half
    the corpus) across sources: raise a common water level L so
    every source gets min(cap, L) documents — the max-min-fair
    allocation behind balanced mixing (source_mix weights by
    target; this solves the BUDGETED version with per-source
    caps), with the remainder distributed one document each to the
    first unsaturated sources in name order. ENTIRELY integer: the
    level maximizes over per-position closed forms
    (B - prefix) // (remaining) against the sorted caps, so both
    engines agree exactly on level, base allocations and remainder
    — no float anywhere. Scale plan: per-source caps are a bounded
    census; the sorted-prefix level search is O(sources) on the
    driver."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"source": b["source"].to_numpy(object),
                          "c": np.ones(len(b), np.int64)}) \
            .groupby("source", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    cap = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["c"])
    caps = sorted((int(r["c"]), r["source"])
                  for _, r in cap.iterrows())
    k = len(caps)
    total = sum(c for c, _ in caps)
    b = total // 2
    lvl = 0
    pj = 0
    for j, (c, _) in enumerate(caps, start=1):
        cand = min((b - pj) // (k - j + 1), c)
        lvl = max(lvl, cand)
        pj += c
    alloc = {s: min(c, lvl) for c, s in caps}
    r = b - sum(alloc.values())
    unsat = sorted(s for c, s in caps if c > alloc[s])
    for s in unsat[:r]:
        alloc[s] += 1
    out = pd.DataFrame({
        "source": sorted(alloc),
        "cap_docs": [int(dict((s, c) for c, s in caps)[s])
                     for s in sorted(alloc)],
        "allocation": [alloc[s] for s in sorted(alloc)]})
    out["cap_docs"] = out["cap_docs"].astype(np.int64)
    out["allocation"] = out["allocation"].astype(np.int64)
    return out
