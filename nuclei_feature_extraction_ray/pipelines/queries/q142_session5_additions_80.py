# round-5 session-5 additions, batch 80: Rosenbaum sensitivity
# bounds for the daily sign test, the Oaxaca-Blinder rate-gap
# decomposition, and a 0/1 knapsack over top parts by list-DP.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_RB_GAMMAS = ("1.0", "1.25", "1.5", "2.0", "3.0")
_KN_TOP = 30
_KN_CAP = 50


@register("rosenbaum_bounds", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1
                               ELSE 0 END) AS BIGINT) AS t0,
                      CAST(sum(CASE WHEN user_id % 2 = 0
                                    AND event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT)
                        AS s0,
                      CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1
                               ELSE 0 END) AS BIGINT) AS t1,
                      CAST(sum(CASE WHEN user_id % 2 = 1
                                    AND event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT)
                        AS s1
               FROM events GROUP BY 1),
    v AS (SELECT CASE WHEN CAST(s1 AS HUGEINT) * t0
                           > CAST(s0 AS HUGEINT) * t1 THEN 1
                      WHEN CAST(s1 AS HUGEINT) * t0
                           < CAST(s0 AS HUGEINT) * t1 THEN -1
                      ELSE 0 END AS sgn
          FROM d WHERE t0 > 0 AND t1 > 0),
    s AS (SELECT CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS k,
                 CAST(sum(CASE WHEN sgn <> 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n
          FROM v),
    g AS (SELECT CAST(gm AS DOUBLE) AS gamma
          FROM (VALUES (1.0), (1.25), (1.5), (2.0), (3.0))
               t(gm))
    SELECT gamma,
           (CAST((SELECT k FROM s) AS DOUBLE)
            - CAST((SELECT n FROM s) AS DOUBLE)
              * (gamma / (1.0 + gamma)))
           / sqrt(CAST((SELECT n FROM s) AS DOUBLE)
                  * (gamma / (1.0 + gamma))
                  * (1.0 - gamma / (1.0 + gamma)))
             AS upper_z
    FROM g ORDER BY gamma""")
def rosenbaum_bounds(sf_dir: str):
    """ROSENBAUM SENSITIVITY BOUNDS for the daily sign test: for
    hidden-bias levels Gamma in {1, 1.25, 1.5, 2, 3}, the
    worst-case (upper-bound) z of the observed win count when an
    unobserved confounder could tilt each day's win odds to
    Gamma:1 — p+ = Gamma/(1+Gamma) replaces 1/2 in the null. The
    Gamma at which z crosses ~1.64 is HOW MUCH hidden bias it
    would take to explain the effect away, the standard
    observational-study robustness report that sign_test alone
    cannot give. Wins/losses are the same exact integer
    cross-multiplication census; each row's z is one shared float
    expression in the Gamma literal. Scale plan: bounded
    day-domain combine; the Gamma grid is O(1) driver work."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        arm = b["user_id"].to_numpy(np.int64) % 2
        pur = (b["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        g = pd.DataFrame({
            "day": day,
            "t0": (arm == 0).astype(np.int64),
            "s0": ((arm == 0) & (pur == 1)).astype(np.int64),
            "t1": (arm == 1).astype(np.int64),
            "s1": ((arm == 1) & (pur == 1)).astype(np.int64)}) \
            .groupby("day", as_index=False).sum()
        for c in ("t0", "s0", "t1", "s1"):
            g[c] = g[c].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["t0", "s0", "t1", "s1"], exact_int=True)
    k = n = 0
    for _, r in d.iterrows():
        t0, s0 = int(r["t0"]), int(r["s0"])
        t1, s1 = int(r["t1"]), int(r["s1"])
        if t0 <= 0 or t1 <= 0:
            continue
        lhs, rhs = s1 * t0, s0 * t1
        if lhs > rhs:
            k += 1
            n += 1
        elif lhs < rhs:
            n += 1
    rows = []
    for gs in _RB_GAMMAS:
        gamma = np.float64(float(gs))
        p = gamma / (1.0 + gamma)
        z = (np.float64(k) - np.float64(n) * p) \
            / np.sqrt(np.float64(n) * p * (1.0 - p))
        rows.append((gamma, z))
    return pd.DataFrame({
        "gamma": np.array([r[0] for r in rows], np.float64),
        "upper_z": np.array([r[1] for r in rows], np.float64)})


@register("oaxaca_blinder", sql="""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 2 AS BIGINT) AS g,
                      least(CAST(count(*) // 5 AS BIGINT), 3)
                        AS s,
                      CAST(max(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS p
               FROM events GROUP BY user_id),
    c AS (SELECT g, s, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(p) AS BIGINT) AS k
          FROM u GROUP BY g, s),
    t AS (SELECT CAST(sum(n) FILTER (g = 0) AS BIGINT) AS n0,
                 CAST(sum(k) FILTER (g = 0) AS BIGINT) AS k0,
                 CAST(sum(n) FILTER (g = 1) AS BIGINT) AS n1,
                 CAST(sum(k) FILTER (g = 1) AS BIGINT) AS k1
          FROM c),
    strata AS (SELECT CAST(ss AS BIGINT) AS s
               FROM (VALUES (0), (1), (2), (3)) v(ss)),
    w AS (SELECT strata.s,
                 CAST(COALESCE((SELECT n FROM c
                                WHERE g = 0 AND c.s = strata.s),
                               0) AS BIGINT) AS n0s,
                 CAST(COALESCE((SELECT k FROM c
                                WHERE g = 0 AND c.s = strata.s),
                               0) AS BIGINT) AS k0s,
                 CAST(COALESCE((SELECT n FROM c
                                WHERE g = 1 AND c.s = strata.s),
                               0) AS BIGINT) AS n1s,
                 CAST(COALESCE((SELECT k FROM c
                                WHERE g = 1 AND c.s = strata.s),
                               0) AS BIGINT) AS k1s
          FROM strata),
    q AS (SELECT
        CAST(floor((CAST(n1s AS DOUBLE)
                    / CAST((SELECT n1 FROM t) AS DOUBLE)
                    - CAST(n0s AS DOUBLE)
                      / CAST((SELECT n0 FROM t) AS DOUBLE))
                   * (CASE WHEN n0s > 0
                      THEN CAST(k0s AS DOUBLE)
                           / CAST(n0s AS DOUBLE)
                      ELSE 0.0 END) * 1000000000.0 + 0.5)
             AS BIGINT) AS qe,
        CAST(floor((CAST(n1s AS DOUBLE)
                    / CAST((SELECT n1 FROM t) AS DOUBLE))
                   * ((CASE WHEN n1s > 0
                       THEN CAST(k1s AS DOUBLE)
                            / CAST(n1s AS DOUBLE)
                       ELSE 0.0 END)
                      - (CASE WHEN n0s > 0
                         THEN CAST(k0s AS DOUBLE)
                              / CAST(n0s AS DOUBLE)
                         ELSE 0.0 END))
                   * 1000000000.0 + 0.5) AS BIGINT) AS qu
        FROM w)
    SELECT CAST((SELECT n1 FROM t) AS BIGINT) AS n_treatment,
           CAST((SELECT n0 FROM t) AS BIGINT) AS n_control,
           CAST((SELECT k1 FROM t) AS DOUBLE)
             / CAST((SELECT n1 FROM t) AS DOUBLE)
           - CAST((SELECT k0 FROM t) AS DOUBLE)
             / CAST((SELECT n0 FROM t) AS DOUBLE) AS total_gap,
           CAST(CAST(sum(qe) AS HUGEINT) AS DOUBLE)
             / 1000000000.0 AS explained,
           CAST(CAST(sum(qu) AS HUGEINT) AS DOUBLE)
             / 1000000000.0 AS unexplained
    FROM q""")
def oaxaca_blinder(sf_dir: str):
    """OAXACA-BLINDER (Kitagawa) DECOMPOSITION of the purchase-rate
    gap between arms, stratified by activity level (event-count
    buckets 0-3): gap = sum_s (w1s - w0s) * r0s [EXPLAINED by
    composition — the arms simply sit in different activity
    strata] + sum_s w1s * (r1s - r0s) [UNEXPLAINED — within-stratum
    rate differences], the econometric standard for wage gaps here
    answering 'is the arm difference a mix effect?' (the
    stratified sibling of simpson_paradox's reversal check). Each
    stratum's term is one shared float expression on exact integer
    cell counts, nano-quantized before the EXACT cross-stratum
    sum; the overall gap is exact-ratio arithmetic. Scale plan:
    one user exchange into the bounded (arm, stratum) grid; O(1)
    driver work."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64),
            "p": (b["event_type"].to_numpy(object)
                  == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False) \
            .agg({"n": "sum", "p": "max"})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False) \
            .agg({"n": "sum", "p": "max"})
        arm = (a["user_id"].to_numpy(np.int64) % 2) \
            .astype(np.int64)
        s = np.minimum(a["n"].to_numpy(np.int64) // 5, 3)
        out = pd.DataFrame({"g": arm, "s": s,
                            "n": np.ones(len(a), np.int64),
                            "k": a["p"].to_numpy(np.int64)}) \
            .groupby(["g", "s"], as_index=False).sum()
        for c in ("n", "k"):
            out[c] = out[c].astype(np.int64)
        return out

    c = _combine_partials(
        partition_map(ds.map_batches(partial,
                                     batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["g", "s"], ["n", "k"])
    cell = {(int(r["g"]), int(r["s"])): (int(r["n"]),
                                         int(r["k"]))
            for _, r in c.iterrows()}
    n0 = sum(v[0] for (g, _), v in cell.items() if g == 0)
    k0 = sum(v[1] for (g, _), v in cell.items() if g == 0)
    n1 = sum(v[0] for (g, _), v in cell.items() if g == 1)
    k1 = sum(v[1] for (g, _), v in cell.items() if g == 1)
    se = su = 0
    for s in range(4):
        n0s, k0s = cell.get((0, s), (0, 0))
        n1s, k1s = cell.get((1, s), (0, 0))
        r0 = np.float64(k0s) / np.float64(n0s) if n0s > 0 else 0.0
        r1 = np.float64(k1s) / np.float64(n1s) if n1s > 0 else 0.0
        qe = int(np.floor((np.float64(n1s) / np.float64(n1)
                           - np.float64(n0s) / np.float64(n0))
                          * r0 * 1000000000.0 + 0.5))
        qu = int(np.floor((np.float64(n1s) / np.float64(n1))
                          * (r1 - r0) * 1000000000.0 + 0.5))
        se += qe
        su += qu
    return pd.DataFrame({
        "n_treatment": [np.int64(n1)],
        "n_control": [np.int64(n0)],
        "total_gap": [np.float64(k1) / np.float64(n1)
                      - np.float64(k0) / np.float64(n0)],
        "explained": [np.float64(se) / 1000000000.0],
        "unexplained": [np.float64(su) / 1000000000.0]})


@register("budget_knapsack", sql="""
    WITH RECURSIVE p AS (SELECT l_partkey,
                      CAST(sum(CAST(floor(l_extendedprice * 100
                                          + 0.5) AS BIGINT))
                           AS BIGINT) AS rev,
                      CAST(sum(CAST(l_quantity AS BIGINT))
                           AS BIGINT) AS qty
               FROM lineitem GROUP BY 1),
    top AS (SELECT rev, qty FROM p
            ORDER BY rev DESC, l_partkey LIMIT {top}),
    tq AS (SELECT CAST(sum(qty) AS BIGINT) AS tot FROM top),
    it AS (SELECT list(CAST(rev AS HUGEINT)
                       ORDER BY rev DESC, qty) AS vl,
                  list(CAST(1 + qty * 100 // (SELECT tot FROM tq)
                            AS BIGINT)
                       ORDER BY rev DESC, qty) AS wl,
                  CAST(count(*) AS BIGINT) AS m
           FROM top),
    dp AS (
        SELECT CAST(0 AS BIGINT) AS i,
               list_transform(range(0, {cap} + 1),
                              c -> CAST(0 AS HUGEINT)) AS f
        UNION ALL
        SELECT dp.i + 1,
               list_transform(range(0, {cap} + 1),
                   c -> CASE WHEN c >= it.wl[dp.i + 1]
                        THEN greatest(dp.f[c + 1],
                                      dp.f[c - it.wl[dp.i + 1]
                                           + 1]
                                      + it.vl[dp.i + 1])
                        ELSE dp.f[c + 1] END)
        FROM dp, it WHERE dp.i < it.m)
    SELECT (SELECT m FROM it) AS n_items,
           CAST({cap} AS BIGINT) AS capacity,
           CAST(f[{cap} + 1] AS BIGINT) AS best_value_cents
    FROM dp, it WHERE i = it.m""".format(top=_KN_TOP,
                                         cap=_KN_CAP))
def budget_knapsack(sf_dir: str):
    """0/1 KNAPSACK over the top-{top} revenue parts: values are
    exact revenue cents, weights are each part's share of the
    group's quantity in percent (integer 1..101), capacity {cap}
    — 'which assortment maximizes revenue under a 50%-of-volume
    logistics budget', the discrete-optimization sibling of
    waterfill_alloc's continuous allocator. The DP over capacity
    is pure integer max-plus algebra; the oracle advances the
    whole DP array per item as a LIST in a recursive CTE (the
    wagner_whitin list-DP policy), bit-for-bit the same as the
    driver loop. Scale plan: part-keyed combine, exact top-{top}
    selection (rev, partkey ordering); the DP is O(items *
    capacity) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_extendedprice",
                                  "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["l_extendedprice"]
                         .to_numpy(np.float64) * 100 + 0.5) \
            .astype(np.int64)
        qty = b["l_quantity"].to_numpy(np.float64) \
            .astype(np.int64)
        g = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "rev": cents, "qty": qty}) \
            .groupby("l_partkey", as_index=False).sum()
        for c in ("rev", "qty"):
            g[c] = g[c].astype(np.int64)
        return g

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], ["rev", "qty"], exact_int=True)
    p = p.assign(rev=[int(x) for x in p["rev"]],
                 qty=[int(x) for x in p["qty"]])
    p = p.sort_values(["rev", "l_partkey"],
                      ascending=[False, True],
                      kind="mergesort").head(_KN_TOP)
    # item order must match the SQL list(... ORDER BY rev DESC,
    # qty): within the top set, (rev, qty) ordering
    items = sorted(zip(p["rev"], p["qty"]),
                   key=lambda t: (-t[0], t[1]))
    tot = sum(q for _, q in items)
    f = [0] * (_KN_CAP + 1)
    for rev, qty in items:
        w = 1 + qty * 100 // tot
        for c in range(_KN_CAP, -1, -1):
            if c >= w:
                f[c] = max(f[c], f[c - w] + rev)
    return pd.DataFrame({
        "n_items": [np.int64(len(items))],
        "capacity": [np.int64(_KN_CAP)],
        "best_value_cents": [np.int64(f[_KN_CAP])]})
