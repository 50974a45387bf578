# round-5 session-5 additions, batch 82: weighted interval
# scheduling of promo windows, Huffman coding cost of the event-type
# alphabet, and closed-form 2-feature ridge regression.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue

_PW_W = 7
_RG_LAM = 1000


@register("promo_windows", sql="""
    WITH RECURSIVE """ + _DAILY_SQL + """,
    arr AS (SELECT list(CAST(v AS HUGEINT) ORDER BY day) AS vl,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS HUGEINT) AS tot
            FROM d),
    dp AS (
        SELECT CAST(0 AS BIGINT) AS i,
               [CAST(0 AS HUGEINT)] AS g,
               [CAST(0 AS HUGEINT)] AS pre
        UNION ALL
        SELECT dp.i + 1,
               list_append(dp.g,
                   CASE WHEN dp.i + 1 >= {W}
                   THEN greatest(dp.g[dp.i + 1],
                                 dp.g[dp.i + 2 - {W}]
                                 + (dp.pre[dp.i + 1]
                                    + arr.vl[dp.i + 1])
                                 - dp.pre[dp.i + 2 - {W}])
                   ELSE dp.g[dp.i + 1] END),
               list_append(dp.pre, dp.pre[dp.i + 1]
                           + arr.vl[dp.i + 1])
        FROM dp, arr WHERE dp.i < arr.n)
    SELECT (SELECT n FROM arr) AS n_days,
           CAST(g[n + 1] AS BIGINT) AS best_total_cents,
           CAST(g[n + 1] AS DOUBLE)
           / CAST((SELECT tot FROM arr) AS DOUBLE)
             AS captured_share
    FROM dp, arr WHERE i = arr.n""".format(W=_PW_W))
def promo_windows(sf_dir: str):
    """WEIGHTED INTERVAL SCHEDULING of {W}-day promo windows: the
    maximum total revenue coverable by NON-OVERLAPPING {W}-day
    stretches (in day-index space), via the classic DP g[i] =
    max(g[i-1], g[i-{W}] + rev(i-{W}+1..i)) — the planning
    counterpart of extreme_day_attribution: how much of the year's
    revenue could a non-overlapping campaign calendar actually
    capture? Window revenues are exact prefix-sum differences;
    the DP is pure integer max-plus; the oracle advances the g and
    prefix arrays as LISTs in a recursive CTE (the wagner_whitin
    list-DP policy). Scale plan: bounded day-domain combine; the
    DP is O(days) driver work.""".format(W=_PW_W)
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    tot = sum(v)
    g = [0]
    pre = [0]
    for i in range(1, n + 1):
        pre.append(pre[-1] + v[i - 1])
        if i >= _PW_W:
            g.append(max(g[i - 1],
                         g[i - _PW_W] + pre[i] - pre[i - _PW_W]))
        else:
            g.append(g[i - 1])
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "best_total_cents": [np.int64(g[n])],
        "captured_share": [np.float64(g[n])
                           / np.float64(tot)]})


@register("huffman_cost", sql="""
    WITH RECURSIVE h AS (SELECT event_type,
                      CAST(count(*) AS BIGINT) AS c
               FROM events GROUP BY 1),
    arr AS (SELECT list(CAST(c AS HUGEINT) ORDER BY c,
                        event_type) AS cl,
                   CAST(sum(c) AS HUGEINT) AS n,
                   CAST(count(*) AS BIGINT) AS k
            FROM h),
    ent AS (SELECT CAST(sum(CAST(floor(
                -(CAST(c AS DOUBLE)
                  / CAST((SELECT n FROM arr) AS DOUBLE))
                * log2(CAST(c AS DOUBLE)
                       / CAST((SELECT n FROM arr) AS DOUBLE))
                * 1000000000.0 + 0.5) AS BIGINT))
                AS HUGEINT) AS q
           FROM h),
    dp AS (
        SELECT CAST(0 AS BIGINT) AS i,
               (SELECT cl FROM arr) AS cl,
               CAST(0 AS HUGEINT) AS cost
        UNION ALL
        SELECT dp.i + 1,
               list_append(list_slice(list_sort(dp.cl), 3,
                                      len(dp.cl)),
                           list_sort(dp.cl)[1]
                           + list_sort(dp.cl)[2]),
               dp.cost + list_sort(dp.cl)[1]
               + list_sort(dp.cl)[2]
        FROM dp WHERE len(dp.cl) >= 2)
    SELECT CAST((SELECT n FROM arr) AS BIGINT) AS n_events,
           CAST((SELECT k FROM arr) AS BIGINT) AS n_symbols,
           CAST((SELECT cost FROM dp WHERE len(cl) = 1)
                AS DOUBLE)
           / CAST((SELECT n FROM arr) AS DOUBLE)
             AS huffman_bits,
           CAST((SELECT q FROM ent) AS DOUBLE) / 1000000000.0
             AS entropy_bits,
           (CAST((SELECT q FROM ent) AS DOUBLE) / 1000000000.0)
           / (CAST((SELECT cost FROM dp WHERE len(cl) = 1)
                   AS DOUBLE)
              / CAST((SELECT n FROM arr) AS DOUBLE))
             AS coding_efficiency""")
def huffman_cost(sf_dir: str):
    """HUFFMAN CODING COST of the event-type alphabet: expected
    bits/event of the optimal prefix code, computed by the greedy
    merge (total cost = sum of every merged pair's combined count
    — the standard identity, so no tree or depths are ever
    materialized), against the Shannon entropy floor — the
    log-compression sizing answer ('what would an optimally
    packed event-type column cost?') that doc_entropy's H alone
    doesn't give, since Huffman loses up to 1 bit/symbol on
    skewed alphabets. Merges are exact big-int operations on a
    sorted LIST (the oracle replays them in a recursive CTE);
    entropy terms are nano-quantized shared floats summed
    exactly. Scale plan: map-only histogram; the merge loop is
    O(symbols) driver work."""
    ds = _events(sf_dir, ["event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": b["event_type"].to_numpy(object),
            "c": np.ones(len(b), np.int64)}) \
            .groupby("event_type", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type"], ["c"])
    cs = [int(x) for x in h["c"]]
    n = sum(cs)
    k = len(cs)
    q = 0
    for c in cs:
        p = np.float64(c) / np.float64(n)
        q += int(np.floor(-(p) * np.log2(p) * 1000000000.0
                          + 0.5))
    cl = sorted(cs)
    cost = 0
    while len(cl) >= 2:
        cl.sort()
        m = cl[0] + cl[1]
        cl = cl[2:] + [m]
        cost += m
    hb = np.float64(cost) / np.float64(n)
    eb = np.float64(q) / 1000000000.0
    return pd.DataFrame({
        "n_events": [np.int64(n)], "n_symbols": [np.int64(k)],
        "huffman_bits": [hb], "entropy_bits": [eb],
        "coding_efficiency": [eb / hb]})


@register("ridge_2d", sql="""
    WITH u AS (SELECT user_id,
                      CAST(count(*) AS BIGINT) AS x1,
                      CAST(count(DISTINCT CAST(floor(epoch(ts)
                           / 86400) AS BIGINT)) AS BIGINT) AS x2,
                      CAST(count(*) FILTER (
                          event_type = 'purchase') AS BIGINT)
                        AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT)
                   AS s11,
                 CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT)
                   AS s12,
                 CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT)
                   AS s22,
                 CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT)
                   AS s1y,
                 CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT)
                   AS s2y
          FROM u)
    SELECT n AS n_users,
           CAST((s22 + {lam}) * s1y - s12 * s2y AS DOUBLE)
           / CAST((s11 + {lam}) * (s22 + {lam}) - s12 * s12
                  AS DOUBLE) AS beta_events,
           CAST((s11 + {lam}) * s2y - s12 * s1y AS DOUBLE)
           / CAST((s11 + {lam}) * (s22 + {lam}) - s12 * s12
                  AS DOUBLE) AS beta_days
    FROM m""".format(lam=_RG_LAM))
def ridge_2d(sf_dir: str):
    """CLOSED-FORM RIDGE REGRESSION (lambda = {lam}, no
    intercept) of per-user purchases on the two collinear
    activity features (total events, distinct active days): beta
    = (X'X + lambda*I)^-1 X'y via the exact 2x2 inverse — the
    regularization lens multi_ols lacks: these features are
    nearly collinear, OLS splits their shared signal erratically,
    and the ridge path shows the stabilized attribution. Every
    Gram and cross moment folds as exact big ints inside the user
    exchange; both betas are single divisions of exact integer
    determinant expressions. Scale plan: one user exchange
    (distinct-day counts are partition-local) into a 6-cell
    moment combine; O(1) driver arithmetic.""".format(lam=_RG_LAM)
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        day = (g["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        uid = g["user_id"].to_numpy(np.int64)
        pur = (g["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        a = pd.DataFrame({"u": uid, "d": day, "p": pur})
        per = a.groupby("u").agg(
            x1=("d", "size"), x2=("d", "nunique"),
            y=("p", "sum"))
        x1 = per["x1"].to_numpy(np.int64).astype(object)
        x2 = per["x2"].to_numpy(np.int64).astype(object)
        y = per["y"].to_numpy(np.int64).astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(per)], np.int64),
            "s11": [int((x1 * x1).sum())],
            "s12": [int((x1 * x2).sum())],
            "s22": [int((x2 * x2).sum())],
            "s1y": [int((x1 * y).sum())],
            "s2y": [int((x2 * y).sum())]})

    m = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts"]),
        ["j"], ["n", "s11", "s12", "s22", "s1y", "s2y"],
        exact_int=True)
    n = int(m["n"].iloc[0])
    s11 = int(m["s11"].iloc[0]) + _RG_LAM
    s12 = int(m["s12"].iloc[0])
    s22 = int(m["s22"].iloc[0]) + _RG_LAM
    s1y = int(m["s1y"].iloc[0])
    s2y = int(m["s2y"].iloc[0])
    det = s11 * s22 - s12 * s12
    return pd.DataFrame({
        "n_users": [np.int64(n)],
        "beta_events": [np.float64(s22 * s1y - s12 * s2y)
                        / np.float64(det)],
        "beta_days": [np.float64(s11 * s2y - s12 * s1y)
                      / np.float64(det)]})
