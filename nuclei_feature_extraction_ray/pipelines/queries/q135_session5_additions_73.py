# round-5 session-5 additions, batch 73: the Wagner-Whitin
# lot-sizing dynamic program, Lin's concordance correlation, and
# Lempel-Ziv LZ76 complexity of the daily up/down sequence.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)

_WW_K = 5000000
_WW_H = 1


@register("wagner_whitin", sql="""
    WITH RECURSIVE wk AS (SELECT CAST(floor(epoch(CAST(l_shipdate AS
                                              TIMESTAMP)) / 86400)
                            AS BIGINT) // 7 AS w,
                       CAST(sum(CAST(l_quantity AS BIGINT))
                            AS BIGINT) AS d
                FROM lineitem GROUP BY 1),
    arr AS (SELECT list(CAST(d AS HUGEINT) ORDER BY w) AS dl,
                   CAST(count(*) AS BIGINT) AS tt
            FROM wk),
    dp AS (
        SELECT CAST(0 AS BIGINT) AS t,
               [CAST(0 AS HUGEINT)] AS f,
               [CAST(0 AS HUGEINT)] AS al,
               [CAST(0 AS HUGEINT)] AS bl
        UNION ALL
        SELECT dp.t + 1,
               list_append(dp.f, list_min(list_transform(
                   range(1, dp.t + 2),
                   j -> dp.f[j] + {K}
                        + {h} * (((dp.al[dp.t + 1]
                                   + (dp.t + 1)
                                     * arr.dl[dp.t + 1])
                                  - dp.al[j])
                                 - j * ((dp.bl[dp.t + 1]
                                         + arr.dl[dp.t + 1])
                                        - dp.bl[j]))))),
               list_append(dp.al, dp.al[dp.t + 1]
                           + (dp.t + 1) * arr.dl[dp.t + 1]),
               list_append(dp.bl, dp.bl[dp.t + 1]
                           + arr.dl[dp.t + 1])
        FROM dp, arr WHERE dp.t < arr.tt)
    SELECT (SELECT tt FROM arr) AS n_weeks,
           CAST((SELECT bl[tt + 1] FROM dp, arr
                 WHERE dp.t = arr.tt) AS BIGINT)
             AS total_demand,
           CAST((SELECT f[tt + 1] FROM dp, arr
                 WHERE dp.t = arr.tt) AS BIGINT)
             AS min_total_cost""".format(K=_WW_K, h=_WW_H))
def wagner_whitin(sf_dir: str):
    """WAGNER-WHITIN LOT SIZING over weekly shipped demand: the
    exact dynamic program f(t) = min_j f(j-1) + K + h * (holding
    cost of serving weeks j..t from one setup), with setup cost
    K={K} and unit holding {h} per week-index — the OPTIMAL
    benchmark that newsvendor_stock (single period) and
    ss_policy_sim (fixed policy) should be judged against; its
    O(T^2) recursion collapses to prefix sums A_t = sum i*d_i and
    B_t = sum d_i. Every cost is an exact integer (python int /
    HUGEINT); the oracle carries the f/A/B arrays as LISTs through
    a recursive CTE (the holt recursion policy, list-valued).
    Scale plan: weekly demand through the bounded week-domain
    combine; the DP is O(weeks^2) driver work on ~360 cells.
    """.format(K=_WW_K, h=_WW_H)
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_shipdate", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["l_shipdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        q = b["l_quantity"].to_numpy(np.float64).astype(np.int64)
        g = pd.DataFrame({"w": day // 7, "d": q}) \
            .groupby("w", as_index=False).sum()
        g["d"] = g["d"].astype(np.int64)
        return g

    wk = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["w"], ["d"], exact_int=True).sort_values("w")
    d = [int(x) for x in wk["d"]]
    tt = len(d)
    f = [0]
    al = [0]
    bl = [0]
    for t in range(tt):
        a_new = al[t] + (t + 1) * d[t]
        b_new = bl[t] + d[t]
        best = min(
            f[j - 1] + _WW_K
            + _WW_H * ((a_new - al[j - 1])
                       - j * (b_new - bl[j - 1]))
            for j in range(1, t + 2))
        f.append(best)
        al.append(a_new)
        bl.append(b_new)
    return pd.DataFrame({
        "n_weeks": [np.int64(tt)],
        "total_demand": [np.int64(bl[tt])],
        "min_total_cost": [np.int64(f[tt])]})


@register("lins_ccc", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      CAST(count(*) FILTER (
                          event_type = 'purchase') AS BIGINT)
                        AS x,
                      CAST(count(*) FILTER (
                          event_type = 'add_to_cart') AS BIGINT)
                        AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT)
                   AS syy,
                 CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                   AS sxy
          FROM d)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(2 * (n * sxy - sx * sy) AS DOUBLE)
           / CAST((n * sxx - sx * sx) + (n * syy - sy * sy)
                  + (sx - sy) * (sx - sy) AS DOUBLE)
             AS lins_ccc
    FROM m""")
def lins_ccc(sf_dir: str):
    """LIN'S CONCORDANCE CORRELATION between daily purchase and
    daily add-to-cart counts: ccc = 2*cov / (var_x + var_y +
    (mean_x - mean_y)^2) — the AGREEMENT coefficient that, unlike
    Pearson r (which is 1 for y = 2x + 3), punishes both scale and
    location bias, asking 'do carts track purchases one-for-one?'.
    Multiplying numerator and denominator by n^2 makes BOTH pure
    integers — 2*(n*Sxy - Sx*Sy) over (n*Sxx - Sx^2) + (n*Syy -
    Sy^2) + (Sx - Sy)^2 — so the whole statistic is ONE division
    of exact big ints. Scale plan: bounded day-domain combine;
    O(1) driver arithmetic."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        et = b["event_type"].to_numpy(object)
        g = pd.DataFrame({
            "day": day,
            "x": (et == "purchase").astype(np.int64),
            "y": (et == "add_to_cart").astype(np.int64)}) \
            .groupby("day", as_index=False).sum()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["x", "y"], exact_int=True)
    x = [int(v) for v in d["x"]]
    y = [int(v) for v in d["y"]]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    syy = sum(v * v for v in y)
    sxy = sum(a * b for a, b in zip(x, y))
    num = 2 * (n * sxy - sx * sy)
    den = (n * sxx - sx * sx) + (n * syy - sy * sy) \
        + (sx - sy) * (sx - sy)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "lins_ccc": [np.float64(num) / np.float64(den)]})


@register("lz_complexity", sql="""
    WITH RECURSIVE d AS (SELECT CAST(floor(epoch(CAST(o_orderdate
                                  AS TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT day, v, lag(v) OVER (ORDER BY day) AS pv FROM d),
    st AS (SELECT string_agg(CASE WHEN v > pv THEN '1'
                             ELSE '0' END, '' ORDER BY day) AS s,
                  CAST(count(*) AS BIGINT) AS n
           FROM x WHERE pv IS NOT NULL),
    p AS (
        SELECT CAST(1 AS BIGINT) AS start,
               CAST(1 AS BIGINT) AS pos,
               CAST(0 AS BIGINT) AS cnt
        UNION ALL
        SELECT CASE WHEN strpos(substr(st.s, 1,
                                       CAST(p.pos AS INTEGER)
                                       - 1),
                                substr(st.s,
                                       CAST(p.start AS INTEGER),
                                       CAST(p.pos - p.start
                                            AS INTEGER) + 1)) = 0
                    THEN p.pos + 1 ELSE p.start END,
               p.pos + 1,
               CASE WHEN strpos(substr(st.s, 1,
                                       CAST(p.pos AS INTEGER)
                                       - 1),
                                substr(st.s,
                                       CAST(p.start AS INTEGER),
                                       CAST(p.pos - p.start
                                            AS INTEGER) + 1)) = 0
                    THEN p.cnt + 1 ELSE p.cnt END
        FROM p, st WHERE p.pos <= st.n)
    SELECT st.n AS n_steps,
           p.cnt + CASE WHEN p.start <= st.n THEN 1 ELSE 0 END
             AS n_phrases,
           CAST(p.cnt + CASE WHEN p.start <= st.n
                        THEN 1 ELSE 0 END AS DOUBLE)
           * log2(CAST(st.n AS DOUBLE))
           / CAST(st.n AS DOUBLE) AS lz_norm
    FROM p, st WHERE p.pos = st.n + 1""")
def lz_complexity(sf_dir: str):
    """LEMPEL-ZIV (LZ76) COMPLEXITY of the daily revenue up/down
    sequence: parse the binary string (1 = revenue rose vs the
    previous day) into the minimal phrases whose content has not
    appeared earlier; the normalized count C * log2(n) / n tends
    to 1 for coin flips and to 0 for periodic structure — the
    COMPRESSIBILITY view of randomness that complements runs_test
    (exchange counts) and markov_entropy_rate (order-1 model):
    LZ76 is sensitive to structure of EVERY order. The parse is a
    deterministic integer scan (the oracle runs it as a recursive
    CTE over strpos, the double_changepoint de-recursion family);
    only the final normalization is float. Scale plan: bounded
    day-domain combine; the parse is O(days^2) driver work on the
    day string."""
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
    s = "".join("1" if b > a else "0" for a, b in zip(v, v[1:]))
    n = len(s)
    start = 1
    cnt = 0
    for pos in range(1, n + 1):
        cur = s[start - 1:pos]
        if s[:pos - 1].find(cur) < 0:
            cnt += 1
            start = pos + 1
    phrases = cnt + (1 if start <= n else 0)
    return pd.DataFrame({
        "n_steps": [np.int64(n)],
        "n_phrases": [np.int64(phrases)],
        "lz_norm": [np.float64(phrases) * np.log2(np.float64(n))
                    / np.float64(n)]})
