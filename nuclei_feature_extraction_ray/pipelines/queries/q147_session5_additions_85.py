# round-5 session-5 additions, batch 85: two-state Viterbi regime
# decoding of the up/down series, truncated Katz walk centrality,
# and 2-hop reachability from the top part.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue

# micro-quantized ln of the fixed HMM parameters (identical literal
# constants inlined in BOTH engines): stay 0.8, switch 0.2,
# emission match 0.7, mismatch 0.3, uniform init 0.5
_VT_STAY = -223144
_VT_SW = -1609438
_VT_HIT = -356675
_VT_MISS = -1203973
_VT_INIT = -693147

_BASKET_E_SQL = """
    de AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM de a JOIN de b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT src, dst FROM e0
          UNION ALL SELECT dst, src FROM e0)"""


@register("viterbi_regimes", sql="""
    WITH RECURSIVE """ + _DAILY_SQL + """,
    x AS (SELECT day, v, lag(v) OVER (ORDER BY day) AS pv FROM d),
    st AS (SELECT string_agg(CASE WHEN v > pv THEN '1'
                             ELSE '0' END, '' ORDER BY day) AS s,
                  CAST(count(*) AS BIGINT) AS n
           FROM x WHERE pv IS NOT NULL),
    dp AS (
        SELECT CAST(1 AS BIGINT) AS i,
               CAST({init} + CASE WHEN substr(st.s, 1, 1) = '0'
                    THEN {hit} ELSE {miss} END AS BIGINT) AS v0,
               CAST({init} + CASE WHEN substr(st.s, 1, 1) = '1'
                    THEN {hit} ELSE {miss} END AS BIGINT) AS v1,
               '0' AS p0, '1' AS p1
        FROM st
        UNION ALL
        SELECT dp.i + 1,
               greatest(dp.v0 + {stay}, dp.v1 + {sw})
               + CASE WHEN substr(st.s,
                             CAST(dp.i AS INTEGER) + 1, 1) = '0'
                 THEN {hit} ELSE {miss} END,
               greatest(dp.v1 + {stay}, dp.v0 + {sw})
               + CASE WHEN substr(st.s,
                             CAST(dp.i AS INTEGER) + 1, 1) = '1'
                 THEN {hit} ELSE {miss} END,
               CASE WHEN dp.v0 + {stay} >= dp.v1 + {sw}
                    THEN dp.p0 ELSE dp.p1 END || '0',
               CASE WHEN dp.v1 + {stay} >= dp.v0 + {sw}
                    THEN dp.p1 ELSE dp.p0 END || '1'
        FROM dp, st WHERE dp.i < st.n),
    fin AS (SELECT CASE WHEN v0 >= v1 THEN p0 ELSE p1 END AS p
            FROM dp, st WHERE i = st.n),
    sw AS (SELECT p, CAST(len(p) AS BIGINT) AS n,
                  CAST(len(list_filter(
                      range(1, CAST(len(p) AS BIGINT)),
                      k -> substr(p, CAST(k AS INTEGER), 1)
                           <> substr(p, CAST(k AS INTEGER) + 1,
                                     1))) AS BIGINT)
                    AS switches,
                  CAST(len(p) - len(replace(p, '1', ''))
                       AS BIGINT) AS bull_days
           FROM fin)
    SELECT n AS n_days, switches AS regime_switches,
           CAST(bull_days AS DOUBLE) / CAST(n AS DOUBLE)
             AS bull_share
    FROM sw""".format(init=_VT_INIT, stay=_VT_STAY, sw=_VT_SW,
                      hit=_VT_HIT, miss=_VT_MISS))
def viterbi_regimes(sf_dir: str):
    """TWO-STATE VITERBI REGIME DECODING of the daily up/down
    sequence under a fixed HMM (stay 0.8 / switch 0.2, emission
    0.7 for the matching direction): the maximum-a-posteriori
    bull/bear path, reported as regime-switch count and bull-day
    share — the HIDDEN-state segmentation that double_changepoint
    (two breaks) and markov_drift (observable chain) cannot
    express. All log-probabilities are the SAME micro-quantized
    integer literals in both engines, so the DP is exact integer
    max-plus with a deterministic prefer-stay tie-break; the
    oracle carries both candidate paths as strings through a
    recursive CTE (the lz_complexity string-automaton policy).
    Scale plan: bounded day-domain combine; the decode is O(days)
    driver work."""
    days, v = _daily_revenue(sf_dir)
    obs = "".join("1" if b > a else "0"
                  for a, b in zip(v, v[1:]))
    n = len(obs)
    v0 = _VT_INIT + (_VT_HIT if obs[0] == "0" else _VT_MISS)
    v1 = _VT_INIT + (_VT_HIT if obs[0] == "1" else _VT_MISS)
    p0, p1 = "0", "1"
    for i in range(1, n):
        o = obs[i]
        n0 = max(v0 + _VT_STAY, v1 + _VT_SW) \
            + (_VT_HIT if o == "0" else _VT_MISS)
        n1 = max(v1 + _VT_STAY, v0 + _VT_SW) \
            + (_VT_HIT if o == "1" else _VT_MISS)
        q0 = (p0 if v0 + _VT_STAY >= v1 + _VT_SW else p1) + "0"
        q1 = (p1 if v1 + _VT_STAY >= v0 + _VT_SW else p0) + "1"
        v0, v1, p0, p1 = n0, n1, q0, q1
    p = p0 if v0 >= v1 else p1
    switches = sum(1 for a, b in zip(p, p[1:]) if a != b)
    bull = p.count("1")
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "regime_switches": [np.int64(switches)],
        "bull_share": [np.float64(bull) / np.float64(n)]})


@register("katz_walks", sql="""
    WITH """ + _BASKET_E_SQL + """,
    w1 AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS w
           FROM e GROUP BY 1),
    w2 AS (SELECT e.src AS v,
                  CAST(sum(w1.w) AS HUGEINT) AS w
           FROM e JOIN w1 ON w1.v = e.dst GROUP BY 1),
    w3 AS (SELECT e.src AS v,
                  CAST(sum(w2.w) AS HUGEINT) AS w
           FROM e JOIN w2 ON w2.v = e.dst GROUP BY 1),
    k AS (SELECT w1.v,
                 CAST(100 * w1.w
                      + 10 * COALESCE(w2.w, 0)
                      + COALESCE(w3.w, 0) AS BIGINT) AS score
          FROM w1
          LEFT JOIN w2 ON w2.v = w1.v
          LEFT JOIN w3 ON w3.v = w1.v)
    SELECT CAST(v AS BIGINT) AS part, score AS katz_milli
    FROM k ORDER BY score DESC, v LIMIT 5""")
def katz_walks(sf_dir: str):
    """TRUNCATED KATZ CENTRALITY (3 hops, alpha = 0.1) on the
    support-filtered co-purchase graph: score = sum over k <= 3 of
    alpha^k * (walks of length k ending at the part), scaled by
    1000 so every term is an EXACT integer walk count (100*deg +
    10*two-walks + three-walks) — the walk-counting middle ground
    between raw degree and part_pagerank's equilibrium: Katz
    credits a part for sitting near well-connected parts even
    before the chain mixes. Three exact aggregation rounds over
    the shared basket edges; top-5 by exact (score, part) order.
    Scale plan: the basket machinery's bounded edge set; each hop
    is one edge-keyed aggregation exchange (here the
    part_pagerank driver-fold tier)."""
    from .q27_round_5_tpc_2 import _basket_edges_sym
    e = _basket_edges_sym(sf_dir).to_pandas()
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    w1 = {}
    for s in src:
        w1[s] = w1.get(s, 0) + 1
    w2 = {}
    for s, t in zip(src, dst):
        w2[s] = w2.get(s, 0) + w1.get(t, 0)
    w3 = {}
    for s, t in zip(src, dst):
        w3[s] = w3.get(s, 0) + w2.get(t, 0)
    rows = sorted(((100 * w1[v] + 10 * w2.get(v, 0)
                    + w3.get(v, 0), v) for v in w1),
                  key=lambda t: (-t[0], t[1]))[:5]
    return pd.DataFrame({
        "part": np.array([r[1] for r in rows], np.int64),
        "katz_milli": np.array([r[0] for r in rows], np.int64)})


@register("reach_2hop", sql="""
    WITH """ + _BASKET_E_SQL + """,
    rev AS (SELECT l_partkey,
                   CAST(sum(CAST(floor(l_extendedprice * 100
                                       + 0.5) AS BIGINT))
                        AS BIGINT) AS r
            FROM lineitem GROUP BY 1),
    seed AS (SELECT l_partkey AS p FROM rev
             ORDER BY r DESC, l_partkey LIMIT 1),
    n1 AS (SELECT DISTINCT dst AS v FROM e
           WHERE src = (SELECT p FROM seed)),
    n2 AS (SELECT DISTINCT e.dst AS v
           FROM e JOIN n1 ON n1.v = e.src),
    uni AS (SELECT v FROM n1 UNION
            SELECT v FROM n2 UNION
            SELECT p FROM seed),
    verts AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS nv
              FROM e)
    SELECT (SELECT p FROM seed) AS seed_part,
           CAST((SELECT count(*) FROM n1) AS BIGINT) AS n_1hop,
           CAST((SELECT count(*) FROM uni) AS BIGINT)
             AS n_within_2,
           CAST((SELECT count(*) FROM uni) AS DOUBLE)
           / CAST((SELECT nv FROM verts) AS DOUBLE)
             AS reach_share""")
def reach_2hop(sf_dir: str):
    """2-HOP REACHABILITY from the top-revenue part in the
    co-purchase graph: how many parts sit within two
    recommendation hops of the flagship product, and what share
    of the whole graph that is — thesmall-world blast-radius
    question ('one promo on the hero SKU touches how much of the
    catalog?') that katz_walks WEIGHTS but never counts
    distinctly. Seed selection is an exact (revenue, partkey)
    argmax; reach sets are exact distinct unions. Scale plan:
    basket edges + two semi-join exchanges (here the driver-fold
    tier); the union is a distinct-count combine."""
    from .q27_round_5_tpc_2 import _basket_edges_sym
    e = _basket_edges_sym(sf_dir).to_pandas()
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)

    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["l_extendedprice"]
                         .to_numpy(np.float64) * 100 + 0.5) \
            .astype(np.int64)
        g = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "r": cents}).groupby("l_partkey",
                                 as_index=False).sum()
        g["r"] = g["r"].astype(np.int64)
        return g

    rev = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], ["r"], exact_int=True)
    seed = min(((-int(r["r"]), int(r["l_partkey"]))
                for _, r in rev.iterrows()))[1]
    adj = {}
    for s, t in zip(src, dst):
        adj.setdefault(int(s), set()).add(int(t))
    n1 = adj.get(seed, set())
    uni = {seed} | set(n1)
    for v in n1:
        uni |= adj.get(v, set())
    nv = len(adj)
    return pd.DataFrame({
        "seed_part": [np.int64(seed)],
        "n_1hop": [np.int64(len(n1))],
        "n_within_2": [np.int64(len(uni))],
        "reach_share": [np.float64(len(uni))
                        / np.float64(nv)]})
