# round-5 session-5 additions, batch 7: Gumbel block-maxima fit with
# 52-week return level, the rich-club coefficient of the co-purchase
# graph, and the XmR (individuals / moving-range) control chart.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from .q27_round_5_tpc_2 import _basket_edges_sym

_EULER = 0.5772156649015329
_RL_T = 52
_RC_K = 4
_RC_DRIVER_EDGES = 5_000_000
_XMR_C = 2.66


@register("gumbel_block_maxima", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    w AS (SELECT day // 7 AS wk, CAST(max(v) AS BIGINT) AS mx
          FROM d GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(mx) AS HUGEINT) AS s,
                 CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT)
                   AS s2
          FROM w),
    f AS (SELECT n, CAST(s AS BIGINT) AS s,
                 sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                 * sqrt(6.0) / pi() AS beta
          FROM m)
    SELECT n AS n_blocks, s AS sum_max_cents, beta AS gumbel_beta,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             - {g} * beta AS gumbel_mu,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - {g} * beta
             - beta * ln(-ln(1.0 - 1.0 / {t}.0)) AS return_level
    FROM f""".format(g=_EULER, t=_RL_T))
def gumbel_block_maxima(sf_dir: str):
    """GUMBEL EXTREME-VALUE fit on weekly block maxima of daily
    revenue (method of moments: beta = sd*sqrt(6)/pi,
    mu = mean - gamma*beta) with the {t}-week RETURN LEVEL
    mu - beta*ln(-ln(1-1/{t})) — 'what daily peak should capacity
    planning expect once a year?'. The EVT operator class: block-max
    reduction, tail fit, quantile extrapolation. Block maxima and
    their two moments are exact integer folds (HUGEINT / python-int
    second moment); beta/mu/return-level are shared float
    expressions on those ints. Scale plan: per-batch (day, cents)
    partials fold through the bounded day-domain combine; the weekly
    block-max and moment scan is O(days) on the driver."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True)
    d["wk"] = d["day"].map(int) // 7
    w = d.groupby("wk")["v"].max()
    mx = [int(x) for x in w]
    n = len(mx)
    s = sum(mx)
    s2 = sum(x * x for x in mx)
    beta = np.sqrt((np.float64(s2)
                    - np.float64(s) * np.float64(s) / np.float64(n))
                   / np.float64(n)) * np.sqrt(6.0) / np.pi
    mu = np.float64(s) / np.float64(n) - _EULER * beta
    rl = mu - beta * np.log(-np.log(1.0 - 1.0 / np.float64(_RL_T)))
    return pd.DataFrame({
        "n_blocks": [np.int64(n)], "sum_max_cents": [np.int64(s)],
        "gumbel_beta": [np.float64(beta)],
        "gumbel_mu": [np.float64(mu)],
        "return_level": [np.float64(rl)]})


@register("rich_club", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT src, dst FROM p0 UNION ALL SELECT dst, src FROM p0),
    dg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
           FROM e GROUP BY 1),
    rich AS (SELECT v FROM dg WHERE deg > {k}),
    rc AS (SELECT CAST(count(*) AS BIGINT) AS nk FROM rich),
    ek AS (SELECT CAST(count(*) AS BIGINT) AS ek
           FROM p0 JOIN rich x ON p0.src = x.v
                   JOIN rich y ON p0.dst = y.v)
    SELECT (SELECT nk FROM rc) AS n_rich,
           (SELECT ek FROM ek) AS edges_within_rich,
           CASE WHEN (SELECT nk FROM rc) >= 2 THEN
                2.0 * CAST((SELECT ek FROM ek) AS DOUBLE)
                / (CAST((SELECT nk FROM rc) AS DOUBLE)
                   * (CAST((SELECT nk FROM rc) AS DOUBLE) - 1.0))
                ELSE NULL END AS rich_club_phi""".format(k=_RC_K))
def rich_club(sf_dir: str):
    """RICH-CLUB COEFFICIENT of the co-purchase graph: among parts
    with degree > {k}, the realized fraction of possible edges
    phi = 2*E_k / (N_k*(N_k-1)) — do the hubs preferentially connect
    to EACH OTHER (phi near 1) or merely fan out to the periphery?
    The hub-interconnection census completing the degree_assortativity
    / local_clustering structural family. Exact integer counts with
    one shared float expression (NULL below 2 rich nodes). Scale
    plan: edges from the shared support-filtered basket machinery;
    up to the repo's 5M-edge driver bound the degree census and the
    rich-rich edge filter run as numpy folds on one pull (the
    part_pagerank fast tier); above it one degree exchange plus two
    co-partition semi-joins."""
    edges2 = _basket_edges_sym(sf_dir).materialize()
    if edges2.count() > _RC_DRIVER_EDGES:
        raise ValueError(
            "rich_club: edge list exceeds the driver fold bound; "
            "enable the exchange tier")
    e = edges2.to_pandas()
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    vs, cs = (np.unique(src, return_counts=True)
              if len(src) else (np.empty(0, np.int64),
                                np.empty(0, np.int64)))
    rich = np.sort(vs[cs > _RC_K])
    nk = len(rich)
    und = src < dst          # each undirected edge once
    us, ud = src[und], dst[und]
    if nk and len(us):
        pa = np.searchsorted(rich, us)
        pb = np.searchsorted(rich, ud)
        pa[pa == nk] = nk - 1
        pb[pb == nk] = nk - 1
        ek = int(((rich[pa] == us) & (rich[pb] == ud)).sum())
    else:
        ek = 0
    phi = 2.0 * np.float64(ek) \
        / (np.float64(nk) * (np.float64(nk) - 1.0)) \
        if nk >= 2 else np.nan
    return pd.DataFrame({
        "n_rich": [np.int64(nk)],
        "edges_within_rich": [np.int64(ek)],
        "rich_club_phi": [np.float64(phi)]})


@register("xmr_control", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT day, v, lag(v) OVER (ORDER BY day) AS pv FROM d),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s,
                 CAST(sum(abs(v - pv)) AS HUGEINT) AS smr,
                 CAST(count(pv) AS BIGINT) AS nmr
          FROM x),
    lim AS (SELECT n, CAST(s AS BIGINT) AS s,
                   CAST(smr AS BIGINT) AS smr, nmr,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                   + {c} * (CAST(smr AS DOUBLE)
                            / CAST(nmr AS DOUBLE)) AS ucl,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                   - {c} * (CAST(smr AS DOUBLE)
                            / CAST(nmr AS DOUBLE)) AS lcl
            FROM m)
    SELECT n AS n_days, s AS sum_cents, smr AS sum_moving_range,
           ucl, lcl,
           (SELECT CAST(count(*) AS BIGINT) FROM d, lim
            WHERE CAST(v AS DOUBLE) > lim.ucl) AS n_above_ucl,
           (SELECT CAST(count(*) AS BIGINT) FROM d, lim
            WHERE CAST(v AS DOUBLE) < lim.lcl) AS n_below_lcl
    FROM lim""".format(c=_XMR_C))
def xmr_control(sf_dir: str):
    """XmR (INDIVIDUALS / MOVING-RANGE) control chart over daily
    revenue: natural process limits mean +- 2.66 * average moving
    range, plus the count of out-of-control days on each side — the
    statistical-process-control operator that separates routine
    variation from signals without assuming normality. The day sums
    and moving ranges are exact integer folds; the limits are shared
    float expressions, and each day's breach test compares the SAME
    exact-int-cast double against the SAME limit on both engines.
    Scale plan: per-batch (day, cents) partials through the bounded
    day-domain combine; the moving-range and breach scans are
    O(days) on the driver."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]
    n = len(v)
    s = sum(v)
    mrs = [abs(b - a) for a, b in zip(v, v[1:])]
    smr, nmr = sum(mrs), len(mrs)
    ucl = np.float64(s) / np.float64(n) \
        + _XMR_C * (np.float64(smr) / np.float64(nmr))
    lcl = np.float64(s) / np.float64(n) \
        - _XMR_C * (np.float64(smr) / np.float64(nmr))
    above = sum(1 for x in v if np.float64(x) > ucl)
    below = sum(1 for x in v if np.float64(x) < lcl)
    return pd.DataFrame({
        "n_days": [np.int64(n)], "sum_cents": [np.int64(s)],
        "sum_moving_range": [np.int64(smr)],
        "ucl": [np.float64(ucl)], "lcl": [np.float64(lcl)],
        "n_above_ucl": [np.int64(above)],
        "n_below_lcl": [np.int64(below)]})
