# round-5 session-5 additions, batch 45: TOPSIS multi-criteria part
# ranking, an (s, S) inventory policy simulation as an integer
# recursion, and the order-statistic confidence interval for the
# median.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)

_TOP_K = 10
_SS_S = 40              # reorder point (units)
_SS_CAP = 120           # order-up-to level
_MC_Z = 1.959963984540054


@register("topsis_parts", sql="""
    WITH m AS (SELECT l_partkey AS pk,
                      CAST(sum(CAST(floor(l_extendedprice * 100
                                          + 0.5) AS BIGINT))
                           AS BIGINT) AS rev,
                      CAST(sum(l_quantity) AS BIGINT) AS qty,
                      CAST(count(*) AS BIGINT) AS lines
               FROM lineitem GROUP BY pk),
    nrm AS (SELECT sqrt(CAST(sum(CAST(rev AS HUGEINT) * rev)
                             AS DOUBLE)) AS nr,
                   sqrt(CAST(sum(CAST(qty AS HUGEINT) * qty)
                             AS DOUBLE)) AS nq,
                   sqrt(CAST(sum(CAST(lines AS HUGEINT) * lines)
                             AS DOUBLE)) AS nl
            FROM m),
    u AS (SELECT pk,
                 CAST(floor(CAST(rev AS DOUBLE)
                      / (SELECT nr FROM nrm) * 1000000.0 + 0.5)
                      AS BIGINT) AS vr,
                 CAST(floor(CAST(qty AS DOUBLE)
                      / (SELECT nq FROM nrm) * 1000000.0 + 0.5)
                      AS BIGINT) AS vq,
                 CAST(floor(CAST(lines AS DOUBLE)
                      / (SELECT nl FROM nrm) * 1000000.0 + 0.5)
                      AS BIGINT) AS vl
          FROM m),
    ideal AS (SELECT CAST(max(vr) AS BIGINT) AS br,
                     CAST(max(vq) AS BIGINT) AS bq,
                     CAST(max(vl) AS BIGINT) AS bl,
                     CAST(min(vr) AS BIGINT) AS wr,
                     CAST(min(vq) AS BIGINT) AS wq,
                     CAST(min(vl) AS BIGINT) AS wl
              FROM u),
    d AS (SELECT pk,
                 sqrt(CAST(((SELECT br FROM ideal) - vr)
                      * ((SELECT br FROM ideal) - vr)
                      + ((SELECT bq FROM ideal) - vq)
                        * ((SELECT bq FROM ideal) - vq)
                      + ((SELECT bl FROM ideal) - vl)
                        * ((SELECT bl FROM ideal) - vl)
                      AS DOUBLE)) AS dpos,
                 sqrt(CAST((vr - (SELECT wr FROM ideal))
                      * (vr - (SELECT wr FROM ideal))
                      + (vq - (SELECT wq FROM ideal))
                        * (vq - (SELECT wq FROM ideal))
                      + (vl - (SELECT wl FROM ideal))
                        * (vl - (SELECT wl FROM ideal))
                      AS DOUBLE)) AS dneg
          FROM u)
    SELECT pk AS partkey,
           dneg / (dneg + dpos) AS closeness
    FROM d ORDER BY dneg / (dneg + dpos) DESC, pk
    LIMIT {k}""".format(k=_TOP_K))
def topsis_parts(sf_dir: str):
    """TOPSIS MULTI-CRITERIA RANKING of parts over three benefit
    criteria (revenue, quantity, line count): vector-normalize each
    criterion, measure Euclidean distance to the ideal and
    anti-ideal corners, rank by relative closeness d-/(d-+d+) —
    the decision-analysis aggregation that balances criteria where
    median_rank_agg only votes. Normalized scores quantize to
    micro units half-up (so the ideal/anti-ideal corners are exact
    integers and both distances are sqrt of exact integer sums);
    closeness and its ordering (DESC, partkey tie-break on
    identical doubles) are shared expressions. Scale plan:
    per-part 3-cell partials; norms are three scalar folds; the
    top-{k} is a bounded merge."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                       * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "rev": rev,
            "qty": b["l_quantity"].to_numpy(np.int64),
            "lines": np.ones(len(b), np.int64)}) \
            .groupby("pk", as_index=False).sum()
        for c in ("rev", "qty", "lines"):
            g[c] = g[c].astype(np.int64)
        return g

    m = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["pk"], ["rev", "qty", "lines"], exact_int=True)
    pk = m["pk"].to_numpy(np.int64)
    cols = {}
    for c in ("rev", "qty", "lines"):
        vals = [int(x) for x in m[c]]
        nrm = np.sqrt(np.float64(sum(v * v for v in vals)))
        cols[c] = np.array([int(np.floor(
            np.float64(v) / nrm * 1000000.0 + 0.5))
            for v in vals], np.int64)
    best = {c: int(cols[c].max()) for c in cols}
    worst = {c: int(cols[c].min()) for c in cols}
    dpos = np.sqrt(np.float64(
        (best["rev"] - cols["rev"]) ** 2
        + (best["qty"] - cols["qty"]) ** 2
        + (best["lines"] - cols["lines"]) ** 2).astype(np.float64))
    dneg = np.sqrt(np.float64(
        (cols["rev"] - worst["rev"]) ** 2
        + (cols["qty"] - worst["qty"]) ** 2
        + (cols["lines"] - worst["lines"]) ** 2)
        .astype(np.float64))
    close = dneg / (dneg + dpos)
    order = np.lexsort((pk, -close))[:_TOP_K]
    return pd.DataFrame({
        "partkey": pk[order],
        "closeness": close[order]}).reset_index(drop=True)


@register("ss_policy_sim", sql="""
    WITH RECURSIVE d AS (
      SELECT l_shipdate AS day,
             CAST(sum(l_quantity) AS BIGINT) AS dem
      FROM lineitem
      WHERE l_partkey = (SELECT min(l_partkey) FROM lineitem)
      GROUP BY 1),
    x AS (SELECT dem, CAST(row_number() OVER (ORDER BY day)
                           AS BIGINT) AS t
          FROM d),
    rec AS (
      SELECT t, dem,
             CASE WHEN {cap} - dem < {s}
                  THEN {cap} ELSE {cap} - dem END AS inv,
             CASE WHEN {cap} - dem < {s} THEN 1 ELSE 0 END
               AS orders,
             CASE WHEN dem > {cap} THEN dem - {cap} ELSE 0 END
               AS shortage
      FROM x WHERE t = 1
      UNION ALL
      SELECT x.t, x.dem,
             CASE WHEN r.inv - x.dem < {s}
                  THEN {cap}
                  ELSE r.inv - x.dem END,
             r.orders + CASE WHEN r.inv - x.dem < {s}
                             THEN 1 ELSE 0 END,
             r.shortage + CASE WHEN x.dem > r.inv
                               THEN x.dem - r.inv ELSE 0 END
      FROM rec r JOIN x ON x.t = r.t + 1),
    fin AS (SELECT *, row_number() OVER (ORDER BY t DESC) AS rn
            FROM rec)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT)
             AS n_demand_days,
           CAST(orders AS BIGINT) AS replenishments,
           CAST(shortage AS BIGINT) AS shortage_units,
           CAST(inv AS BIGINT) AS final_inventory
    FROM fin WHERE rn = 1""".format(s=_SS_S, cap=_SS_CAP))
def ss_policy_sim(sf_dir: str):
    """(s, S) INVENTORY POLICY SIMULATION for the lowest-keyed
    part's demand stream: start full at S={cap}, subtract each
    demand day, reorder up to S whenever the level falls below
    s={s} (instantaneous replenishment — documented), tallying
    replenishments and shortage units — the operations-research
    recursion (Lindley's equation family) that newsvendor_stock
    prices a single period of, run over the whole horizon. The
    entire state is integer (level, order count, shortage), so the
    day-ordered recursion is bit-identical to the recursive-CTE
    oracle (the rsi/bandit_replay policy). Scale plan: the demand
    stream folds to the bounded day domain through a part-filtered
    combine; the inherently sequential policy loop is O(days) on
    the driver."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_shipdate",
                                  "l_quantity"])

    mn = int(ds.map_batches(
        lambda b: pd.DataFrame({
            "mn": [int(b["l_partkey"].to_numpy(np.int64).min())]}),
        batch_format="pandas").to_pandas()["mn"].min())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b["l_partkey"].to_numpy(np.int64) == mn
        day = b["l_shipdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)[m]
        g = pd.DataFrame({
            "day": day,
            "dem": b["l_quantity"].to_numpy(np.int64)[m]}) \
            .groupby("day", as_index=False).sum()
        g["dem"] = g["dem"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["dem"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    inv = _SS_CAP
    orders = shortage = 0
    for _, r in d.iterrows():
        dem = int(r["dem"])
        if dem > inv:
            shortage += dem - inv
        inv = inv - dem
        if inv < _SS_S:
            inv = _SS_CAP
            orders += 1
    return pd.DataFrame({
        "n_demand_days": [np.int64(len(d))],
        "replenishments": [np.int64(orders)],
        "shortage_units": [np.int64(shortage)],
        "final_inventory": [np.int64(inv)]})


@register("median_ci", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    r AS (SELECT v, row_number() OVER (ORDER BY v, day) AS i
          FROM d),
    ks AS (SELECT
        CAST(floor(CAST((SELECT n FROM n) AS DOUBLE) / 2.0
             - {z} * sqrt(CAST((SELECT n FROM n) AS DOUBLE))
               / 2.0) AS BIGINT) AS lo,
        CAST(ceil(1.0 + CAST((SELECT n FROM n) AS DOUBLE) / 2.0
             + {z} * sqrt(CAST((SELECT n FROM n) AS DOUBLE))
               / 2.0) AS BIGINT) AS hi)
    SELECT (SELECT n FROM n) AS n_days,
           (SELECT v FROM r
            WHERE i = ((SELECT n FROM n) + 1) // 2)
             AS median_cents,
           (SELECT v FROM r WHERE i = (SELECT lo FROM ks))
             AS ci_lower_cents,
           (SELECT v FROM r WHERE i = (SELECT hi FROM ks))
             AS ci_upper_cents,
           (SELECT lo FROM ks) AS lower_rank,
           (SELECT hi FROM ks) AS upper_rank""".format(z=_MC_Z))
def median_ci(sf_dir: str):
    """ORDER-STATISTIC CONFIDENCE INTERVAL for the median daily
    revenue: the distribution-free 95% CI [x_(lo), x_(hi)] with
    ranks lo = floor(n/2 - z sqrt(n)/2), hi = ceil(1 + n/2 +
    z sqrt(n)/2) from the binomial normal approximation — an
    interval on the MEDIAN itself (hodges_lehmann estimates
    location; this bounds it) requiring no variance estimate at
    all. Ranks come from one shared float expression on n; the
    interval endpoints and the median are EXACT order statistics
    with day tie-break. Scale plan: bounded day-domain combine;
    ranking is O(days) driver work (the two-phase rank exchange at
    fleet scale)."""
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
        ["day"], ["v"], exact_int=True)
    day = d["day"].to_numpy(np.int64)
    v = np.array([int(x) for x in d["v"]], np.int64)
    n = len(v)
    order = np.lexsort((day, v))
    vs = v[order]
    fn_ = np.float64(n)
    lo = int(np.floor(fn_ / 2.0 - _MC_Z * np.sqrt(fn_) / 2.0))
    hi = int(np.ceil(1.0 + fn_ / 2.0 + _MC_Z * np.sqrt(fn_)
                     / 2.0))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "median_cents": [np.int64(int(vs[(n + 1) // 2 - 1]))],
        "ci_lower_cents": [np.int64(int(vs[lo - 1]))],
        "ci_upper_cents": [np.int64(int(vs[hi - 1]))],
        "lower_rank": [np.int64(lo)],
        "upper_rank": [np.int64(hi)]})
