# round-5 session-5 additions, batch 38: year-over-year co-purchase
# graph drift, price-stickiness census per part, and the
# psychological price-endings chi-square.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_GD_Y0, _GD_Y1 = 1996, 1997
_PS_PCT = 1            # unit-value change threshold, percent


@register("graph_drift", sql="""
    WITH li AS (SELECT l_orderkey, l_partkey,
                       CAST(year(l_shipdate) AS BIGINT) AS y
                FROM lineitem
                WHERE year(l_shipdate) IN ({y0}, {y1})),
    d AS (SELECT DISTINCT y, l_orderkey, l_partkey FROM li),
    e AS (SELECT a.y AS y, a.l_partkey AS pa, b.l_partkey AS pb
          FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                           AND a.y = b.y
                           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2, 3),
    c AS (SELECT pa, pb,
                 CAST(max(CASE WHEN y = {y0} THEN 1 ELSE 0 END)
                      AS BIGINT) AS in0,
                 CAST(max(CASE WHEN y = {y1} THEN 1 ELSE 0 END)
                      AS BIGINT) AS in1
          FROM e GROUP BY pa, pb),
    s AS (SELECT CAST(sum(in0) AS BIGINT) AS n0,
                 CAST(sum(in1) AS BIGINT) AS n1,
                 CAST(sum(in0 * in1) AS BIGINT) AS nb
          FROM c)
    SELECT n0 AS edges_year0, n1 AS edges_year1,
           nb AS edges_both,
           CAST(nb AS DOUBLE) / CAST(n0 + n1 - nb AS DOUBLE)
             AS edge_jaccard,
           1.0 - CAST(nb AS DOUBLE) / CAST(n0 AS DOUBLE)
             AS churn_rate
    FROM s""".format(y0=_GD_Y0, y1=_GD_Y1))
def graph_drift(sf_dir: str):
    """YEAR-OVER-YEAR CO-PURCHASE GRAPH DRIFT: the Jaccard overlap
    of the {y0} and {y1} co-order edge sets plus the edge churn
    rate — how fast does the product-affinity structure every
    basket model (basket_lift, part_pagerank, item_cosine_sim)
    trains on actually decay? The temporal-graph counterpart of
    snapshot_diff's keyed row churn. Edges are distinct pairs per
    year (one pair-keyed census, both membership flags folded with
    max), and all three counts plus both ratios are exact-int /
    shared-float. Scale plan: order rows co-locate through an
    (year, order)-keyed exchange for pair enumeration (the basket
    machinery's plan), then pairs co-locate through a (pa, pb)
    exchange; partitions emit 3 scalars."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_shipdate"])

    def rows(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_shipdate"].dt.year.to_numpy(np.int64)
        m = (y == _GD_Y0) | (y == _GD_Y1)
        return pd.DataFrame({
            "y": y[m],
            "ok": b["l_orderkey"].to_numpy(np.int64)[m],
            "pk": b["l_partkey"].to_numpy(np.int64)[m]}) \
            .drop_duplicates()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["y", "ok", "pk"])
        mm = g.merge(g, on=["y", "ok"])
        mm = mm[mm["pk_x"] < mm["pk_y"]]
        out = mm[["y", "pk_x", "pk_y"]].drop_duplicates()
        return out.rename(columns={"pk_x": "pa", "pk_y": "pb"})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.drop_duplicates(["y", "pa", "pb"])
        piv = a.assign(one=1).pivot_table(
            index=["pa", "pb"], columns="y", values="one",
            aggfunc="max", fill_value=0)
        in0 = piv.get(_GD_Y0, pd.Series(0, index=piv.index)) \
            .to_numpy(np.int64)
        in1 = piv.get(_GD_Y1, pd.Series(0, index=piv.index)) \
            .to_numpy(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n0": np.array([int(in0.sum())], np.int64),
            "n1": np.array([int(in1.sum())], np.int64),
            "nb": np.array([int((in0 & in1).sum())], np.int64)})

    s = _combine_partials(
        partition_map(
            partition_map(
                ds.map_batches(rows, batch_format="pandas"),
                ["y", "ok"], pairs, 16),
            ["pa", "pb"], cells, 16),
        ["j"], ["n0", "n1", "nb"])
    n0, n1 = int(s["n0"].iloc[0]), int(s["n1"].iloc[0])
    nb = int(s["nb"].iloc[0])
    return pd.DataFrame({
        "edges_year0": [np.int64(n0)],
        "edges_year1": [np.int64(n1)],
        "edges_both": [np.int64(nb)],
        "edge_jaccard": [np.float64(nb)
                         / np.float64(n0 + n1 - nb)],
        "churn_rate": [1.0 - np.float64(nb) / np.float64(n0)]})


@register("price_stickiness", sql="""
    WITH mv AS (SELECT l_partkey AS pk,
                       CAST(year(l_shipdate) * 12
                            + month(l_shipdate) AS BIGINT) AS mo,
                       CAST(sum(CAST(floor(l_extendedprice * 100
                                           + 0.5) AS BIGINT))
                            AS BIGINT) AS r,
                       CAST(sum(l_quantity) AS BIGINT) AS q
                FROM lineitem GROUP BY 1, 2),
    uv AS (SELECT pk, mo,
                  CAST(floor(CAST(r AS DOUBLE) / CAST(q AS DOUBLE)
                             + 0.5) AS BIGINT) AS u
           FROM mv),
    l AS (SELECT pk, u,
                 lag(u) OVER (PARTITION BY pk ORDER BY mo) AS pu
          FROM uv),
    ch AS (SELECT pk,
                  CAST(count(pu) AS BIGINT) AS n_pairs,
                  CAST(sum(CASE WHEN pu IS NOT NULL
                           AND abs(u - pu) * 100 > pu * {p}
                           THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_changes
           FROM l GROUP BY pk),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
                 CAST(sum(n_pairs) AS BIGINT) AS pairs,
                 CAST(sum(n_changes) AS BIGINT) AS changes,
                 CAST(sum(CASE WHEN n_pairs > 0
                          AND n_changes = 0
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rigid
          FROM ch)
    SELECT n_parts, pairs AS month_pairs, changes AS n_changes,
           n_rigid AS n_rigid_parts,
           CAST(changes AS DOUBLE) / CAST(pairs AS DOUBLE)
             AS change_frequency
    FROM s""".format(p=_PS_PCT))
def price_stickiness(sf_dir: str):
    """PRICE-STICKINESS CENSUS: per part, the monthly unit value
    (revenue over quantity, whole cents half-up) and the fraction
    of month-over-month transitions where it moves more than 1% —
    the menu-cost statistic macro-economists compute from scanner
    data, here auditing how often the effective price a basket
    model sees actually changes (plus the count of fully rigid
    parts). The change test is EXACT integer cross-multiplication
    (|u - pu|*100 > pu*1), unit values quantize from exact integer
    sums, and all censuses are integer folds. Scale plan:
    (part, month) cells fold through part-keyed partials; the lag
    runs inside each part's ordered month vector — bounded by the
    calendar, never by rows."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mo = (b["l_shipdate"].dt.year.to_numpy(np.int64) * 12
              + b["l_shipdate"].dt.month.to_numpy(np.int64))
        r = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "mo": mo, "r": r,
            "q": b["l_quantity"].to_numpy(np.int64)}) \
            .groupby(["pk", "mo"], as_index=False).sum()
        for c in ("r", "q"):
            g[c] = g[c].astype(np.int64)
        return g

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["pk", "mo"], as_index=False)[["r", "q"]] \
            .sum().sort_values(["pk", "mo"])
        u = np.floor(a["r"].to_numpy(np.float64)
                     / a["q"].to_numpy(np.float64)
                     + 0.5).astype(np.int64)
        pk = a["pk"].to_numpy(np.int64)
        same = np.zeros(len(a), bool)
        same[1:] = pk[1:] == pk[:-1]
        pu = np.roll(u, 1)
        valid = same
        chg = valid & (np.abs(u - pu) * 100 > pu * _PS_PCT)
        per = pd.DataFrame({"pk": pk,
                            "n_pairs": valid.astype(np.int64),
                            "n_changes": chg.astype(np.int64)}) \
            .groupby("pk", as_index=False).sum()
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n_parts": np.array([len(per)], np.int64),
            "pairs": np.array([int(per["n_pairs"].sum())],
                              np.int64),
            "changes": np.array([int(per["n_changes"].sum())],
                                np.int64),
            "n_rigid": np.array([int(((per["n_pairs"] > 0)
                                      & (per["n_changes"] == 0))
                                     .sum())], np.int64)})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["pk"], cells, 16),
        ["j"], ["n_parts", "pairs", "changes", "n_rigid"])
    npart = int(s["n_parts"].iloc[0])
    pairs = int(s["pairs"].iloc[0])
    changes = int(s["changes"].iloc[0])
    rigid = int(s["n_rigid"].iloc[0])
    return pd.DataFrame({
        "n_parts": [np.int64(npart)],
        "month_pairs": [np.int64(pairs)],
        "n_changes": [np.int64(changes)],
        "n_rigid_parts": [np.int64(rigid)],
        "change_frequency": [np.float64(changes)
                             / np.float64(pairs)]})


@register("price_endings", sql="""
    WITH e AS (SELECT CAST(floor(p_retailprice * 100 + 0.5)
                           AS BIGINT) % 100 AS cents
               FROM part),
    c AS (SELECT cents, CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY cents),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS k FROM c),
    q AS (SELECT CAST(sum(CAST(floor(
                 CAST((n * 100 - (SELECT tot FROM t))
                      * (n * 100 - (SELECT tot FROM t))
                      AS DOUBLE)
                 / (100.0 * CAST((SELECT tot FROM t) AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS chi_micro
          FROM c),
    nines AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n9
              FROM c WHERE cents = 99)
    SELECT (SELECT tot FROM t) AS n_parts,
           (SELECT k FROM t) AS n_distinct_endings,
           (SELECT n9 FROM nines) AS n_ending_99,
           CAST((SELECT n9 FROM nines) AS DOUBLE)
             / CAST((SELECT tot FROM t) AS DOUBLE)
             AS share_99,
           CAST((SELECT chi_micro FROM q) AS DOUBLE) / 1000000.0
             AS uniformity_chi2""")
def price_endings(sf_dir: str):
    """PRICE-ENDINGS ANALYSIS: the distribution of retail-price
    cent endings (mod 100) with the .99 share and a chi-square
    against uniform — the psychological-pricing / data-fabrication
    screen (benford_digits' leading-digit cousin at the OTHER end
    of the number). Note the chi-square sums over OBSERVED endings
    against the uniform 1/100 expectation (documented: absent
    endings contribute their expected mass only through present
    cells). Counts are exact; each (100 n - T)^2 / (100 T) term
    quantizes to micro units half-up before the fold. Scale plan:
    a 100-cell histogram census, map-only."""
    ds = rd.read_parquet(_path(sf_dir, "part"),
                         columns=["p_retailprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = (np.floor(b["p_retailprice"]
                          .to_numpy(np.float64) * 100 + 0.5)
                 .astype(np.int64)) % 100
        g = pd.DataFrame({"cents": cents,
                          "n": np.ones(len(b), np.int64)}) \
            .groupby("cents", as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["cents"], ["n"])
    n = c["n"].to_numpy(np.int64)
    tot = int(n.sum())
    k = len(c)
    n9 = int(c.loc[c["cents"] == 99, "n"].sum())
    chi = int(np.floor(
        ((n * 100 - tot).astype(np.float64)
         * (n * 100 - tot).astype(np.float64))
        / (100.0 * np.float64(tot))
        * 1000000.0 + 0.5).astype(np.int64).sum())
    return pd.DataFrame({
        "n_parts": [np.int64(tot)],
        "n_distinct_endings": [np.int64(k)],
        "n_ending_99": [np.int64(n9)],
        "share_99": [np.float64(n9) / np.float64(tot)],
        "uniformity_chi2": [np.float64(chi) / 1000000.0]})
