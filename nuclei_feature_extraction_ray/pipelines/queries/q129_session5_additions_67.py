# round-5 session-5 additions, batch 67: the inspection-paradox
# check on event gaps, bipartite C4 clustering of the
# supplier-part graph, and the Lo-MacKinlay variance ratio.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply, partition_map
from ...stages.window import segment_codes


@register("waiting_paradox", sql="""
    WITH s AS (SELECT user_id, ts, event_id,
                      lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_ts
               FROM events),
    g AS (SELECT CAST(floor(CAST(epoch_us(ts) - epoch_us(prev_ts)
                                 AS DOUBLE) / 60000000.0)
                      AS BIGINT) AS gap
          FROM s WHERE prev_ts IS NOT NULL AND ts > prev_ts),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(gap) AS HUGEINT) AS s,
                 CAST(sum(gap * gap) AS HUGEINT) AS s2
          FROM g)
    SELECT CAST(n AS BIGINT) AS n_gaps,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             AS mean_gap_min,
           CAST(s2 AS DOUBLE) / CAST(s AS DOUBLE)
             AS size_biased_mean_min,
           (CAST(s2 AS DOUBLE) / CAST(s AS DOUBLE))
           / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             AS inspection_ratio
    FROM m""")
def waiting_paradox(sf_dir: str):
    """INSPECTION-PARADOX CHECK on per-user inter-event gaps: the
    ordinary mean gap versus the SIZE-BIASED mean E[g^2]/E[g] (the
    gap a randomly-arriving observer lands in), whose ratio equals
    1 + CV^2 — the waiting-time paradox that makes 'average time
    between events' quietly wrong for on-call and freshness SLAs
    whenever gaps are bursty (gamma_fit_lag measures the
    burstiness; this prices it). Gap minutes are exact integers
    inside the user exchange; all three statistics are shared
    float expressions over exact moments. Scale plan: the
    event_transitions lag plan; partitions emit 3-cell moment
    partials."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        us = g["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        if len(us) < 2:
            return pd.DataFrame({
                "j": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "s": pd.Series(dtype=object),
                "s2": pd.Series(dtype=object)})
        same = codes[1:] == codes[:-1]
        gap_us = (us[1:] - us[:-1])[same]
        gap_us = gap_us[gap_us > 0]
        gap = np.floor(gap_us.astype(np.float64)
                       / 60000000.0).astype(np.int64) \
            .astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(gap)], np.int64),
            "s": [int(gap.sum())],
            "s2": [int((gap * gap).sum())]})

    s = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts",
                                     "event_id"]),
        ["j"], ["n", "s", "s2"], exact_int=True)
    n = int(s["n"].iloc[0])
    sm, s2 = int(s["s"].iloc[0]), int(s["s2"].iloc[0])
    mean = np.float64(sm) / np.float64(n)
    sb = np.float64(s2) / np.float64(sm)
    return pd.DataFrame({
        "n_gaps": [np.int64(n)], "mean_gap_min": [mean],
        "size_biased_mean_min": [sb],
        "inspection_ratio": [sb / mean]})


@register("bipartite_c4", sql="""
    WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
               FROM lineitem),
    sp AS (SELECT a.s AS s1, b.s AS s2,
                  CAST(count(*) AS BIGINT) AS shared
           FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
           GROUP BY 1, 2),
    sq AS (SELECT CAST(sum(shared * (shared - 1) // 2)
                       AS HUGEINT) AS squares,
                  CAST(count(*) AS BIGINT) AS supp_pairs,
                  CAST(sum(shared) AS HUGEINT) AS paths
           FROM sp)
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           (SELECT supp_pairs FROM sq) AS supplier_pairs,
           CAST((SELECT squares FROM sq) AS BIGINT) AS n_squares,
           CAST((SELECT squares FROM sq) AS DOUBLE)
             / CAST((SELECT paths FROM sq) AS DOUBLE)
             AS c4_per_shared_part""")
def bipartite_c4(sf_dir: str):
    """BIPARTITE C4 CLUSTERING of the supplier-part graph: the
    number of 4-cycles (two suppliers sharing TWO OR MORE parts
    form C(shared,2) squares each) per shared-part path — the
    bipartite analogue of triangle clustering (triangles cannot
    exist in a bipartite graph; squares are its smallest cycles),
    measuring how redundantly the supply base overlaps beyond
    supplier_concentration's single-part view. Shared-part counts
    come from one part-keyed pair enumeration (suppliers per part
    are bounded); squares and paths are exact integer folds with
    one final ratio. Scale plan: the basket machinery's pair plan
    on (part -> supplier) — per-part C(k,2) pairs, pair-keyed
    count exchange, 3 scalars out."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_partkey"])

    def rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "s": b["l_suppkey"].to_numpy(np.int64),
            "p": b["l_partkey"].to_numpy(np.int64)}) \
            .drop_duplicates()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["s", "p"])
        m = g.merge(g, on="p")
        m = m[m["s_x"] < m["s_y"]]
        out = m.groupby(["s_x", "s_y"], as_index=False).size() \
            .rename(columns={"size": "shared", "s_x": "s1",
                             "s_y": "s2"})
        out["shared"] = out["shared"].astype(np.int64)
        return out

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["s1", "s2"], as_index=False)["shared"] \
            .sum()
        sh = a["shared"].to_numpy(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "squares": [int((sh * (sh - 1) // 2).sum())],
            "supp_pairs": np.array([len(a)], np.int64),
            "paths": [int(sh.sum())]})

    n_edges = partition_map(
        ds.map_batches(rows, batch_format="pandas"),
        ["s", "p"],
        lambda g: g.drop_duplicates(["s", "p"]), 16).count()
    s = _combine_partials(
        partition_map(
            partition_map(ds.map_batches(rows,
                                         batch_format="pandas"),
                          ["p"], pairs, 16),
            ["s1", "s2"], cells, 16),
        ["j"], ["squares", "supp_pairs", "paths"],
        exact_int=True)
    sq = int(s["squares"].iloc[0])
    sp = int(s["supp_pairs"].iloc[0])
    paths = int(s["paths"].iloc[0])
    return pd.DataFrame({
        "n_edges": [np.int64(int(n_edges))],
        "supplier_pairs": [np.int64(sp)],
        "n_squares": [np.int64(sq)],
        "c4_per_shared_part": [np.float64(sq)
                               / np.float64(paths)]})


@register("variance_ratio", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),
    d1 AS (SELECT b.v - a.v AS dv FROM x a
           JOIN x b ON b.t = a.t + 1),
    d2 AS (SELECT b.v - a.v AS dv FROM x a
           JOIN x b ON b.t = a.t + 2),
    m1 AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(dv) AS HUGEINT) AS s,
                  CAST(sum(CAST(dv AS HUGEINT) * dv) AS HUGEINT)
                    AS s2
           FROM d1),
    m2 AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(dv) AS HUGEINT) AS s,
                  CAST(sum(CAST(dv AS HUGEINT) * dv) AS HUGEINT)
                    AS s2
           FROM d2),
    f AS (SELECT
        (CAST((SELECT s2 FROM m1) AS DOUBLE)
         - CAST((SELECT s FROM m1) AS DOUBLE)
           * CAST((SELECT s FROM m1) AS DOUBLE)
           / CAST((SELECT n FROM m1) AS DOUBLE))
        / CAST((SELECT n FROM m1) AS DOUBLE) AS v1,
        (CAST((SELECT s2 FROM m2) AS DOUBLE)
         - CAST((SELECT s FROM m2) AS DOUBLE)
           * CAST((SELECT s FROM m2) AS DOUBLE)
           / CAST((SELECT n FROM m2) AS DOUBLE))
        / CAST((SELECT n FROM m2) AS DOUBLE) AS v2)
    SELECT CAST((SELECT n FROM m1) AS BIGINT) AS n_diffs_1,
           CAST((SELECT n FROM m2) AS BIGINT) AS n_diffs_2,
           v1 AS var_1day, v2 AS var_2day,
           v2 / (2.0 * v1) AS variance_ratio
    FROM f""")
def variance_ratio(sf_dir: str):
    """LO-MACKINLAY VARIANCE RATIO VR(2) for daily revenue: the
    variance of 2-day changes over twice the variance of 1-day
    changes — exactly 1 for a random walk, below 1 for mean
    reversion, above for momentum; the random-walk diagnostic that
    complements adf_lite (unit root) and runs_test (signs) with
    the scaling-of-variance lens. Both difference populations fold
    as exact integer moments (python int / HUGEINT); the two
    variances and VR are shared float expressions. Scale plan:
    bounded day-domain combine; the two lagged scans are O(days)
    driver work."""
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
        ["day"], ["v"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]

    def moments(lag: int):
        dv = [v[i + lag] - v[i] for i in range(len(v) - lag)]
        n = len(dv)
        s = sum(dv)
        s2 = sum(x * x for x in dv)
        var = (np.float64(s2)
               - np.float64(s) * np.float64(s) / np.float64(n)) \
            / np.float64(n)
        return n, var

    n1, v1 = moments(1)
    n2, v2 = moments(2)
    return pd.DataFrame({
        "n_diffs_1": [np.int64(n1)], "n_diffs_2": [np.int64(n2)],
        "var_1day": [v1], "var_2day": [v2],
        "variance_ratio": [v2 / (2.0 * v1)]})
