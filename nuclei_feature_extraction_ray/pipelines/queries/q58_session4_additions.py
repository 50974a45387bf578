# round-5 session-4 additions, batch 1: degree assortativity of the
# co-purchase graph, t-closeness over the k-anonymity QI groups, and a
# KMV (k-minimum-values) distinct sketch with an exact md5 twin.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map


@register("degree_assortativity", sql="""
    WITH grain AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM lineitem),
    pairs AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
              FROM grain a JOIN grain b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT u AS node FROM pairs
                  UNION ALL SELECT v FROM pairs)
            GROUP BY node),
    e AS (SELECT du.d AS dx, dv.d AS dy
          FROM pairs p
          JOIN deg du ON p.u = du.node
          JOIN deg dv ON p.v = dv.node),
    m AS (SELECT CAST(2 * count(*) AS HUGEINT) AS n,
                 CAST(sum(CAST(dx AS HUGEINT) + dy) AS HUGEINT) AS sx,
                 CAST(sum(CAST(dx AS HUGEINT) * dx
                          + CAST(dy AS HUGEINT) * dy) AS HUGEINT)
                   AS sxx,
                 CAST(2 * sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT)
                   AS sxy
          FROM e)
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(n / 2 AS BIGINT) AS n_edges,
           CAST(sx AS BIGINT) AS sum_deg_endpoints,
           CAST(n * sxy - sx * sx AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS assortativity
    FROM m""")
def degree_assortativity(sf_dir: str):
    """DEGREE ASSORTATIVITY of the co-purchase part graph (Newman
    2002): the Pearson correlation of endpoint degrees over the
    directed edge list — positive means hubs buy with hubs. Every
    moment is an exact integer: each undirected edge (u,v) contributes
    (du,dv) AND (dv,du), so Sx=Sy and Sxx=Syy by symmetry and the
    whole statistic is ONE final double division of two python-int
    expressions — bit-exact vs the oracle. Scale plan: the distinct
    (order,part) grain and the distinct-pair dedup each ride one hash
    exchange (per-order fanout is bounded by basket size); degrees
    fold via the guarded driver combine (part is a DIMENSION); the
    degree map broadcasts into a vectorized moment pass over the edge
    partitions, so nothing edge-grain ever reaches the driver."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def order_pairs(g: pd.DataFrame) -> pd.DataFrame:
        from ...stages.dedup import segment_all_pairs
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        g = g.sort_values(["l_orderkey", "l_partkey"],
                          kind="mergesort")
        ok = g["l_orderkey"].to_numpy(np.int64)
        pk = g["l_partkey"].to_numpy(np.int64)
        i, j = segment_all_pairs(ok)
        return pd.DataFrame({"u": pk[i], "v": pk[j]})

    pairs = partition_map(ds, ["l_orderkey"], order_pairs, 16)

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])[["u", "v"]]

    edges = partition_map(pairs, ["u", "v"], dedup_pairs, 16)
    edges = edges.materialize()

    def deg_part(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "node": np.concatenate([b["u"].to_numpy(np.int64),
                                    b["v"].to_numpy(np.int64)]),
            "d": 1}).groupby("node", as_index=False).sum()
        d["d"] = d["d"].astype(np.int64)
        return d

    def deg_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("node", as_index=False)["d"].sum()
        d["d"] = d["d"].astype(np.int64)
        return d

    # fold block partials to TRUE node grain through one node
    # exchange BEFORE the driver pull, so the guarded combine sees
    # at most one row per part (a dimension), not nodes x blocks.
    deg = _combine_partials(
        partition_map(
            edges.map_batches(deg_part, batch_format="pandas"),
            ["node"], deg_fold, 8),
        ["node"], ["d"])
    nodes_sorted = np.sort(deg["node"].to_numpy(np.int64))
    deg_sorted = deg.sort_values("node")["d"].to_numpy(np.int64)
    import ray as _ray
    deg_ref = _ray.put((nodes_sorted, deg_sorted))

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        nd, dg = _ray.get(deg_ref)
        du = dg[np.searchsorted(nd, b["u"].to_numpy(np.int64))]
        dv = dg[np.searchsorted(nd, b["v"].to_numpy(np.int64))]
        return pd.DataFrame({
            "k": np.zeros(1, np.int64),
            "ne": np.array([len(b)], np.int64),
            "sx": np.array([int(du.sum() + dv.sum())], np.int64),
            "sxx": np.array([int(np.dot(du, du) + np.dot(dv, dv))],
                            np.int64),
            "sxy": np.array([2 * int(np.dot(du, dv))], np.int64)})

    s = _combine_partials(
        edges.map_batches(moments, batch_format="pandas"),
        ["k"], ["ne", "sx", "sxx", "sxy"], exact_int=True)
    ne = int(s["ne"].iloc[0])
    n = 2 * ne
    sx, sxx, sxy = (int(s["sx"].iloc[0]), int(s["sxx"].iloc[0]),
                    int(s["sxy"].iloc[0]))
    r = np.float64(n * sxy - sx * sx) / np.float64(n * sxx - sx * sx)
    return pd.DataFrame({
        "n_nodes": [np.int64(len(deg))],
        "n_edges": [np.int64(ne)],
        "sum_deg_endpoints": [np.int64(sx)],
        "assortativity": [r]})


_TCLOSE_BINS = 10
_TCLOSE_WIDTH = 500


@register("t_closeness", sql="""
    WITH b AS (SELECT lang, source,
                      CAST(least({m} - 1, n_chars // {w}) AS BIGINT)
                        AS bkt
               FROM documents),
    cnt AS (SELECT lang, source, bkt,
                   CAST(count(*) AS HUGEINT) AS c
            FROM b GROUP BY 1, 2, 3),
    gl AS (SELECT bkt, CAST(count(*) AS HUGEINT) AS g
           FROM b GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM b),
    grp AS (SELECT lang, source, CAST(sum(c) AS HUGEINT) AS ng
            FROM cnt GROUP BY 1, 2),
    grid AS (SELECT grp.lang, grp.source, gl.bkt, grp.ng, gl.g,
                    COALESCE(cnt.c, 0) AS c
             FROM grp CROSS JOIN gl
             LEFT JOIN cnt ON cnt.lang = grp.lang
                          AND cnt.source = grp.source
                          AND cnt.bkt = gl.bkt),
    pre AS (SELECT lang, source, ng, bkt,
                   sum(c * (SELECT n FROM tot) - g * ng)
                     OVER (PARTITION BY lang, source ORDER BY bkt)
                     AS pd
            FROM grid),
    emd AS (SELECT lang, source, ng,
                   CAST(sum(CASE WHEN bkt < {m} - 1 THEN abs(pd)
                            ELSE 0 END) AS HUGEINT) AS e
            FROM pre GROUP BY 1, 2, 3)
    SELECT lang, source, CAST(ng AS BIGINT) AS n_group,
           CAST(e AS DOUBLE)
             / (CAST(ng AS DOUBLE)
                * CAST((SELECT n FROM tot) AS DOUBLE)
                * CAST({m} - 1 AS DOUBLE)) AS t_emd,
           CAST(CAST(e AS DOUBLE)
             / (CAST(ng AS DOUBLE)
                * CAST((SELECT n FROM tot) AS DOUBLE)
                * CAST({m} - 1 AS DOUBLE)) > 0.2 AS BOOLEAN)
             AS violates_t02
    FROM emd ORDER BY lang, source""".format(m=_TCLOSE_BINS,
                                             w=_TCLOSE_WIDTH))
def t_closeness(sf_dir: str):
    """T-CLOSENESS census completing the privacy trio (k_anonymize,
    l_diversity): for each quasi-identifier group (lang, source) the
    Earth Mover's Distance between the group's distribution of the
    ORDERED sensitive attribute (doc length, {m} fixed buckets of
    {w} chars) and the corpus-global distribution — the ordered-EMD
    closed form (1/(m-1)) * sum_i |prefix_i(p - q)|. The prefix
    differences are computed on the COMMON denominator (c_i*N -
    g_i*ng), so the entire EMD numerator is an exact python integer
    at any corpus size and the final t is ONE shared double
    expression — bit-exact vs the oracle. Scale plan: the partial
    grid is bounded (langs x sources x m buckets), one driver
    combine; no shuffle touches row grain."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "source", "n_chars"])
    m = _TCLOSE_BINS

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bkt = np.minimum(m - 1, b["n_chars"].to_numpy(np.int64)
                         // _TCLOSE_WIDTH)
        g = pd.DataFrame({"lang": b["lang"], "source": b["source"],
                          "bkt": bkt, "c": np.ones(len(b), np.int64)}) \
            .groupby(["lang", "source", "bkt"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    cnt = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "source", "bkt"], ["c"])
    glob = cnt.groupby("bkt")["c"].sum().astype(int).to_dict()
    g_arr = [int(glob.get(i, 0)) for i in range(m)]
    n_tot = sum(g_arr)

    rows = []
    for (lang, source), g in cnt.groupby(["lang", "source"]):
        cs = {int(b): int(c) for b, c in zip(g["bkt"], g["c"])}
        ng = sum(cs.values())
        pref, e = 0, 0
        for i in range(m - 1):
            pref += cs.get(i, 0) * n_tot - g_arr[i] * ng
            e += abs(pref)
        t = np.float64(e) / (np.float64(ng) * np.float64(n_tot)
                             * np.float64(m - 1))
        rows.append({"lang": lang, "source": source,
                     "n_group": np.int64(ng), "t_emd": t,
                     "violates_t02": bool(t > 0.2)})
    return pd.DataFrame(rows).sort_values(
        ["lang", "source"], kind="mergesort").reset_index(drop=True)


_KMV_K = 64


@register("kmv_distinct", sql="""
    WITH h AS (SELECT DISTINCT o_orderpriority AS priority,
                      md5_number_upper(CAST(o_custkey AS VARCHAR))
                        AS h
               FROM orders),
    r AS (SELECT priority, h,
                 row_number() OVER (PARTITION BY priority
                                    ORDER BY h) AS rk,
                 count(*) OVER (PARTITION BY priority) AS nd
          FROM h)
    SELECT priority,
           CAST(least(nd, {k}) AS BIGINT) AS k_used,
           CAST(h AS DOUBLE) AS kth_hash_d,
           CASE WHEN nd < {k} THEN CAST(nd AS DOUBLE)
                ELSE ({k}.0 - 1.0) * 18446744073709551616.0
                     / CAST(h AS DOUBLE) END AS est_distinct
    FROM r WHERE rk = least(nd, {k})
    ORDER BY priority""".format(k=_KMV_K))
def kmv_distinct(sf_dir: str):
    """KMV (k-minimum-values / bottom-k) DISTINCT sketch per order
    priority, md5-portable and EXACTLY oracled (the hll_md5 pattern
    applied to the bottom-k estimator): keep the k=64 smallest md5
    hashes of the distinct custkeys per group; below k distinct the
    sketch IS the exact count, above it D-hat = (k-1) * 2^64 / h_k.
    Hash values, k-th order statistic and the one-division estimate
    are bit-equal to the DuckDB twin. Scale plan: per-batch local
    bottom-k partials (<= groups x k rows each) merge on the driver
    by union + k-smallest — the classic mergeable-sketch shape,
    shuffle-free at any corpus size."""
    from ...functions.hashing import md5_id64_flat
    k = _KMV_K
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderpriority", "o_custkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.drop_duplicates(["o_orderpriority", "o_custkey"])
        hv = md5_id64_flat(g["o_custkey"].to_numpy(np.int64),
                           "")[0].byteswap()
        d = pd.DataFrame({"priority": g["o_orderpriority"].to_numpy(),
                          "h": hv}).drop_duplicates()
        return d.sort_values(["priority", "h"], kind="mergesort") \
                .groupby("priority", as_index=False).head(k)

    parts = ds.map_batches(partial, batch_format="pandas") \
        .limit(1_000_001).to_pandas()
    if len(parts) > 1_000_000:
        raise ValueError("kmv_distinct: sketch partials exceeded "
                         "the driver bound")
    rows = []
    for priority, g in parts.groupby("priority"):
        hs = np.unique(g["h"].to_numpy(np.uint64))
        nd = len(hs)
        k_used = min(nd, k)
        kth = int(hs[k_used - 1])
        est = (np.float64(nd) if nd < k
               else (np.float64(k) - 1.0) * 18446744073709551616.0
               / np.float64(kth))
        rows.append({"priority": priority,
                     "k_used": np.int64(k_used),
                     "kth_hash_d": np.float64(kth),
                     "est_distinct": est})
    return pd.DataFrame(rows).sort_values(
        "priority", kind="mergesort").reset_index(drop=True)
