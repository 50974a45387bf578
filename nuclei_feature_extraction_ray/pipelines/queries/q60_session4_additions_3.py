# round-5 session-4 additions, batch 3: per-node local clustering
# coefficients, the AMS tug-of-war F2 sketch with an exact md5 twin,
# and Holt's linear-trend forecast as a pure-integer recursion with a
# recursive-CTE oracle.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map
from .q10_feature_engineering_readability import _basket_edges
from .q12_graph_analytics_experimentation import _WEDGE_MAX_ROWS


@register("local_clustering", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM d a JOIN d b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2),
    t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM e e1 JOIN e e2 ON e1.v = e2.u
               JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    tn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri
           FROM (SELECT a AS node FROM t
                 UNION ALL SELECT b FROM t
                 UNION ALL SELECT c FROM t)
           GROUP BY node),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT u AS node FROM e
                  UNION ALL SELECT v FROM e)
            GROUP BY node)
    SELECT deg.node AS part, deg.d AS degree,
           CAST(COALESCE(tn.tri, 0) AS BIGINT) AS triangles,
           CAST((CAST(COALESCE(tn.tri, 0) AS HUGEINT) * 4000000
                 + CAST(deg.d AS HUGEINT) * (deg.d - 1))
                // (2 * CAST(deg.d AS HUGEINT) * (deg.d - 1))
                AS BIGINT) AS cc_micro
    FROM deg LEFT JOIN tn USING (node)
    WHERE deg.d >= 2 ORDER BY part""")
def local_clustering(sf_dir: str):
    """LOCAL CLUSTERING COEFFICIENT per node of the support-filtered
    co-purchase graph — c_v = 2*T_v / (d_v*(d_v-1)), the per-node twin
    of triangle_count's global census (same canonical u<v<w wedge
    enumeration, same _basket_edges pipeline), reported for every node
    of degree >= 2 with the coefficient quantized to exact micro units
    in pure integer arithmetic ((2T*2e6 + dd) // (2*dd), half-up — no
    float anywhere). Scale plan: wedges ride the mid-node exchange and
    close against edges on the (u, w) exchange exactly as in
    triangle_count (same _WEDGE_MAX_ROWS hub guard); each closed wedge
    emits THREE (node, 1) rows that fold to node grain through one
    more exchange, and the node-grain result is dimension-sized
    (parts) by construction."""
    edges = _basket_edges(sf_dir).materialize()

    def tag_wedge_sides(b: pd.DataFrame) -> pd.DataFrame:
        u = b["part_a"].to_numpy(np.int64)
        v = b["part_b"].to_numpy(np.int64)
        return pd.DataFrame({
            "mid": np.concatenate([v, u]),
            "other": np.concatenate([u, v]),
            "side": np.repeat(np.asarray([0, 1], np.int64),
                              [len(b), len(b)])})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        if not len(left) or not len(right):
            return pd.DataFrame({"u": pd.Series(dtype=np.int64),
                                 "mid": pd.Series(dtype=np.int64),
                                 "w": pd.Series(dtype=np.int64)})
        m = left.merge(right, on="mid")
        if len(m) > _WEDGE_MAX_ROWS:
            raise ValueError(
                "local_clustering: wedge partition exceeds %d rows — "
                "hub degree too high; cap or shard hub nodes before "
                "the wedge join" % _WEDGE_MAX_ROWS)
        return pd.DataFrame({"u": m["other_x"].to_numpy(np.int64),
                             "mid": m["mid"].to_numpy(np.int64),
                             "w": m["other_y"].to_numpy(np.int64)})

    wedge_ds = partition_map(
        edges.map_batches(tag_wedge_sides, batch_format="pandas"),
        ["mid"], wedges, 16)

    def tag_close(is_edge: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            if is_edge:
                u = b["part_a"].to_numpy(np.int64)
                w = b["part_b"].to_numpy(np.int64)
                mid = np.full(len(b), -1, np.int64)
            else:
                u = b["u"].to_numpy(np.int64)
                w = b["w"].to_numpy(np.int64)
                mid = b["mid"].to_numpy(np.int64)
            return pd.DataFrame({
                "u": u, "w": w, "mid": mid,
                "side": np.full(len(b), is_edge, np.int64)})
        return f

    def close_nodes(g: pd.DataFrame) -> pd.DataFrame:
        e = g.loc[g["side"] == 1, ["u", "w"]].drop_duplicates()
        wdg = g[g["side"] == 0]
        m = wdg.merge(e, on=["u", "w"])
        if not len(m):
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "tri": pd.Series(dtype=np.int64)})
        nodes = np.concatenate([m["u"].to_numpy(np.int64),
                                m["mid"].to_numpy(np.int64),
                                m["w"].to_numpy(np.int64)])
        out = pd.DataFrame({"node": nodes}).groupby(
            "node", as_index=False).size()
        return pd.DataFrame({"node": out["node"].to_numpy(np.int64),
                             "tri": out["size"].to_numpy(np.int64)})

    both = wedge_ds.map_batches(tag_close(0),
                                batch_format="pandas").union(
        edges.map_batches(tag_close(1), batch_format="pandas"))
    tri_parts = partition_map(both, ["u", "w"], close_nodes, 16)

    def node_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("node", as_index=False)["tri"].sum()
        d["tri"] = d["tri"].astype(np.int64)
        return d

    tri = _combine_partials(
        partition_map(tri_parts, ["node"], node_fold, 8),
        ["node"], ["tri"])

    def deg_part(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "node": np.concatenate([b["part_a"].to_numpy(np.int64),
                                    b["part_b"].to_numpy(np.int64)]),
            "d": 1}).groupby("node", as_index=False).sum()
        d["d"] = d["d"].astype(np.int64)
        return d

    def deg_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("node", as_index=False)["d"].sum()
        d["d"] = d["d"].astype(np.int64)
        return d

    deg = _combine_partials(
        partition_map(
            edges.map_batches(deg_part, batch_format="pandas"),
            ["node"], deg_fold, 8),
        ["node"], ["d"])

    out = deg.merge(tri, on="node", how="left")
    out["tri"] = out["tri"].fillna(0).astype(np.int64)
    out = out[out["d"] >= 2].copy()
    t = out["tri"].to_numpy(np.int64).astype(object)
    d = out["d"].to_numpy(np.int64).astype(object)
    dd = d * (d - 1)
    cc = (t * 4000000 + dd) // (2 * dd)
    return pd.DataFrame({
        "part": out["node"].to_numpy(np.int64),
        "degree": out["d"].to_numpy(np.int64),
        "triangles": out["tri"].to_numpy(np.int64),
        "cc_micro": np.array([int(x) for x in cc], np.int64)}) \
        .sort_values("part", kind="mergesort").reset_index(drop=True)


_AMS_R = 16


@register("ams_f2", sql="""
    WITH f AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c
               FROM orders GROUP BY 1),
    j AS (SELECT CAST(unnest(generate_series(0, {r} - 1)) AS BIGINT)
                 AS est_id),
    z AS (SELECT j.est_id,
                 CAST(sum(CASE WHEN (md5_number_upper(
                            CAST(f.k AS VARCHAR) || '#'
                            || CAST(j.est_id AS VARCHAR)) & 1) = 1
                          THEN f.c ELSE -f.c END) AS HUGEINT) AS z
          FROM f CROSS JOIN j GROUP BY j.est_id),
    ex AS (SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS f2
           FROM f),
    mean AS (SELECT CAST((sum(z * z) * 2 + {r})
                         // (2 * {r}) AS HUGEINT) AS est FROM z)
    SELECT est_id, CAST(z AS BIGINT) AS z_j,
           CAST(z * z AS BIGINT) AS y_j,
           CAST((SELECT est FROM mean) AS BIGINT) AS f2_estimate,
           CAST((SELECT f2 FROM ex) AS BIGINT) AS f2_exact
    FROM z ORDER BY est_id""".format(r=_AMS_R))
def ams_f2(sf_dir: str):
    """AMS TUG-OF-WAR sketch of the second frequency moment F2 (the
    'surprise number') of the per-customer order counts — Alon,
    Matias & Szegedy '96: r=16 independent estimators Y_j = (sum_k
    s_j(k) * f_k)^2 with md5-derived +/-1 signs, averaged half-up.
    Everything is exact integer (signs from the md5 low bit, the
    signed counts fold as ints, the mean divides once with the shared
    half-up formula) so sketch AND estimate are bit-equal to the
    DuckDB twin; f2_exact rides along for the error check. Scale
    plan: counts fold to key grain through one custkey exchange, then
    each partition contributes r signed scalars + one sum-of-squares
    scalar — the combine is r+1 numbers per partition regardless of
    corpus size."""
    from ...functions.hashing import md5_id64_flat
    r = _AMS_R
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey"])

    def cnt_part(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"k": b["o_custkey"].to_numpy(np.int64),
                          "c": np.ones(len(b), np.int64)}) \
            .groupby("k", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    def fold_and_sketch(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("k", as_index=False)["c"].sum()
        k = a["k"].to_numpy(np.int64)
        c = a["c"].to_numpy(np.int64)
        rows = {"est_id": np.arange(r + 1, dtype=np.int64)}
        zs = np.zeros(r + 1, np.int64)
        for j in range(r):
            hv = md5_id64_flat(k, "#%d" % j)[0].byteswap()
            sign = np.where((hv & np.uint64(1)) == 1, 1, -1) \
                .astype(np.int64)
            zs[j] = int(np.dot(sign, c))
        zs[r] = int(np.dot(c, c))     # exact F2 partial
        rows["z"] = zs
        return pd.DataFrame(rows)

    parts = partition_map(
        ds.map_batches(cnt_part, batch_format="pandas"),
        ["k"], fold_and_sketch, 16)
    s = _combine_partials(parts, ["est_id"], ["z"], exact_int=True)
    s = s.sort_values("est_id", kind="mergesort")
    z = [int(v) for v in s.loc[s["est_id"] < r, "z"]]
    f2 = int(s.loc[s["est_id"] == r, "z"].iloc[0])
    ysum = sum(v * v for v in z)
    est = (ysum * 2 + r) // (2 * r)
    return pd.DataFrame({
        "est_id": np.arange(r, dtype=np.int64),
        "z_j": np.array(z, np.int64),
        "y_j": np.array([v * v for v in z], np.int64),
        "f2_estimate": np.full(r, est, np.int64),
        "f2_exact": np.full(r, f2, np.int64)})


@register("holt_forecast", sql="""
    WITH RECURSIVE d AS (SELECT event_type,
                      CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT t.event_type,
                     CAST(unnest(generate_series(b.d0, b.d1))
                          AS BIGINT) AS day
              FROM types t CROSS JOIN bounds b),
    x AS (SELECT s.event_type,
                 CAST(row_number() OVER (PARTITION BY s.event_type
                                         ORDER BY s.day) AS BIGINT)
                   AS t,
                 CAST(COALESCE(d.n, 0) AS HUGEINT) * 1000000 AS y
          FROM spine s LEFT JOIN d USING (event_type, day)),
    rec AS (
      SELECT a.event_type, CAST(2 AS BIGINT) AS t,
             (b.y + a.y + b.y - a.y + 1) // 2 AS l,
             (b.y - a.y + b.y - a.y + 1) // 2 AS b
      FROM x a JOIN x b ON a.event_type = b.event_type
                       AND a.t = 1 AND b.t = 2
      UNION ALL
      SELECT r.event_type, r.t + 1,
             (x.y + r.l + r.b + 1) // 2,
             ((x.y + r.l + r.b + 1) // 2 - r.l + r.b + 1) // 2
      FROM rec r JOIN x ON x.event_type = r.event_type
                       AND x.t = r.t + 1),
    fin AS (SELECT event_type, l, b,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY t DESC) AS rn,
                   t FROM rec)
    SELECT event_type, CAST(t AS BIGINT) AS n_days,
           CAST(l AS BIGINT) AS level_micro,
           CAST(b AS BIGINT) AS trend_micro,
           CAST(l + b AS BIGINT) AS forecast_1d_micro,
           CAST(l + 7 * b AS BIGINT) AS forecast_7d_micro
    FROM fin WHERE rn = 1 ORDER BY event_type""")
def holt_forecast(sf_dir: str):
    """HOLT'S LINEAR-TREND double exponential smoothing over each
    event type's zero-filled daily count series, with alpha = beta =
    1/2 chosen so the ENTIRE recursion runs in integers: state in
    micro units, l_t = (y_t + l + b + 1)//2 and b_t = (l_t - l + b +
    1)//2 with DuckDB's truncate-toward-zero // mirrored exactly on
    the engine side (python // floors; they differ on negative
    trend states), seeded with the standard l_1 = y_1, b_1 = y_2 -
    y_1. Unlike
    ses_forecast's order-free unrolled float fold, this is a genuinely
    SEQUENTIAL stateful recursion — oracled bit-exactly through a
    DuckDB RECURSIVE CTE (the throttle_dedup pattern applied to
    smoothing state). Scale plan: per-batch (type, day) partials
    collapse to the calendar-bounded grid; the recursion runs on the
    driver's tiny types x days series."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].to_numpy("datetime64[s]").astype(np.int64)
               // 86400)
        g = pd.DataFrame({"event_type": b["event_type"]
                          .astype(object), "day": day}) \
            .groupby(["event_type", "day"], as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["event_type", "day", "n"]]

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "day"], ["n"])
    d0, d1 = int(d["day"].min()), int(d["day"].max())
    tmax = d1 - d0 + 1

    def tdiv2(a: int) -> int:
        # DuckDB's integer // truncates toward ZERO; python floors.
        return a // 2 if a >= 0 else -((-a) // 2)

    rows = []
    for et, g in d.groupby("event_type"):
        yv = np.zeros(tmax, np.int64)
        yv[g["day"].to_numpy(np.int64) - d0] = g["n"].to_numpy(
            np.int64)
        y = [int(v) * 1000000 for v in yv]
        lv = y[0]
        bv = y[1] - y[0]
        for t in range(1, tmax):
            nl = tdiv2(y[t] + lv + bv + 1)
            bv = tdiv2(nl - lv + bv + 1)
            lv = nl
        rows.append({"event_type": et, "n_days": np.int64(tmax),
                     "level_micro": np.int64(lv),
                     "trend_micro": np.int64(bv),
                     "forecast_1d_micro": np.int64(lv + bv),
                     "forecast_7d_micro": np.int64(lv + 7 * bv)})
    return pd.DataFrame(rows).sort_values(
        "event_type", kind="mergesort").reset_index(drop=True)
