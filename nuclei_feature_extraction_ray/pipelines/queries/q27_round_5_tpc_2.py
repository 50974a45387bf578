# round-5 additions: the remaining TPC-H decorrelation shapes
# (Q11/Q12/Q20/Q21), reshaped onto the synthetic schema (no partsupp /
# l_shipmode / l_receiptdate columns exist — the join topology and the
# correlated-subquery decorrelations are the point, cf. the q8/q9/q17
# notes in q26_round_5_tpc.py).
from __future__ import annotations

from ._shared import (EVENTS_P, ORACLE, QUERIES, _EVW,
                      _combine_partials, _path, _read_dim,
                      _sorted_member, datetime, np, pa, partition_map,
                      pc, pd, ray, rd, register)

_Q12_HI = ("1-URGENT", "2-HIGH")


@register("q11_important_parts", sql="""
    WITH sn AS (
      SELECT s_suppkey FROM supplier JOIN nation
        ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'),
    v AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS val_cents
      FROM lineitem JOIN sn ON l_suppkey = s_suppkey
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, val_cents
    FROM v
    WHERE CAST(val_cents AS HUGEINT) * 2 * (SELECT count(*) FROM v)
          > 3 * (SELECT CAST(sum(val_cents) AS HUGEINT) FROM v)
    ORDER BY val_cents DESC, p_partkey""")
def q11_important_parts(sf_dir: str):
    """TPC-H-Q11-shaped important stock: parts whose value supplied by
    one nation's suppliers exceeds 1.5x the nation's MEAN part value —
    the HAVING-against-a-scalar-subquery-over-the-SAME-aggregate shape
    (the synthetic schema has no partsupp, so value = extendedprice
    cents from lineitem; Q11's absolute 0.0001 fraction is replaced by
    a mean-relative threshold because a fixed share of the total
    selects zero parts once the part count passes 1/fraction — the
    mean-relative form keeps the selection meaningful at every scale).
    Engine plan: the nation's supplier keyset is a tiny broadcast;
    per-batch (partkey, cents) partials feed ONE partkey
    co-partitioning exchange; the per-part sums Dataset is materialized
    once and reused for BOTH consumers (global total + part count via
    one-row-per-block partials, then the threshold filter) — the
    filter is exact integer arithmetic (val·2n > 3·total, folded to a
    python-int bound so no int64 product can wrap), and only the
    winner tail reaches the driver."""
    nat = _read_dim(_path(sf_dir, "nation"), ["n_nationkey", "n_name"])
    nk = nat.loc[nat["n_name"] == "NATION_3",
                 "n_nationkey"].to_numpy(np.int64)
    sup = _read_dim(_path(sf_dir, "supplier"),
                    ["s_suppkey", "s_nationkey"])
    sk_ref = ray.put(np.sort(sup.loc[sup["s_nationkey"].isin(nk),
                                     "s_suppkey"].to_numpy(np.int64)))

    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keep = _sorted_member(ray.get(sk_ref),
                              b["l_suppkey"].to_numpy(np.int64))
        b = b[keep]
        d = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "val_cents": np.round(b["l_extendedprice"].to_numpy()
                                  * 100).astype(np.int64)})
        return d.groupby("l_partkey", as_index=False).agg(
            val_cents=("val_cents", "sum"))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("l_partkey", as_index=False).agg(
            val_cents=("val_cents", "sum"))
        return pd.DataFrame({
            "l_partkey": c["l_partkey"].to_numpy(np.int64),
            "val_cents": c["val_cents"].to_numpy(np.int64)})

    sums = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], per_part, 16).materialize()

    def tot_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": np.zeros(1, np.int64),
                             "t": np.asarray(
                                 [b["val_cents"].sum()], np.int64),
                             "c": np.asarray([len(b)], np.int64)})

    tot_pdf = _combine_partials(
        sums.map_batches(tot_partial, batch_format="pandas"),
        ["k"], ["t", "c"])
    total = int(tot_pdf["t"].iloc[0]) if len(tot_pdf) else 0
    nparts = int(tot_pdf["c"].iloc[0]) if len(tot_pdf) else 0
    # val·2n > 3·total  ⟺  val ≥ ⌊3·total / 2n⌋ + 1 — fold the cross
    # product to a python-int bound so no int64 product can wrap
    bound = (3 * total) // (2 * nparts) + 1 if nparts else 0

    def winners(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["val_cents"].to_numpy(np.int64) >= bound
        b = b[keep]
        return pd.DataFrame({
            "p_partkey": b["l_partkey"].to_numpy(np.int64),
            "val_cents": b["val_cents"].to_numpy(np.int64)})

    # stays a Dataset end-to-end: the winner tail is a constant
    # FRACTION of the part dim (mean-relative threshold), so a driver
    # pull would grow with the catalog — the sort is distributed and
    # the caller decides what to materialize
    return sums.map_batches(winners, batch_format="pandas") \
        .sort(["val_cents", "p_partkey"], descending=[True, False])


@register("q12_priority_census", sql="""
    SELECT l_returnflag AS return_flag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY return_flag ORDER BY return_flag""")
def q12_priority_census(sf_dir: str):
    """TPC-H-Q12-shaped priority census: of the lines shipped in 1997,
    how many belonged to high- vs low-priority orders, per return
    flag (the synthetic schema has no l_shipmode; l_returnflag plays
    the grouping attribute). Large×large join with no broadcast: both
    sides stream aggregate-grain partials into ONE orderkey
    co-partitioning exchange — orders as (key, priority), lineitem
    pre-collapsed per batch to (key, flag, n) counts — each partition
    merges vectorized and emits (flag, high, low) partials; the final
    combine is |flags| rows (cf. q4_priority's EXISTS flavor of the
    same exchange)."""
    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)
    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    li = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
        filter=((pc.field("l_shipdate")
                 >= pa.scalar(lo, pa.timestamp("us")))
                & (pc.field("l_shipdate")
                   < pa.scalar(hi, pa.timestamp("us")))))

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(np.int64),
            "s": b["o_orderpriority"].astype(object),
            "n": np.zeros(len(b), np.int64),
            "side": np.zeros(len(b), np.int64)})

    def line_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"key": b["l_orderkey"].to_numpy(np.int64),
                          "s": b["l_returnflag"].astype(object)})
        c = d.groupby(["key", "s"], as_index=False).agg(
            n=("key", "size"))
        return pd.DataFrame({"key": c["key"].to_numpy(np.int64),
                             "s": c["s"].astype(object),
                             "n": c["n"].to_numpy(np.int64),
                             "side": np.ones(len(c), np.int64)})

    both = orders.map_batches(order_rows, batch_format="pandas").union(
        li.map_batches(line_partial, batch_format="pandas"))

    def census(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        if o.empty or l.empty:
            return pd.DataFrame({
                "return_flag": np.array([], object),
                "high_line_count": np.array([], np.int64),
                "low_line_count": np.array([], np.int64)})
        m = l.merge(o[["key", "s"]].rename(columns={"s": "prio"}),
                    on="key", how="inner")
        hi_m = m["prio"].isin(_Q12_HI).to_numpy(bool)
        n = m["n"].to_numpy(np.int64)
        m = pd.DataFrame({"s": m["s"].astype(object),
                          "high": np.where(hi_m, n, 0),
                          "low": np.where(hi_m, 0, n)})
        c = m.groupby("s", as_index=False)[["high", "low"]].sum()
        return pd.DataFrame({
            "return_flag": c["s"].astype(object),
            "high_line_count": c["high"].to_numpy(np.int64),
            "low_line_count": c["low"].to_numpy(np.int64)})

    partials = partition_map(both, ["key"], census, 16)
    out = _combine_partials(partials, ["return_flag"],
                            ["high_line_count", "low_line_count"])
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return out.sort_values("return_flag",
                           kind="mergesort").reset_index(drop=True)


@register("q20_dominant_suppliers", sql="""
    WITH pk AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    g AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                  AS BIGINT) AS qc
      FROM lineitem JOIN pk ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey),
    t AS (SELECT l_partkey, CAST(sum(qc) AS BIGINT) AS tq
          FROM g GROUP BY l_partkey)
    SELECT DISTINCT s_suppkey, s_name
    FROM g JOIN t USING (l_partkey)
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON s_nationkey = n_nationkey
    WHERE 2 * qc > tq AND n_name = 'NATION_3'
    ORDER BY s_suppkey""")
def q20_dominant_suppliers(sf_dir: str):
    """TPC-H-Q20-shaped supplier promotion: NATION_3 suppliers who
    shipped MORE THAN HALF of some PROMO part's 1997 volume — the
    nested semi-join chain (part filter → correlated per-part
    aggregate threshold → DISTINCT supplier → nation filter; the
    synthetic schema has no partsupp, so availqty > ½·sum(qty)
    becomes supplier-share > ½·part-total). Engine plan: promo part
    keys broadcast; per-batch (part, supplier, qty-cents) partials
    feed ONE partkey co-partitioning exchange where each partition
    holds every qualifying line of its parts — the dominance test is
    an exact integer comparison (2·qc > tq) — and emits its distinct
    winner suppkeys; the driver combine is supplier-bounded, where
    the nation filter and name attach are dim lookups."""
    part = _read_dim(_path(sf_dir, "part"), ["p_partkey", "p_type"])
    pk_ref = ray.put(np.sort(part.loc[part["p_type"] == "PROMO",
                                      "p_partkey"].to_numpy(np.int64)))
    lo, hi = datetime(1997, 1, 1), datetime(1998, 1, 1)
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        filter=((pc.field("l_shipdate")
                 >= pa.scalar(lo, pa.timestamp("us")))
                & (pc.field("l_shipdate")
                   < pa.scalar(hi, pa.timestamp("us")))))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keep = _sorted_member(ray.get(pk_ref),
                              b["l_partkey"].to_numpy(np.int64))
        b = b[keep]
        d = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
            "qc": np.round(b["l_quantity"].to_numpy()
                           * 100).astype(np.int64)})
        return d.groupby(["l_partkey", "l_suppkey"],
                         as_index=False).agg(qc=("qc", "sum"))

    def dominant(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"l_suppkey": np.array([], np.int64),
                                 "one": np.array([], np.int64)})
        s = g.groupby(["l_partkey", "l_suppkey"],
                      as_index=False).agg(qc=("qc", "sum"))
        tq = s.groupby("l_partkey")["qc"].transform("sum") \
            .to_numpy(np.int64)
        win = s[2 * s["qc"].to_numpy(np.int64) > tq]
        k = np.unique(win["l_suppkey"].to_numpy(np.int64))
        return pd.DataFrame({"l_suppkey": k,
                             "one": np.ones(len(k), np.int64)})

    partials = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], dominant, 16)
    keys = _combine_partials(partials, ["l_suppkey"], ["one"])

    sup = _read_dim(_path(sf_dir, "supplier"),
                    ["s_suppkey", "s_name", "s_nationkey"])
    nat = _read_dim(_path(sf_dir, "nation"), ["n_nationkey", "n_name"])
    nk = nat.loc[nat["n_name"] == "NATION_3",
                 "n_nationkey"].to_numpy(np.int64)
    sup = sup[sup["s_nationkey"].isin(nk)]
    out = keys.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out = pd.DataFrame({
        "s_suppkey": out["s_suppkey"].to_numpy(np.int64),
        "s_name": out["s_name"].to_numpy(object)})
    return out.sort_values("s_suppkey",
                           kind="mergesort").reset_index(drop=True)


@register("q21_waiting_suppliers", sql="""
    WITH g AS (
      SELECT l_orderkey, l_suppkey,
             CAST(max(CASE WHEN l_shipdate >
                                o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS BIGINT) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey),
    o AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS nsupp,
             CAST(sum(late) AS BIGINT) AS nlate
      FROM g GROUP BY l_orderkey)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM g JOIN o USING (l_orderkey)
         JOIN supplier ON s_suppkey = l_suppkey
    WHERE g.late = 1 AND o.nsupp > 1 AND o.nlate = 1
    GROUP BY s_name ORDER BY numwait DESC, s_name""")
def q21_waiting_suppliers(sf_dir: str):
    """TPC-H-Q21-shaped waiting-supplier census: per supplier, the
    finished ('F') multi-supplier orders where THIS supplier was the
    only late one — the EXISTS + NOT-EXISTS double correlation (the
    synthetic schema has no receipt/commit dates, so "late" =
    shipped > 90 days after the order date). Decorrelated into ONE
    orderkey co-partitioning exchange with no broadcast: orders
    stream (key, orderdate) rows, lineitem streams per-batch
    (key, supplier, max-shipdate) partials; each partition re-folds
    the per-(order, supplier) max, derives late flags against the
    order's deadline, and applies both correlated predicates
    (nsupp > 1 ⟺ EXISTS other supplier; nlate = 1 ⟺ NOT EXISTS other
    late supplier) vectorized, emitting (suppkey, n) partials; the
    driver combine is supplier-bounded and the name attach is a dim
    lookup."""
    orders = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
        filter=(pc.field("o_orderstatus") == "F"))
    li = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(np.int64),
            "sk": np.full(len(b), -1, np.int64),
            "ts": b["o_orderdate"].to_numpy(),
            "side": np.zeros(len(b), np.int64)})

    def line_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"key": b["l_orderkey"].to_numpy(np.int64),
                          "sk": b["l_suppkey"].to_numpy(np.int64),
                          "ts": b["l_shipdate"].to_numpy()})
        c = d.groupby(["key", "sk"], as_index=False).agg(
            ts=("ts", "max"))
        c["side"] = np.ones(len(c), np.int64)
        return c[["key", "sk", "ts", "side"]]

    both = orders.map_batches(order_rows, batch_format="pandas").union(
        li.map_batches(line_partial, batch_format="pandas"))

    def waits(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"sk": np.array([], np.int64),
                              "n": np.array([], np.int64)})
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        if o.empty or l.empty:
            return empty
        ls = l.groupby(["key", "sk"], as_index=False).agg(
            ts=("ts", "max"))
        m = ls.merge(o[["key", "ts"]].rename(columns={"ts": "odate"}),
                     on="key", how="inner")
        if m.empty:
            return empty
        m["late"] = (m["ts"] > m["odate"]
                     + pd.Timedelta(days=90)).to_numpy().astype(np.int64)
        st = m.groupby("key", as_index=False).agg(
            nsupp=("sk", "size"), nlate=("late", "sum"))
        m = m.merge(st, on="key")
        win = m[(m["late"] == 1) & (m["nsupp"] > 1) & (m["nlate"] == 1)]
        c = win.groupby("sk", as_index=False).agg(n=("key", "size"))
        return pd.DataFrame({"sk": c["sk"].to_numpy(np.int64),
                             "n": c["n"].to_numpy(np.int64)})

    partials = partition_map(both, ["key"], waits, 16)
    counts = _combine_partials(partials, ["sk"], ["n"])

    sup = _read_dim(_path(sf_dir, "supplier"), ["s_suppkey", "s_name"])
    out = counts.merge(sup, left_on="sk", right_on="s_suppkey")
    out = out.groupby("s_name", as_index=False).agg(
        numwait=("n", "sum"))
    out = pd.DataFrame({"s_name": out["s_name"].to_numpy(object),
                        "numwait": out["numwait"].to_numpy(np.int64)})
    return out.sort_values(["numwait", "s_name"],
                           ascending=[False, True],
                           kind="mergesort").reset_index(drop=True)


def _basket_edges_sym(sf_dir: str):
    """Symmetrized co-purchase edge Dataset (src, dst): both
    directions of every support-filtered basket pair — the adjacency
    list part_pagerank iterates over (built by the shared basket
    machinery, two bounded hash exchanges)."""
    from .q10_feature_engineering_readability import _basket_edges

    def sym(b: pd.DataFrame) -> pd.DataFrame:
        a = b["part_a"].to_numpy(np.int64)
        c = b["part_b"].to_numpy(np.int64)
        return pd.DataFrame({"src": np.concatenate([a, c]),
                             "dst": np.concatenate([c, a])})

    return _basket_edges(sf_dir).map_batches(sym,
                                             batch_format="pandas")


def _pagerank_sql(iters: int = 3) -> str:
    """Chained-CTE PageRank oracle: K fixed iterations of
    r' = 150000 + (85 · Σ_{u→v} r(u)//deg(u)) // 100 in pure integer
    arithmetic — every term is an exact floor division, so the fold is
    order-independent and bit-identical across engines."""
    sql = ["""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
            FROM e GROUP BY 1),
    r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM deg)"""]
    for k in range(1, iters + 1):
        sql.append(""",
    r%d AS (
      SELECT deg.v,
             CAST(150000 + (85 * COALESCE(t.s, 0)) // 100 AS BIGINT)
               AS r
      FROM deg LEFT JOIN (
        SELECT e.dst AS v,
               CAST(sum(p.r // g.deg) AS BIGINT) AS s
        FROM e JOIN r%d p ON e.src = p.v
               JOIN deg g ON e.src = g.v
        GROUP BY 1) t ON deg.v = t.v)""" % (k, k - 1))
    sql.append("""
    SELECT deg.v AS p_partkey, deg.deg AS degree, r%d.r AS rank_micro
    FROM r%d JOIN deg ON r%d.v = deg.v
    ORDER BY rank_micro DESC, p_partkey LIMIT 100"""
               % (iters, iters, iters))
    return "".join(sql)


_PAGERANK_ITERS = 3
# driver-fold tier bound (mirrors stages/graph.py max_driver_edges);
# module-level so tests can force the distributed per-iteration path
_PAGERANK_DRIVER_EDGES = 5_000_000


@register("part_pagerank", sql=_pagerank_sql(_PAGERANK_ITERS))
def part_pagerank(sf_dir: str):
    """PageRank over the part co-purchase graph (3 fixed iterations,
    damping 0.85): rank flows along support-filtered co-order edges —
    the iterative-graph-algorithm operator class (cf. triangle_count's
    2-round wedge check and entity_clusters' large-star/small-star
    loop). All arithmetic is integer micro-units with per-edge floor
    division (r//deg summed, then ·85//100), so the result is
    bit-identical to the chained-CTE DuckDB oracle with NO float
    ordering concerns. Scale plan: the edge list is built once by the
    shared basket machinery (two bounded hash exchanges) and
    materialized; each iteration is ONE vectorized pass over the edge
    blocks (ranks+degrees broadcast as sorted arrays — node state is
    part-dim-sized, the same class _read_dim already guards) followed
    by a node-keyed partition exchange to fold contribution partials;
    the driver holds only the part-dim-bounded rank vector. Top-100
    by rank is the bounded result. Fast tier: the support-filtered
    co-purchase graph is EDGE-dim sized (thousands of pairs at
    sf0.1), so up to the repo's documented 5M-edge driver bound
    (stages/graph.py `max_driver_edges` — the same policy
    entity_clusters uses) the edge list is pulled once and the
    iterations run as pure numpy folds — zero per-iteration
    exchanges; above the bound the distributed per-iteration
    exchange loop below takes over unchanged."""
    edges2 = _basket_edges_sym(sf_dir).materialize()

    if edges2.count() <= _PAGERANK_DRIVER_EDGES:
        e = edges2.to_pandas()
        if e.empty:
            return pd.DataFrame({
                "p_partkey": np.array([], np.int64),
                "degree": np.array([], np.int64),
                "rank_micro": np.array([], np.int64)})
        src = e["src"].to_numpy(np.int64)
        dst = e["dst"].to_numpy(np.int64)
        # every node of the sym edge list appears as a src, so the
        # src uniques ARE the node set
        knodes, inv = np.unique(src, return_inverse=True)
        degs = np.bincount(inv).astype(np.int64)
        j = np.searchsorted(knodes, dst)
        ranks = np.full(len(knodes), 1_000_000, np.int64)
        for _ in range(_PAGERANK_ITERS):
            c = ranks[inv] // degs[inv]
            s = np.zeros(len(knodes), np.int64)
            np.add.at(s, j, c)
            ranks = 150_000 + (85 * s) // 100
        out = pd.DataFrame({"p_partkey": knodes, "degree": degs,
                            "rank_micro": ranks})
        out = out.sort_values(["rank_micro", "p_partkey"],
                              ascending=[False, True],
                              kind="mergesort").head(100)
        return out.reset_index(drop=True)

    def deg_part(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("src", as_index=False).agg(deg=("dst", "size"))
        return pd.DataFrame({"v": c["src"].to_numpy(np.int64),
                             "deg": c["deg"].to_numpy(np.int64)})

    deg_pdf = partition_map(edges2, ["src"], deg_part, 16).to_pandas()
    if deg_pdf.empty:
        return pd.DataFrame({"p_partkey": np.array([], np.int64),
                             "degree": np.array([], np.int64),
                             "rank_micro": np.array([], np.int64)})
    deg_pdf = deg_pdf.sort_values("v", kind="mergesort")
    knodes = deg_pdf["v"].to_numpy(np.int64)
    degs = deg_pdf["deg"].to_numpy(np.int64)
    ranks = np.full(len(knodes), 1_000_000, np.int64)

    for _ in range(_PAGERANK_ITERS):
        state = ray.put((knodes, ranks, degs))

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            kn, rk, dg = ray.get(state)
            i = np.searchsorted(kn, b["src"].to_numpy(np.int64))
            c = rk[i] // dg[i]
            d = pd.DataFrame({"v": b["dst"].to_numpy(np.int64),
                              "s": c})
            return d.groupby("v", as_index=False).agg(s=("s", "sum"))

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            c = g.groupby("v", as_index=False).agg(s=("s", "sum"))
            return pd.DataFrame({"v": c["v"].to_numpy(np.int64),
                                 "s": c["s"].to_numpy(np.int64)})

        s_pdf = partition_map(
            edges2.map_batches(contrib, batch_format="pandas"),
            ["v"], fold, 16).to_pandas()
        s = np.zeros(len(knodes), np.int64)
        if len(s_pdf):
            j = np.searchsorted(knodes, s_pdf["v"].to_numpy(np.int64))
            s[j] = s_pdf["s"].to_numpy(np.int64)
        ranks = 150_000 + (85 * s) // 100

    out = pd.DataFrame({"p_partkey": knodes, "degree": degs,
                        "rank_micro": ranks})
    out = out.sort_values(["rank_micro", "p_partkey"],
                          ascending=[False, True],
                          kind="mergesort").head(100)
    return out.reset_index(drop=True)


@register("item_cosine_sim", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    m AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY 1),
    e AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT part_a, part_b, n_ab AS n_orders,
           floor(CAST(n_ab AS DOUBLE)
                 / sqrt(CAST(ma.n * mb.n AS DOUBLE))
                 * 1000000 + 0.5) / 1000000.0 AS cosine_sim
    FROM e JOIN m ma ON ma.l_partkey = part_a
           JOIN m mb ON mb.l_partkey = part_b
    ORDER BY cosine_sim DESC, part_a, part_b LIMIT 200""")
def item_cosine_sim(sf_dir: str):
    """Item-item cosine similarity from co-purchase counts
    (sim = n_ab / sqrt(n_a · n_b)) — the classic neighborhood
    recommender / complementary-item feature. Scale plan: ONE
    full-grain (orderkey) exchange — `_basket_fused` computes the
    pair partials AND the per-part distinct-order marginals in the
    same per-partition pass (marginals are partition-additive there
    because orders never span partitions); similarity attaches
    map-side via searchsorted over the broadcast sorted marginal
    arrays, and top-200 is a bounded per-block partial top-k folded
    on the driver (blocks × 200 rows), never a full distributed
    sort. The engine/oracle float is one double division + sqrt over
    exact integers with a shared half-away-from-zero 1e-6 rounding,
    so the compare is bit-exact."""
    from .q10_feature_engineering_readability import _basket_fused
    edges, marg, _ = _basket_fused(sf_dir)
    mk = marg["l_partkey"].to_numpy(np.int64)
    mn = marg["n"].to_numpy(np.int64)
    m_ref = ray.put((mk, mn))

    K = 200

    def score(b: pd.DataFrame) -> pd.DataFrame:
        kk, nn = ray.get(m_ref)
        a = b["part_a"].to_numpy(np.int64)
        c = b["part_b"].to_numpy(np.int64)
        nab = b["n_orders"].to_numpy(np.int64)
        na = nn[np.searchsorted(kk, a)]
        nb = nn[np.searchsorted(kk, c)]
        sim = nab.astype(np.float64) / np.sqrt(
            (na * nb).astype(np.float64))
        sim = np.floor(sim * 1_000_000 + 0.5) / 1_000_000
        d = pd.DataFrame({"part_a": a, "part_b": c, "n_orders": nab,
                          "cosine_sim": sim})
        # per-block partial top-k: only blocks x K rows cross the wire
        return d.sort_values(["cosine_sim", "part_a", "part_b"],
                             ascending=[False, True, True],
                             kind="mergesort").head(K)

    out = edges.map_batches(score,
                            batch_format="pandas").to_pandas()
    return out.sort_values(["cosine_sim", "part_a", "part_b"],
                           ascending=[False, True, True],
                           kind="mergesort").head(K) \
        .reset_index(drop=True)


@register("volume_changepoint", sql="""
    WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS nd
            FROM dc GROUP BY 1),
    cus AS (SELECT dc.event_type, day,
                   CAST(sum(dc.n * tot.nd - tot.total)
                        OVER (PARTITION BY dc.event_type
                              ORDER BY day) AS BIGINT) AS s
            FROM dc JOIN tot USING (event_type)),
    r AS (SELECT event_type, day, abs(s) AS a,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY abs(s) DESC, day) AS rn
          FROM cus)
    SELECT r.event_type, day AS change_day,
           CAST(a AS BIGINT) AS max_abs_cusum,
           tot.nd AS n_days
    FROM r JOIN tot USING (event_type)
    WHERE rn = 1 ORDER BY event_type""")
def volume_changepoint(sf_dir: str):
    """CUSUM changepoint detection on daily event volume per stream:
    the day where the cumulative deviation from the stream's mean
    daily count peaks — the level-shift detector behind ingest
    monitoring. All-integer CUSUM: deviations are cross-multiplied
    (n_d·ndays − total) instead of subtracting a float mean, so the
    cumulative sums and the argmax are exact in both engines (tie →
    earliest day). Scale plan: per-batch (stream, day, n) partials
    (the bounded type×day grid, cf. daily_anomaly) fold in one driver
    combine; the CUSUM scan itself is grid-sized. int64 headroom:
    n_d·ndays wraps past ~1e12 events/day·2.5k days."""
    from ._shared import _events
    ds = _events(sf_dir, columns=["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"event_type": b["event_type"]
                          .to_numpy(object),
                          "day": b["ts"].dt.normalize().to_numpy()})
        g = d.groupby(["event_type", "day"], as_index=False).agg(
            n=("day", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "day"], ["n"])
    if grid.empty:
        return pd.DataFrame({
            "event_type": np.array([], object),
            "change_day": np.array([], "datetime64[us]"),
            "max_abs_cusum": np.array([], np.int64),
            "n_days": np.array([], np.int64)})
    grid = grid.sort_values(["event_type", "day"], kind="mergesort")
    tot = grid.groupby("event_type", as_index=False).agg(
        total=("n", "sum"), nd=("n", "size"))
    m = grid.merge(tot, on="event_type")
    m["dev"] = (m["n"].to_numpy(np.int64) * m["nd"].to_numpy(np.int64)
                - m["total"].to_numpy(np.int64))
    m["s"] = m.groupby("event_type")["dev"].cumsum()
    m["a"] = m["s"].abs()
    # argmax |S| per stream, earliest day on ties: rows are
    # day-sorted, so a stable max-idx pick matches ROW_NUMBER's order
    m = m.sort_values(["event_type", "a", "day"],
                      ascending=[True, False, True], kind="mergesort")
    top = m.groupby("event_type", as_index=False).head(1)
    return pd.DataFrame({
        "event_type": top["event_type"].to_numpy(object),
        "change_day": top["day"].to_numpy(),
        "max_abs_cusum": top["a"].to_numpy(np.int64),
        "n_days": top["nd"].to_numpy(np.int64)}) \
        .sort_values("event_type", kind="mergesort") \
        .reset_index(drop=True)


@register("seq3_mining", sql="""
    WITH s AS (SELECT user_id, event_type AS e1,
                      lead(event_type, 1) OVER ({w}) AS e2,
                      lead(event_type, 2) OVER ({w}) AS e3
               FROM events)
    SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3 LIMIT 50""".format(w=_EVW))
def seq3_mining(sf_dir: str):
    """Length-3 sequential pattern mining (prefixspan-lite): the most
    frequent consecutive event-type trigrams across user streams,
    with per-pattern distinct-user support — the sequence census
    behind funnel discovery and next-action features (extends
    event_transitions' bigram Markov matrix one order up).

    Scale plan: trigrams are formed INSIDE the one user_id exchange's
    sorted partitions (two shifted compares against segment codes, no
    cross-partition state); because every user lives in exactly ONE
    partition, per-partition distinct-user counts are additive, so
    each partition pre-aggregates to the tiny types^3 grid and the
    driver combine is types^3 x partitions rows."""
    from ...stages.window import segment_codes
    from ._shared import _COMBINE_MAX_ROWS, _events, partitioned_apply
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"e1": pd.Series(dtype=object),
                              "e2": pd.Series(dtype=object),
                              "e3": pd.Series(dtype=object),
                              "n": pd.Series(dtype=np.int64),
                              "n_users": pd.Series(dtype=np.int64)})
        if len(g) < 3:
            return empty
        codes = segment_codes(g["user_id"].to_numpy())
        et = g["event_type"].to_numpy(object)
        uid = g["user_id"].to_numpy(np.int64)
        same = (codes[2:] == codes[:-2])
        if not same.any():
            return empty
        d = pd.DataFrame({"e1": et[:-2][same], "e2": et[1:-1][same],
                          "e3": et[2:][same], "uid": uid[:-2][same]})
        c = d.groupby(["e1", "e2", "e3"], as_index=False).agg(
            n=("uid", "size"), n_users=("uid", "nunique"))
        c["n"] = c["n"].astype(np.int64)
        c["n_users"] = c["n_users"].astype(np.int64)
        return c

    parts = partitioned_apply(ds, "user_id", fn, EVENTS_P,
                              sort_cols=["user_id", "ts", "event_id"]) \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("seq3_mining: trigram grid too large for "
                         "the driver combine")
    out = parts.groupby(["e1", "e2", "e3"], as_index=False).agg(
        n=("n", "sum"), n_users=("n_users", "sum"))
    out["n"] = out["n"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["n", "e1", "e2", "e3"],
                           ascending=[False, True, True, True],
                           kind="mergesort").head(50) \
        .reset_index(drop=True)


def _frames_sql() -> str:
    """Recomputed oracle for ``multimodal_frames`` (the _resize_sql
    pattern): the fake video wraps the first 1024 text bytes as
    t = nb//64 frames of 16x4; FrameSample(stride=2) emits every even
    frame; the per-frame byte sum is exact-int in both engines. Byte
    access is hex(encode(text)) two-chars-at-a-time."""
    return """
    WITH raw AS (
      SELECT doc_id, substring(hex(encode(text)), 1, 2048) AS hx,
             least(octet_length(encode(text)), 1024) AS nb
      FROM documents
    ), vid AS (
      SELECT doc_id, hx, nb // 64 AS t FROM raw WHERE nb >= 64
    ), fr AS (
      SELECT doc_id, hx, unnest(range(0, t, 2)) AS frame_idx FROM vid
    ), px AS (
      SELECT doc_id, frame_idx,
             CAST('0x' || substring(
                 hx, 2 * (frame_idx * 64 + i.i) + 1, 2)
               AS INTEGER) AS v
      FROM fr, (SELECT unnest(range(64)) AS i) i
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(64 AS BIGINT) AS n_frame_bytes,
           CAST(sum(v) AS BIGINT) AS frame_sum
    FROM px GROUP BY doc_id, frame_idx
    ORDER BY doc_id, frame_idx"""


@register("multimodal_frames", sql=_frames_sql())
def multimodal_frames(sf_dir: str):
    """Video frame-sampling plumbing over the fake container format
    (stages/multimodal.FrameSample): per-doc 'video' built from the
    first 1024 text bytes as 16x4 frames, every 2nd frame sampled by
    the actor-pool stage (flat-map row explosion: one output row per
    sampled frame, small batch_size for big payloads — exactly the
    shape an AV-codec-backed sampler uses; codec stubbed, PIL tier
    available via real_codec). Each sampled frame is then reduced to
    an exact integer byte sum so the whole explode is DuckDB-oracled.
    Scale plan: map-only end to end — wrap, sample, and reduce are all
    row-local actor-pool stages; the sort is the only exchange and
    exists for the deterministic compare."""
    from ...stages.multimodal import (HEADER_BYTES, FrameSample,
                                      make_payload)
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def wrap(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch["text"].to_pylist():
            b = t.encode()[:1024]
            nf = len(b) // 64
            payloads.append(
                make_payload(b[:nf * 64], width=16, height=4)
                if nf else None)
        return pa.table({"doc_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    sampled = ds.map_batches(wrap, batch_format="pyarrow") \
        .map_batches(FrameSample, batch_format="pyarrow",
                     batch_size=256, concurrency=2)

    def stat(batch: pa.Table) -> pa.Table:
        sums = [int(np.frombuffer(f, np.uint8,
                                  offset=HEADER_BYTES).sum())
                for f in batch["frame"].to_pylist()]
        n = batch.num_rows
        return pa.table({
            "doc_id": batch["doc_id"],
            "frame_idx": batch["frame_idx"],
            "n_frame_bytes": pa.array([64] * n, pa.int64()),
            "frame_sum": pa.array(sums, pa.int64())})

    return sampled.map_batches(stat, batch_format="pyarrow") \
        .sort(["doc_id", "frame_idx"])
