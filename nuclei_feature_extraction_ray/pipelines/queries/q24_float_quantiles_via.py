# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (QUERIES, _combine_partials, _events, _path, _read_dim, np, partition_map, pd, ray, rd, register)
from .q07_round_4_additions import (_hist_quantile_cont)

@register("value_quantiles", sql="""
    WITH c AS (SELECT event_type,
                      CAST(floor(value * 100 + 0.5) AS BIGINT)
                          AS cents
               FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           quantile_cont(CAST(cents AS DOUBLE) / 100.0, 0.25) AS p25,
           quantile_cont(CAST(cents AS DOUBLE) / 100.0, 0.50) AS p50,
           quantile_cont(CAST(cents AS DOUBLE) / 100.0, 0.75) AS p75,
           quantile_cont(CAST(cents AS DOUBLE) / 100.0, 0.95) AS p95
    FROM c GROUP BY event_type ORDER BY event_type""")
def value_quantiles(sf_dir: str):
    """Exact per-stream quantiles of a FLOAT measure at corpus scale:
    the fixed-decimal trick — 2-decimal values quantize losslessly to
    integer cents, so a bounded (type, cents) histogram replaces the
    full sort that exact float quantiles normally require; both
    engines interpolate the identical reconstructed doubles
    (cents/100.0 is correctly rounded back to the original value)
    with the shared quantile_cont formula. The histogram is
    value-domain-bounded, so no row-grain state ever leaves the
    scan."""
    ds = _events(sf_dir, columns=["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"event_type": b["event_type"]
                          .to_numpy(object), "cents": cents}) \
            .groupby(["event_type", "cents"], as_index=False).agg(
                n=("cents", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "cents"], ["n"])
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("cents", kind="mergesort")
        vals = g["cents"].to_numpy(np.int64).astype(np.float64) \
            / 100.0
        cts = g["n"].to_numpy(np.int64)
        rows.append({
            "event_type": et, "n_events": np.int64(int(cts.sum())),
            "p25": _hist_quantile_cont(vals, cts, 0.25),
            "p50": _hist_quantile_cont(vals, cts, 0.50),
            "p75": _hist_quantile_cont(vals, cts, 0.75),
            "p95": _hist_quantile_cont(vals, cts, 0.95)})
    return pd.DataFrame(rows)


@register("entity_clusters", sql="""
    WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
    b AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk
          FROM names),
    pr AS (SELECT x.p_name AS a, y.p_name AS b
           FROM b x JOIN b y
             ON x.blk = y.blk AND x.p_name < y.p_name
           WHERE levenshtein(x.p_name, y.p_name) <= 2),
    edges AS (SELECT a AS src, b AS dst FROM pr
              UNION SELECT b, a FROM pr),
    reach(src, dst) AS (
      SELECT p_name, p_name FROM names
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src AS p_name, min(dst) AS rep,
           CAST(min(dst) = src AS BIGINT) AS is_rep
    FROM reach GROUP BY src ORDER BY p_name""")
def entity_clusters(sf_dir: str):
    """Entity RESOLUTION (pairs -> entities): the blocked-linkage
    pairs (part_linkage) closed into clusters by the distributed
    connected-components stage, each name labeled with its cluster's
    lexicographic-min representative — the merge step that turns
    fuzzy matches into canonical entities. Names are dimension-sized,
    so the name<->int id mapping is a guarded driver table broadcast
    once (ids assigned in sorted-name order, so min-id == min-name
    and the rep agrees with the SQL closure); CC itself moves only
    8-byte ids."""
    from ...stages.graph import attach_clusters, connected_components

    names = np.sort(_read_dim(_path(sf_dir, "part"), ["p_name"])
                    ["p_name"].unique())
    name_id = {n: i for i, n in enumerate(names)}
    ref = ray.put(name_id)

    pairs = QUERIES["part_linkage"](sf_dir)
    if isinstance(pairs, pd.DataFrame):
        pairs_pdf = pairs
    else:
        pairs_pdf = pairs.to_pandas()
    # pairs are blocked-linkage grain (bounded by the name dimension);
    # convert to int-id edge rows and hand them back to Ray for CC.
    edges = rd.from_pandas(pd.DataFrame({
        "a": pairs_pdf["name_a"].map(name_id).to_numpy(np.int64),
        "b": pairs_pdf["name_b"].map(name_id).to_numpy(np.int64)}))
    ids = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(names), dtype=np.int64)}))
    cc = connected_components(edges, "a", "b", num_partitions=8)
    labeled = attach_clusters(ids, cc, "doc_id",
                              num_partitions=8).to_pandas()
    labeled = labeled.sort_values("doc_id",
                                  kind="mergesort").reset_index(
                                      drop=True)
    rep = names[labeled["cluster"].to_numpy(np.int64)]
    out = pd.DataFrame({
        "p_name": names[labeled["doc_id"].to_numpy(np.int64)],
        "rep": rep})
    out["is_rep"] = (out["p_name"] == out["rep"]).astype(np.int64)
    return out.sort_values("p_name",
                           kind="mergesort").reset_index(drop=True)


@register("order_reorder_rate", sql="""
    WITH cp AS (
      SELECT o_custkey, l_partkey,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repeat,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS repeat_rate
    FROM cp""")
def order_reorder_rate(sf_dir: str):
    """Repeat-purchase census: of all (customer, part) pairs ever
    ordered, what share appears in two or more DISTINCT orders — the
    loyalty / assortment-stickiness scalar. Scale plan: lineitem
    reaches customer grain through ONE co-partitioning exchange on
    orderkey (tagged union, no broadcast of either fact), partitions
    emit DISTINCT (cust, part, order) triples, a second exchange on
    (cust, part) finishes the per-pair distinct-order count, and
    only a 2-int census row per partition reaches the driver."""
    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(np.int64),
            "part": np.zeros(len(b), np.int64),
            "cust": b["o_custkey"].to_numpy(np.int64),
            "side": np.zeros(len(b), np.int64)})

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "key": b["l_orderkey"].to_numpy(np.int64),
            "part": b["l_partkey"].to_numpy(np.int64),
        }).drop_duplicates(ignore_index=True)
        d["cust"] = np.zeros(len(d), np.int64)
        d["side"] = np.ones(len(d), np.int64)
        return d

    both = orders.map_batches(order_rows,
                              batch_format="pandas").union(
        li.map_batches(line_rows, batch_format="pandas"))

    def join_cust(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "cust"]]
        l = g[g["side"] == 1][["key", "part"]]
        m = l.merge(o, on="key")
        return m[["cust", "part", "key"]].drop_duplicates(
            ignore_index=True)

    triples = partition_map(both, ["key"], join_cust, 16)

    def census(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["cust", "part", "key"])
        c = g.groupby(["cust", "part"], as_index=False).agg(
            n=("key", "size"))
        n = c["n"].to_numpy(np.int64)
        return pd.DataFrame({"k": np.zeros(1, np.int64),
                             "n_pairs": [np.int64(len(c))],
                             "n_repeat": [np.int64((n >= 2).sum())]})

    out = _combine_partials(
        partition_map(triples, ["cust", "part"], census, 16),
        ["k"], ["n_pairs", "n_repeat"])
    n_pairs = np.int64(out["n_pairs"].iloc[0])
    n_repeat = np.int64(out["n_repeat"].iloc[0])
    return pd.DataFrame({
        "n_pairs": [n_pairs], "n_repeat": [n_repeat],
        "repeat_rate": [np.float64(n_repeat) / np.float64(n_pairs)]})
