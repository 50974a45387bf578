# round-5 session-2 additions, batch 12: 2-hop graph reachability
# (friend-of-friend frontier), deterministic hash-based negative
# sampling (contrastive-training data op), and percent_rank /
# cume_dist analytic windows.
from __future__ import annotations

import pyarrow.parquet as pq_mod

from ...functions.hashing import md5_upper64_flat
from ._shared import (ORACLE, _path, np, pa, partition_map, pc, pd,
                      ray, rd, register)
from .q27_round_5_tpc_2 import _basket_edges_sym

_NEG_K = 4  # negative samples drawn per order

_EDGE_CTE = """
    d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM d a JOIN d b
             ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT pa AS src, pb AS dst FROM e0
          UNION ALL SELECT pb, pa FROM e0)"""


@register("two_hop_reach", sql="""
    WITH """ + _EDGE_CTE + """,
    hop2 AS (SELECT e1.src AS src, e2.dst AS dst
             FROM e e1 JOIN e e2 ON e1.dst = e2.src
             WHERE e2.dst <> e1.src),
    reach AS (SELECT src, dst FROM e
              UNION SELECT src, dst FROM hop2),
    r1 AS (SELECT src, CAST(count(*) AS BIGINT) AS reach1
           FROM e GROUP BY src)
    SELECT r.src AS part, r1.reach1,
           CAST(count(*) AS BIGINT) AS reach2
    FROM reach r JOIN r1 ON r1.src = r.src
    GROUP BY r.src, r1.reach1 ORDER BY part""")
def two_hop_reach(sf_dir: str):
    """Friend-of-friend frontier: for every part in the co-purchase
    graph, the count of distinct neighbors (reach1) and of distinct
    nodes within two hops (reach2, self excluded) — the 2-hop
    reachability census behind collaborative-filtering candidate
    generation and graph feature engineering. Built on the shared
    symmetric basket edges (two bounded hash exchanges); the wedge
    enumeration is ONE exchange on the middle node b — inside each
    partition a C self-merge of the adjacency frame emits (a, c)
    pairs for a,c ∈ N(b), the same Σ deg² cost triangle_count
    already pays at 10× scale — followed by one exchange on the
    source node to finish the distinct count. Hub middles are the
    skew risk; the support filter bounds degree exactly as it does
    for the triangle and pagerank ops."""
    edges = _basket_edges_sym(sf_dir).materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # g holds whole middle-node groups keyed by src = b; the
        # symmetric edge set makes N_in(b) == N_out(b) == g.dst, so
        # the wedge pairs a->b->c are dst x dst with a != c.
        m = g.merge(g, on="src")
        m = m[m["dst_x"] != m["dst_y"]]
        out = pd.DataFrame({
            "src": m["dst_x"].to_numpy(np.int64),
            "dst": m["dst_y"].to_numpy(np.int64)})
        return out.drop_duplicates(ignore_index=True)

    hop2 = partition_map(edges, ["src"], wedges, 16,
                         drop_part_col=True)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # per-source distinct: direct neighbors vs <=2-hop union
        d = g[g["is_direct"] == 1]
        r1 = d.drop_duplicates(["src", "dst"]) \
            .groupby("src", sort=True).size()
        r2 = g.drop_duplicates(["src", "dst"]) \
            .groupby("src", sort=True).size()
        return pd.DataFrame({
            "part": r2.index.to_numpy(np.int64),
            "reach1": r1.reindex(r2.index).fillna(0)
            .to_numpy(np.int64),
            "reach2": r2.to_numpy(np.int64)})

    def tag(b: pd.DataFrame, direct: int) -> pd.DataFrame:
        return pd.DataFrame({
            "src": b["src"].to_numpy(np.int64),
            "dst": b["dst"].to_numpy(np.int64),
            "is_direct": np.full(len(b), direct, np.int64)})

    tagged = edges.map_batches(
        lambda b: tag(b, 1), batch_format="pandas").union(
        hop2.map_batches(lambda b: tag(b, 0), batch_format="pandas"))
    out = partition_map(tagged, ["src"], finish, 16)
    return out.sort("part")


@register("negative_samples", sql="""
    WITH o AS (SELECT DISTINCT l_orderkey FROM lineitem),
    mx AS (SELECT CAST(max(p_partkey) AS UBIGINT) AS m FROM part),
    cand AS (SELECT o.l_orderkey, g.i,
               CAST(('0x' || substr(md5(
                   CAST(o.l_orderkey AS VARCHAR) || '#' ||
                   CAST(g.i AS VARCHAR)), 1, 16))::UBIGINT
                    % mx.m + 1 AS BIGINT) AS cand_partkey
             FROM o CROSS JOIN mx
             CROSS JOIN generate_series(1, {k}) g(i)),
    mem AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT c.l_orderkey, CAST(c.i AS BIGINT) AS sample_i,
           c.cand_partkey
    FROM cand c ANTI JOIN mem m
      ON m.l_orderkey = c.l_orderkey
     AND m.l_partkey = c.cand_partkey""".format(k=_NEG_K))
def negative_samples(sf_dir: str):
    """Deterministic negative sampling for contrastive training: per
    order, K pseudo-random candidate parts drawn by
    md5(orderkey '#' i) mod max_partkey, keeping only candidates the
    order did NOT contain (the anti-join label check) — the
    (user, positive, negatives) triple generator every two-tower /
    CF trainer needs, reproducible across runs because the draw is a
    content hash, not an RNG. Scale plan: ONE hash exchange on
    l_orderkey co-locates each order's membership set; candidates
    are generated inside the partition from its distinct orderkeys
    (the same md5 C kernel as the sketch twins) and anti-joined
    locally — no second exchange, no broadcast of the fact table.
    max_partkey comes from parquet row-group statistics (a metadata
    read, not a scan)."""
    pf = pq_mod.ParquetFile(_path(sf_dir, "part"))
    idx = pf.schema_arrow.get_field_index("p_partkey")
    mx = max(pf.metadata.row_group(i).column(idx).statistics.max
             for i in range(pf.metadata.num_row_groups))
    mx = np.uint64(mx)

    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        mem = g.drop_duplicates(["l_orderkey", "l_partkey"])
        okeys = np.unique(mem["l_orderkey"].to_numpy(np.int64))
        frames = []
        for i in range(1, _NEG_K + 1):
            s = pd.Series(okeys).astype(str) + f"#{i}"
            h = md5_upper64_flat(s.to_numpy(object))
            frames.append(pd.DataFrame({
                "l_orderkey": okeys,
                "sample_i": np.full(len(okeys), i, np.int64),
                "cand_partkey": (h % mx + np.uint64(1))
                .astype(np.int64)}))
        cand = pd.concat(frames, ignore_index=True)
        hit = cand.merge(
            mem.rename(columns={"l_partkey": "cand_partkey"}),
            on=["l_orderkey", "cand_partkey"], how="left",
            indicator=True)
        keep = hit[hit["_merge"] == "left_only"]
        return pd.DataFrame({
            "l_orderkey": keep["l_orderkey"].to_numpy(np.int64),
            "sample_i": keep["sample_i"].to_numpy(np.int64),
            "cand_partkey": keep["cand_partkey"]
            .to_numpy(np.int64)})

    return partition_map(ds, ["l_orderkey"], per_part, 16)


@register("price_percent_rank", sql="""
    SELECT p_partkey, p_type,
           percent_rank() OVER (
               PARTITION BY p_type
               ORDER BY CAST(round(p_retailprice * 100) AS BIGINT))
             AS pct_rank,
           cume_dist() OVER (
               PARTITION BY p_type
               ORDER BY CAST(round(p_retailprice * 100) AS BIGINT))
             AS cume_d
    FROM part""")
def price_percent_rank(sf_dir: str):
    """percent_rank + cume_dist analytic windows: each part's price
    position within its type — (rank-1)/(n-1) with min-rank ties and
    the tie-inclusive CDF — the normalized-rank features that feed
    calibration and monotone models. One hash exchange on p_type;
    within a partition both statistics come from two binary searches
    of the group's sorted cents vector (np.searchsorted left/right),
    vectorized across all groups' rows — no per-row Python, and the
    int→double divisions are the exact expressions DuckDB evaluates,
    so the floats agree bit-for-bit (single-row groups define
    percent_rank = 0)."""
    ds = rd.read_parquet(_path(sf_dir, "part"),
                         columns=["p_partkey", "p_type",
                                  "p_retailprice"])

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for t, sub in g.groupby("p_type", sort=False):
            cents = np.round(sub["p_retailprice"]
                             .to_numpy(np.float64) * 100) \
                .astype(np.int64)
            order = np.sort(cents)
            n = len(cents)
            lo = np.searchsorted(order, cents, "left")
            hi = np.searchsorted(order, cents, "right")
            pr = (lo / np.float64(n - 1) if n > 1
                  else np.zeros(n, np.float64))
            outs.append(pd.DataFrame({
                "p_partkey": sub["p_partkey"].to_numpy(np.int64),
                "p_type": np.full(n, t, object),
                "pct_rank": pr,
                "cume_d": hi / np.float64(n)}))
        return pd.concat(outs, ignore_index=True)

    return partition_map(ds, ["p_type"], per_type, 8)
