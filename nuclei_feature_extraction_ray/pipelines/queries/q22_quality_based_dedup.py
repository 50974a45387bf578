# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (EVENTS_P, JACCARD_NGRAM, JACCARD_TAU, ORACLE, _combine_partials, _events, _path, dedup_mod, np, pa, partition_map, partitioned_apply, pd, rd, register)

@register("dedup_survivor", sql="""
    WITH RECURSIVE pairs AS MATERIALIZED (
      SELECT a, b FROM ({jac}) jp
    ), edges AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM pairs
      UNION SELECT b, a FROM pairs
    ), reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ), cl AS (
      SELECT src AS doc_id, min(dst) AS cluster
      FROM reach GROUP BY src)
    SELECT d.doc_id, CAST(cl.cluster AS BIGINT) AS cluster,
           CAST(row_number() OVER (
               PARTITION BY cl.cluster
               ORDER BY d.n_chars DESC, d.doc_id) = 1 AS BIGINT)
               AS keep
    FROM documents d JOIN cl USING (doc_id) ORDER BY d.doc_id""")
def dedup_survivor(sf_dir: str):
    """Quality-based dedup SURVIVORSHIP: within each near-dup
    cluster, keep the LONGEST document (ties by doc_id) instead of
    the min-id representative — the policy a curation pipeline
    actually wants (min-id keeps an arbitrary copy; this keeps the
    best one). Pipeline: exact-Jaccard pairs -> distributed CC ->
    cluster attach -> one co-partitioning exchange joins back each
    doc's quality signal -> one cluster-keyed exchange flags the
    per-cluster argmax vectorized (lexsort + first). Demonstrates
    that the survivor policy is pluggable over the same cluster
    machinery."""
    from ...stages.graph import attach_clusters, connected_components

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    pairs = dedup_mod.jaccard_pairs(ds, "text", "doc_id",
                                    ngram=JACCARD_NGRAM,
                                    threshold=JACCARD_TAU)
    cc = connected_components(pairs, "a", "b", num_partitions=8)
    ids = rd.read_parquet(_path(sf_dir, "documents"),
                          columns=["doc_id"])
    labeled = attach_clusters(ids, cc, "doc_id", num_partitions=8)

    meta = rd.read_parquet(_path(sf_dir, "documents"),
                           columns=["doc_id", "n_chars"])

    def lab_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "cluster": b["cluster"].to_numpy(np.int64),
            "n_chars": np.zeros(len(b), np.int64),
            "side": np.zeros(len(b), np.int64)})

    def meta_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "cluster": np.zeros(len(b), np.int64),
            "n_chars": b["n_chars"].to_numpy(np.int64),
            "side": np.ones(len(b), np.int64)})

    both = labeled.map_batches(lab_rows, batch_format="pandas") \
        .union(meta.map_batches(meta_rows, batch_format="pandas"))

    def join_quality(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["side"] == 0][["doc_id", "cluster"]]
        mt = g[g["side"] == 1][["doc_id", "n_chars"]]
        return lab.merge(mt, on="doc_id")

    joined = partition_map(both, ["doc_id"], join_quality, 8)

    def argmax_flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster", "n_chars", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        first = ~g["cluster"].duplicated()
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "cluster": g["cluster"].to_numpy(np.int64),
            "keep": first.to_numpy().astype(np.int64)})

    out = partition_map(joined, ["cluster"], argmax_flag,
                        8).to_pandas()
    return out.sort_values("doc_id",
                           kind="mergesort").reset_index(drop=True)


ORACLE["dedup_survivor"] = ORACLE["dedup_survivor"].format(
    jac=ORACLE["jaccard_pairs"])


@register("basket_lift", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    t AS (SELECT CAST(count(DISTINCT l_orderkey) AS HUGEINT)
              AS n_orders FROM d),
    m AS (SELECT l_partkey, CAST(count(*) AS HUGEINT) AS n
          FROM d GROUP BY l_partkey),
    p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                 CAST(count(*) AS HUGEINT) AS n_ab
          FROM d a JOIN d b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT pa AS part_a, pb AS part_b,
           CAST(n_ab AS BIGINT) AS n_orders_ab,
           CAST(n_ab * t.n_orders AS DOUBLE)
             / CAST(ma.n * mb.n AS DOUBLE) AS lift
    FROM p CROSS JOIN t
    JOIN m ma ON ma.l_partkey = pa
    JOIN m mb ON mb.l_partkey = pb
    ORDER BY lift DESC, part_a, part_b""")
def basket_lift(sf_dir: str):
    """Association-rule LIFT over the co-order pairs: lift =
    P(a,b) / (P(a)·P(b)) — how much more often two parts co-occur
    than independence predicts (support alone favors popular items;
    lift finds genuine affinity). ONE lineitem scan AND one
    full-grain exchange: `_basket_fused` computes the pair partials,
    the per-part marginals and the distinct-order count in the SAME
    orderkey-exchange pass (marginals and the count are
    partition-additive there because orders never span partitions) —
    previously the marginals and the count each paid their own
    full-grain exchange. Marginals are a dimension-sized frame
    broadcast as a sorted array (guarded in the helper). Lift =
    exact-int cross-product ratio, one double division per pair."""
    from .q10_feature_engineering_readability import _basket_fused
    edges, marg, n_orders = _basket_fused(sf_dir)
    mk = marg["l_partkey"].to_numpy(np.int64)
    mn = marg["n"].to_numpy(np.int64)

    def add_lift(b: pd.DataFrame) -> pd.DataFrame:
        pa = b["part_a"].to_numpy(np.int64)
        pb = b["part_b"].to_numpy(np.int64)
        nab = b["n_orders"].to_numpy(np.int64)
        na = mn[np.searchsorted(mk, pa)]
        nb = mn[np.searchsorted(mk, pb)]
        return pd.DataFrame({
            "part_a": pa, "part_b": pb, "n_orders_ab": nab,
            "lift": (nab * n_orders).astype(np.float64)
            / (na * nb).astype(np.float64)})

    out = edges.map_batches(add_lift,
                            batch_format="pandas").to_pandas()
    return out.sort_values(["lift", "part_a", "part_b"],
                           ascending=[False, True, True],
                           kind="mergesort").reset_index(drop=True)


@register("user_type_entropy", sql="""
    WITH c AS (SELECT user_id, event_type,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY user_id, event_type),
    a AS (SELECT user_id,
                 CAST(sum(n) AS BIGINT) AS n_events,
                 CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(CAST(floor(CAST(1e6 AS DOUBLE) * n
                                     * ln(CAST(n AS DOUBLE)) + 0.5)
                               AS BIGINT)) AS BIGINT) AS s_unat
          FROM c GROUP BY user_id)
    SELECT user_id, n_events, n_types,
           ln(CAST(n_events AS DOUBLE))
             - (CAST(s_unat AS DOUBLE) / CAST(1e6 AS DOUBLE))
               / CAST(n_events AS DOUBLE) AS type_entropy
    FROM a ORDER BY user_id""")
def user_type_entropy(sf_dir: str):
    """Behavioral diversity per user: Shannon entropy of each user's
    event-type mix (0 = does one thing, ln(k) = uniform over k
    types) — the engagement-breadth feature (source_diversity's
    machinery at entity grain). Per-batch (user, type) count
    partials -> ONE user exchange -> per-partition entropy
    vectorized over ALL users (integer micro-nat folds, order-free)
    — user-grain output, no driver state."""
    ds = _events(sf_dir, columns=["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["user_id", "event_type"],
                      as_index=False).agg(n=("user_id", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "event_type"],
                      as_index=False).agg(n=("n", "sum"))
        n = g["n"].to_numpy(np.int64)
        unat = np.floor(1e6 * n.astype(np.float64)
                        * np.log(n.astype(np.float64))
                        + 0.5).astype(np.int64)
        a = g.assign(unat=unat).groupby("user_id", as_index=False) \
            .agg(n_events=("n", "sum"), n_types=("n", "size"),
                 s_unat=("unat", "sum"))
        ne = a["n_events"].to_numpy(np.int64)
        ent = (np.log(ne.astype(np.float64))
               - (a["s_unat"].to_numpy(np.int64)
                  .astype(np.float64) / 1e6)
               / ne.astype(np.float64))
        return pd.DataFrame({
            "user_id": a["user_id"].to_numpy(np.int64),
            "n_events": ne,
            "n_types": a["n_types"].to_numpy(np.int64),
            "type_entropy": ent})

    out = partitioned_apply(
        ds.map_batches(partial, batch_format="pandas"),
        "user_id", entropy, EVENTS_P).to_pandas()
    return out.sort_values("user_id",
                           kind="mergesort").reset_index(drop=True)
