# round-5 session-5 additions, batch 30: blocking-quality audit
# (reduction ratio / pairs completeness), leave-one-source-out
# influence on the corpus mean, and a discrete power-law fit of the
# co-purchase degree distribution.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from .q27_round_5_tpc_2 import _basket_edges_sym

_PL_DMIN = 2
_PL_DRIVER_EDGES = 5_000_000


@register("blocking_quality", sql="""
    WITH p AS (SELECT p_partkey, p_brand, p_type,
                      CAST(p_size AS BIGINT) AS p_size
               FROM part),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
    blocks AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS g
               FROM p GROUP BY p_brand),
    cand AS (SELECT CAST(sum(g * (g - 1) // 2) AS HUGEINT) AS c
             FROM blocks),
    truth AS (SELECT p_type, p_size, CAST(count(*) AS BIGINT) AS g
              FROM p GROUP BY p_type, p_size),
    tp AS (SELECT CAST(sum(g * (g - 1) // 2) AS HUGEINT) AS t
           FROM truth),
    cob AS (SELECT p_type, p_size, p_brand,
                   CAST(count(*) AS BIGINT) AS g
            FROM p GROUP BY p_type, p_size, p_brand),
    cb AS (SELECT CAST(sum(g * (g - 1) // 2) AS HUGEINT) AS c
           FROM cob)
    SELECT (SELECT n FROM n) AS n_parts,
           CAST((SELECT c FROM cand) AS BIGINT) AS candidate_pairs,
           CAST((SELECT t FROM tp) AS BIGINT) AS true_pairs,
           CAST((SELECT c FROM cb) AS BIGINT) AS coblocked_true,
           1.0 - CAST((SELECT c FROM cand) AS DOUBLE)
                 / (CAST((SELECT n FROM n) AS DOUBLE)
                    * (CAST((SELECT n FROM n) AS DOUBLE) - 1.0)
                    / 2.0) AS reduction_ratio,
           CAST((SELECT c FROM cb) AS DOUBLE)
             / CAST((SELECT t FROM tp) AS DOUBLE)
             AS pairs_completeness""")
def blocking_quality(sf_dir: str):
    """BLOCKING-QUALITY AUDIT for entity resolution: with brand as
    the blocking key and identical (type, size) as the ground-truth
    match definition, the REDUCTION RATIO (how much of the n^2 pair
    space blocking avoids) and PAIRS COMPLETENESS (what fraction of
    true matches stay co-blocked) — the two-axis trade-off every
    blocked linkage pipeline (part_linkage /
    sorted_neighborhood_pairs) must report before anyone trusts its
    recall. NO pair is ever enumerated: all three pair counts are
    sums of g(g-1)/2 over group-size censuses — exact integers; the
    two quality axes are shared float expressions. Scale plan:
    three bounded group-size censuses, map-only partials."""
    ds = rd.read_parquet(_path(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "brand": b["p_brand"].to_numpy(object),
            "typ": b["p_type"].to_numpy(object),
            "size": b["p_size"].to_numpy(np.int64),
            "c": np.ones(len(b), np.int64)})
        out = g.groupby(["brand", "typ", "size"],
                        as_index=False).sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    cells = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["brand", "typ", "size"], ["c"])
    n = int(cells["c"].sum())

    def pairs(gb) -> int:
        return sum(int(v) * (int(v) - 1) // 2 for v in gb)

    cand = pairs(cells.groupby("brand")["c"].sum())
    true_p = pairs(cells.groupby(["typ", "size"])["c"].sum())
    cob = pairs(cells["c"])
    rr = 1.0 - np.float64(cand) / (np.float64(n)
                                   * (np.float64(n) - 1.0) / 2.0)
    return pd.DataFrame({
        "n_parts": [np.int64(n)],
        "candidate_pairs": [np.int64(cand)],
        "true_pairs": [np.int64(true_p)],
        "coblocked_true": [np.int64(cob)],
        "reduction_ratio": [np.float64(rr)],
        "pairs_completeness": [np.float64(cob)
                               / np.float64(true_p)]})


@register("source_influence", sql="""
    WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(n_chars) AS BIGINT) AS s
               FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                 CAST(sum(s) AS HUGEINT) AS ts FROM g)
    SELECT source, n AS n_docs,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS source_mean,
           CAST((SELECT ts FROM t) - s AS DOUBLE)
             / CAST((SELECT tn FROM t) - n AS DOUBLE)
           - CAST((SELECT ts FROM t) AS DOUBLE)
             / CAST((SELECT tn FROM t) AS DOUBLE) AS loo_delta,
           CAST(row_number() OVER (ORDER BY
                abs(CAST((SELECT ts FROM t) - s AS DOUBLE)
                    / CAST((SELECT tn FROM t) - n AS DOUBLE)
                    - CAST((SELECT ts FROM t) AS DOUBLE)
                      / CAST((SELECT tn FROM t) AS DOUBLE)) DESC,
                source) AS BIGINT) AS influence_rank
    FROM g ORDER BY source""")
def source_influence(sf_dir: str):
    """LEAVE-ONE-SOURCE-OUT INFLUENCE on the corpus mean document
    length: for each source, how far the corpus mean MOVES when
    that source is removed — the group-level influence function
    (the data-valuation primitive behind 'which source is dragging
    our quality metric', the aggregate cousin of
    loo_target_encode's row-level trick). Every leave-one-out mean
    is a closed-form exact-integer rational ((T-s)/(N-n)), so no
    recomputation pass exists anywhere; deltas and the influence
    ranking (|delta| DESC with source tie-break, on identical
    doubles) are shared expressions. Scale plan: one (source,
    count, sum) census; O(sources) driver arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "source": b["source"].to_numpy(object),
            "n": np.ones(len(b), np.int64),
            "s": b["n_chars"].to_numpy(np.int64)}) \
            .groupby("source", as_index=False).sum()
        for c in ("n", "s"):
            g[c] = g[c].astype(np.int64)
        return g

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["n", "s"], exact_int=True)
    tn = sum(int(v) for v in g["n"])
    ts = sum(int(v) for v in g["s"])
    gmean = np.float64(ts) / np.float64(tn)
    rows = []
    for _, r in g.iterrows():
        n, s = int(r["n"]), int(r["s"])
        delta = np.float64(ts - s) / np.float64(tn - n) - gmean
        rows.append({"source": r["source"], "n_docs": np.int64(n),
                     "source_mean": np.float64(s) / np.float64(n),
                     "loo_delta": np.float64(delta)})
    out = pd.DataFrame(rows)
    out = out.sort_values("source", kind="mergesort") \
        .reset_index(drop=True)
    order = out.assign(a=np.abs(out["loo_delta"])) \
        .sort_values(["a", "source"], ascending=[False, True],
                     kind="mergesort").index
    rank = pd.Series(np.arange(1, len(out) + 1, dtype=np.int64),
                     index=order)
    out["influence_rank"] = rank.sort_index().to_numpy(np.int64)
    return out


@register("degree_powerlaw", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT src, dst FROM p0 UNION ALL SELECT dst, src
          FROM p0),
    dg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
           FROM e GROUP BY 1),
    tail AS (SELECT deg FROM dg WHERE deg >= {dm}),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(floor(ln(CAST(deg AS DOUBLE)
                      / ({dm} - 0.5)) * 1000000.0 + 0.5)
                      AS BIGINT)) AS BIGINT) AS lsum
          FROM tail)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM dg) AS n_nodes,
           (SELECT n FROM s) AS n_tail,
           (SELECT lsum FROM s) AS log_sum_micro,
           1.0 + CAST((SELECT n FROM s) AS DOUBLE)
                 / (CAST((SELECT lsum FROM s) AS DOUBLE)
                    / 1000000.0) AS powerlaw_alpha""".format(
    dm=_PL_DMIN))
def degree_powerlaw(sf_dir: str):
    """DISCRETE POWER-LAW exponent of the co-purchase degree
    distribution (Clauset-Shalizi-Newman continuous approximation
    with the -1/2 offset, dmin = {dm}): alpha = 1 + n / sum
    ln(d/(dmin-1/2)) — is the graph scale-free, the
    network-science claim rich_club and config_model_triangles
    presuppose when they reason about hubs? Each log ratio of an
    exact integer degree quantizes to micro units half-up before
    the integer fold; alpha is one shared float expression. Scale
    plan: degrees from the shared basket edges (one bounded
    census); the tail fold is O(nodes) — at fleet scale the degree
    HISTOGRAM (bounded support) replaces the per-node fold
    unchanged."""
    edges2 = _basket_edges_sym(sf_dir).materialize()
    if edges2.count() > _PL_DRIVER_EDGES:
        raise ValueError(
            "degree_powerlaw: edge list exceeds the driver fold "
            "bound; use the degree-histogram tier")
    e = edges2.to_pandas()
    src = e["src"].to_numpy(np.int64)
    vs, cs = np.unique(src, return_counts=True)
    tail = cs[cs >= _PL_DMIN]
    n = len(tail)
    lsum = int(np.floor(
        np.log(tail.astype(np.float64) / (_PL_DMIN - 0.5))
        * 1000000.0 + 0.5).astype(np.int64).sum())
    return pd.DataFrame({
        "n_nodes": [np.int64(len(vs))],
        "n_tail": [np.int64(n)],
        "log_sum_micro": [np.int64(lsum)],
        "powerlaw_alpha": [1.0 + np.float64(n)
                           / (np.float64(lsum) / 1000000.0)]})
