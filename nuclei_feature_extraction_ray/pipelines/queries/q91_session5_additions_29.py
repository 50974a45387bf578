# round-5 session-5 additions, batch 29: upper tail-dependence of
# quantity and discount, the Palma income-share inequality ratio,
# and the embedding hubness diagnostic.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from .q13_embedding_table_operators import _EMB_UNPACK_SQL, _emb_micro

_TD_Q = 0.95
_HUB_K = 5


@register("tail_dependence", sql="""
    WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                      CAST(floor(l_discount * 100 + 0.5)
                           AS BIGINT) AS y
               FROM lineitem),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
    qx AS (SELECT x AS v FROM (
             SELECT x, row_number() OVER (ORDER BY x) AS i FROM r)
           WHERE i = CAST(ceil({q} * (SELECT n FROM n))
                          AS BIGINT)),
    qy AS (SELECT y AS v FROM (
             SELECT y, row_number() OVER (ORDER BY y) AS i FROM r)
           WHERE i = CAST(ceil({q} * (SELECT n FROM n))
                          AS BIGINT)),
    c AS (SELECT CAST(count(*) AS BIGINT) AS joint FROM r
          WHERE x > (SELECT v FROM qx)
            AND y > (SELECT v FROM qy))
    SELECT (SELECT n FROM n) AS n_rows,
           (SELECT v FROM qx) AS x_q95,
           (SELECT v FROM qy) AS y_q95,
           (SELECT joint FROM c) AS n_joint_exceed,
           (CAST((SELECT joint FROM c) AS DOUBLE)
            / CAST((SELECT n FROM n) AS DOUBLE))
           / (1.0 - {q}) AS lambda_upper""".format(q=_TD_Q))
def tail_dependence(sf_dir: str):
    """UPPER TAIL-DEPENDENCE coefficient between quantity and
    discount: the probability both variables STRICTLY exceed their
    95% order statistics, normalized by 1-q — near 0 for
    asymptotically independent tails (a correlation can still be
    high!), near 1 when extremes co-occur; the copula-tail
    diagnostic that partial_corr/hoeffding_d cannot see and risk
    aggregation depends on. Thresholds are exact order statistics
    over the bounded domains and the joint-exceedance census is an
    exact integer count; lambda is one shared float expression.
    Scale plan: per-batch (value) histogram partials fix both
    thresholds; one more counting pass with the two broadcast
    integer cutoffs — bounded grids, zero row-grain exchange."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_discount"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "x": b["l_quantity"].to_numpy(np.int64),
            "y": np.floor(b["l_discount"].to_numpy(np.float64)
                          * 100 + 0.5).astype(np.int64),
            "c": np.ones(len(b), np.int64)}) \
            .groupby(["x", "y"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(hist, batch_format="pandas"),
        ["x", "y"], ["c"])
    n = int(h["c"].sum())
    k = int(np.ceil(_TD_Q * np.float64(n)))

    def qcut(col: str) -> int:
        g = h.groupby(col)["c"].sum().sort_index()
        cum = g.cumsum()
        return int(g.index[(cum >= k).to_numpy().argmax()])

    xq, yq = qcut("x"), qcut("y")
    joint = int(h.loc[(h["x"] > xq) & (h["y"] > yq), "c"].sum())
    lam = (np.float64(joint) / np.float64(n)) / (1.0 - _TD_Q)
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "x_q95": [np.int64(xq)],
        "y_q95": [np.int64(yq)],
        "n_joint_exceed": [np.int64(joint)],
        "lambda_upper": [np.float64(lam)]})


@register("palma_ratio", sql="""
    WITH c AS (SELECT o_custkey,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS s
               FROM orders GROUP BY 1),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(s) AS HUGEINT) AS tot FROM c),
    r AS (SELECT s, row_number() OVER (ORDER BY s, o_custkey)
                   AS i
          FROM c),
    seg AS (SELECT
        CAST(sum(CASE WHEN i <= (2 * (SELECT k FROM k)) // 5
                 THEN s ELSE 0 END) AS HUGEINT) AS bot40,
        CAST(sum(CASE WHEN i > (SELECT k FROM k)
                          - (SELECT k FROM k) // 10
                 THEN s ELSE 0 END) AS HUGEINT) AS top10
      FROM r)
    SELECT (SELECT k FROM k) AS n_customers,
           CAST((SELECT bot40 FROM seg) AS BIGINT)
             AS bottom40_cents,
           CAST((SELECT top10 FROM seg) AS BIGINT) AS top10_cents,
           CAST((SELECT top10 FROM seg) AS DOUBLE)
             / CAST((SELECT tot FROM k) AS DOUBLE) AS top10_share,
           CAST((SELECT top10 FROM seg) AS DOUBLE)
             / CAST((SELECT bot40 FROM seg) AS DOUBLE)
             AS palma_ratio""")
def palma_ratio(sf_dir: str):
    """PALMA RATIO of customer spend concentration: revenue of the
    top 10% of customers over the bottom 40% — the inequality
    measure policy analysis now prefers to Gini (which is
    insensitive exactly where distributions move: the middle),
    completing the gini_spend / theil_index / atkinson_index
    family. Segment membership is exact integer rank arithmetic
    (k//10 and 2k//5 with custkey tie-break) and both segment sums
    are exact integer folds; only the final shares divide. Scale
    plan: per-customer spend cells fold through the guarded
    combine; the rank cut is the two-phase zipWithIndex exchange at
    fleet scale (systematic_sample's plan)."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "s": cents}).groupby("cust", as_index=False).sum()
        g["s"] = g["s"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["cust"], ["s"], exact_int=True)
    c = c.assign(s_int=c["s"].map(int)).sort_values(
        ["s_int", "cust"], kind="mergesort").reset_index(drop=True)
    s = [int(x) for x in c["s_int"]]
    k = len(s)
    tot = sum(s)
    bot = sum(s[: (2 * k) // 5])
    top = sum(s[k - k // 10:])
    return pd.DataFrame({
        "n_customers": [np.int64(k)],
        "bottom40_cents": [np.int64(bot)],
        "top10_cents": [np.int64(top)],
        "top10_share": [np.float64(top) / np.float64(tot)],
        "palma_ratio": [np.float64(top) / np.float64(bot)]})


@register("hubness_score", sql=f"""
    WITH m AS ({_EMB_UNPACK_SQL}),
    d AS (SELECT a.vec_id AS qa, b.vec_id AS qb,
                 CAST(sum(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT)
                   AS dot
          FROM m a JOIN m b ON a.i = b.i
                           AND a.vec_id <> b.vec_id
          GROUP BY a.vec_id, b.vec_id),
    rk AS (SELECT qa, qb,
                  row_number() OVER (PARTITION BY qa
                      ORDER BY dot DESC, qb) AS r
           FROM d),
    occ AS (SELECT qb AS vec_id, CAST(count(*) AS BIGINT) AS k_occ
            FROM rk WHERE r <= {_HUB_K} GROUP BY qb),
    alln AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n
             FROM m),
    f AS (SELECT v.vec_id, COALESCE(occ.k_occ, 0) AS k_occ
          FROM (SELECT DISTINCT vec_id FROM m) v
          LEFT JOIN occ ON occ.vec_id = v.vec_id),
    mo AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(k_occ) AS HUGEINT) AS s1,
                  CAST(sum(k_occ * k_occ) AS HUGEINT) AS s2,
                  CAST(sum(k_occ * k_occ * k_occ) AS HUGEINT)
                    AS s3,
                  CAST(max(k_occ) AS BIGINT) AS mx
           FROM f),
    c AS (SELECT CAST(n AS DOUBLE) AS fn,
                 CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                 CAST(s1 AS DOUBLE) AS f1, CAST(s2 AS DOUBLE)
                   AS f2, CAST(s3 AS DOUBLE) AS f3,
                 mx
          FROM mo)
    SELECT CAST(fn AS BIGINT) AS n_vecs, mx AS max_k_occurrence,
           (f3 / fn - 3.0 * mu * (f2 / fn) + 2.0 * mu * mu * mu)
           / sqrt((f2 / fn - mu * mu) * (f2 / fn - mu * mu)
                  * (f2 / fn - mu * mu)) AS hubness_skew
    FROM c""")
def hubness_score(sf_dir: str):
    """EMBEDDING HUBNESS diagnostic: how often each vector appears
    in other vectors' exact top-{_HUB_K} inner-product neighbor
    lists (k-occurrence), summarized by the skewness of that count
    and the worst hub — high positive skew is the
    curse-of-dimensionality signature that silently corrupts every
    kNN consumer (ann_cosine, semantic_dedup, mutual_nn: a few
    hubs end up in everyone's neighbor list). Dots are exact
    integer products of the micro-quantized components, so neighbor
    ranking (dot DESC, vec_id) and the k-occurrence census are
    bit-exact; the skewness is a shared float expression over
    exact integer moments. Scale plan: the exact tier is the
    bounded-query brute-force matmul (one pass of blocks against
    the broadcast query side, the ann_cosine plan); above the
    documented bound the IVF bucketed tier takes over and this
    census runs on its candidate lists."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    rows = ds.limit(100_001).to_pandas()
    if len(rows) > 100_000:
        raise ValueError("hubness_score: vector count exceeds the "
                         "exact-tier bound; use the IVF tier")
    c = _emb_micro(rows["embedding"])
    ids = rows["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids, kind="stable")
    c = c[order]
    ids = ids[order]
    n = len(ids)
    dots = c.astype(np.float64) @ c.astype(np.float64).T
    # exact: components are micro ints; float64 products are exact
    # up to 2^53 (|c| <= ~2e6 -> dot <= 64*4e12 ~ 2.6e14 < 2^53)
    np.fill_diagonal(dots, -np.inf)
    k_occ = np.zeros(n, np.int64)
    for i in range(n):
        row = dots[i]
        idx = np.lexsort((ids, -row))[:_HUB_K]
        k_occ[idx] += 1
    s1 = int(k_occ.sum())
    s2 = int((k_occ * k_occ).sum())
    s3 = int((k_occ.astype(object) ** 3).sum())
    fn_ = np.float64(n)
    mu = np.float64(s1) / fn_
    f2, f3 = np.float64(s2), np.float64(s3)
    m2 = f2 / fn_ - mu * mu
    m3 = f3 / fn_ - 3.0 * mu * (f2 / fn_) + 2.0 * mu * mu * mu
    return pd.DataFrame({
        "n_vecs": [np.int64(n)],
        "max_k_occurrence": [np.int64(int(k_occ.max()))],
        "hubness_skew": [m3 / np.sqrt(m2 * m2 * m2)]})
