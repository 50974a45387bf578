# round-5 session-4 additions, batch 5: Atkinson inequality index,
# NDCG@10 ranking evaluation, and Kendall's W concordance across
# three distributed rankings.
from __future__ import annotations

import ray

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map


@register("atkinson_index", sql="""
    WITH c AS (SELECT o_custkey,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS y
               FROM orders GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(CAST(floor(ln(CAST(y AS DOUBLE))
                                     * 1000000.0 + 0.5) AS BIGINT))
                      AS HUGEINT) AS sl
          FROM c)
    SELECT n AS n_customers,
           CAST(sy AS BIGINT) AS total_cents,
           CAST(sl AS BIGINT) AS sum_ln_micro,
           1.0 - exp(CAST(sl AS DOUBLE) / 1000000.0
                     / CAST(n AS DOUBLE))
                 / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             AS atkinson_e1
    FROM m""")
def atkinson_index(sf_dir: str):
    """ATKINSON INEQUALITY INDEX (epsilon = 1) of per-customer spend:
    A = 1 - geomean/mean — the welfare-based inequality measure
    completing the gini_spend / theil_index family. Each customer's
    ln(spend) quantizes to micro units (the shared half-up formula on
    a bit-identical double), so the log-sum is an exact integer fold
    at any scale; geomean and mean then compose in ONE shared float
    expression. Scale plan: spend folds to customer grain through one
    custkey exchange; each partition emits 3 scalars (n, sum, ln-sum)
    — the combine is O(partitions)."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"k": b["o_custkey"].to_numpy(np.int64),
                          "y": cents}).groupby("k",
                                               as_index=False).sum()
        g["y"] = g["y"].astype(np.int64)
        return g

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("k", as_index=False)["y"].sum()
        y = a["y"].to_numpy(np.int64)
        ln_micro = np.floor(np.log(y.astype(np.float64)) * 1000000.0
                            + 0.5).astype(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(a)], np.int64),
            "sy": np.array([int(y.sum())], np.int64),
            "sl": np.array([int(ln_micro.sum())], np.int64)})

    s = _combine_partials(
        partition_map(
            ds.map_batches(partial, batch_format="pandas"),
            ["k"], moments, 16),
        ["j"], ["n", "sy", "sl"], exact_int=True)
    n = int(s["n"].iloc[0])
    sy, sl = int(s["sy"].iloc[0]), int(s["sl"].iloc[0])
    atk = 1.0 - np.exp(np.float64(sl) / 1000000.0 / np.float64(n)) \
        / (np.float64(sy) / np.float64(n))
    return pd.DataFrame({
        "n_customers": [np.int64(n)],
        "total_cents": [np.int64(sy)],
        "sum_ln_micro": [np.int64(sl)],
        "atkinson_e1": [np.float64(atk)]})


_NDCG_K = 10


@register("ndcg_eval", sql="""
    WITH rel AS (SELECT doc_id, lang, n_chars,
                        CAST(CAST(substr(source, 4) AS BIGINT) % 4
                             AS BIGINT) AS rel
                 FROM documents),
    ranked AS (SELECT lang, rel,
                      row_number() OVER (PARTITION BY lang
                          ORDER BY n_chars DESC, doc_id) AS pos
               FROM rel),
    top AS (SELECT lang, rel, pos FROM ranked WHERE pos <= {k}),
    ideal AS (SELECT lang, rel,
                     row_number() OVER (PARTITION BY lang
                         ORDER BY rel DESC, pos) AS ipos
              FROM top),
    d AS (SELECT lang,
                 CAST(sum(CAST(floor(CAST(rel AS DOUBLE)
                          / log2(CAST(pos + 1 AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS dcg_micro
          FROM top GROUP BY lang),
    i AS (SELECT lang,
                 CAST(sum(CAST(floor(CAST(rel AS DOUBLE)
                          / log2(CAST(ipos + 1 AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS idcg_micro
          FROM ideal GROUP BY lang)
    SELECT lang, dcg_micro, idcg_micro,
           CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE)
             AS ndcg
    FROM d JOIN i USING (lang) ORDER BY lang""".format(k=_NDCG_K))
def ndcg_eval(sf_dir: str):
    """NDCG@10 ranking evaluation per language: the retrieval ranking
    orders documents by length (n_chars DESC, doc_id tie-break), the
    graded relevance label is derived deterministically from the
    source id (src_i -> i mod 4, grades 0-3), and NDCG normalizes the
    position-discounted gain against the ideal reordering OF THE
    RETRIEVED LIST (the within-list NDCG variant — documented
    choice). Each position's rel/log2(pos+1) term is a bit-identical
    double quantized to micro units before the per-query sum, so DCG
    and IDCG are exact integer folds and ndcg is one final division.
    Scale plan: per-batch local top-k per language (k x langs rows)
    merge on the driver — the topk_per_group combiner shape; nothing
    row-grain is shuffled."""
    k = _NDCG_K
    ds = rd.read_parquet(
        _path(sf_dir, "documents"),
        columns=["doc_id", "lang", "n_chars", "source"])

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "lang": b["lang"], "doc_id": b["doc_id"]
            .to_numpy(np.int64),
            "n_chars": b["n_chars"].to_numpy(np.int64),
            "rel": np.array([int(s[3:]) % 4 for s in b["source"]],
                            np.int64)})
        d = d.sort_values(["lang", "n_chars", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return d.groupby("lang", as_index=False).head(k)

    parts = ds.map_batches(local_top, batch_format="pandas") \
        .limit(1_000_001).to_pandas()
    if len(parts) > 1_000_000:
        raise ValueError("ndcg_eval: top-k partials exceeded the "
                         "driver bound")
    rows = []
    for lang, g in parts.groupby("lang"):
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").head(k)
        rel = g["rel"].to_numpy(np.int64)
        pos = np.arange(1, len(rel) + 1, dtype=np.int64)
        dcg_terms = np.floor(
            rel.astype(np.float64)
            / np.log2((pos + 1).astype(np.float64))
            * 1000000.0 + 0.5).astype(np.int64)
        order = np.lexsort((pos, -rel))       # rel DESC, pos ASC
        irel = rel[order]
        idcg_terms = np.floor(
            irel.astype(np.float64)
            / np.log2((pos + 1).astype(np.float64))
            * 1000000.0 + 0.5).astype(np.int64)
        dcg, idcg = int(dcg_terms.sum()), int(idcg_terms.sum())
        rows.append({"lang": lang, "dcg_micro": np.int64(dcg),
                     "idcg_micro": np.int64(idcg),
                     "ndcg": np.float64(dcg) / np.float64(idcg)})
    return pd.DataFrame(rows).sort_values(
        "lang", kind="mergesort").reset_index(drop=True)


@register("kendall_w", sql="""
    WITH f AS (SELECT doc_id,
                      CAST(n_chars AS BIGINT) AS m1,
                      CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f')
                                     = '' THEN 0
                           ELSE len(string_split_regex(
                               trim(text, E' \\t\\n\\r\\f'),
                               '[ \\t\\n\\r\\f]+')) END AS BIGINT)
                        AS m2,
                      CAST(length(text)
                           - length(replace(text, chr(10), ''))
                           AS BIGINT) AS m3
               FROM documents),
    r AS (SELECT doc_id,
                 row_number() OVER (ORDER BY m1, doc_id)
                 + row_number() OVER (ORDER BY m2, doc_id)
                 + row_number() OVER (ORDER BY m3, doc_id) AS rsum
          FROM f),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(rsum * rsum) AS HUGEINT) AS sr2
          FROM r)
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(sr2 AS BIGINT) AS sum_rsum_sq,
           CAST(12 * sr2 - 3 * 9 * n * (n + 1) * (n + 1) AS DOUBLE)
             / CAST(9 * (n * n * n - n) AS DOUBLE) AS kendall_w
    FROM m""")
def kendall_w(sf_dir: str):
    """KENDALL'S W (coefficient of concordance) across THREE
    rankings of the document corpus — by character count, by token
    count, and by line count (each tie-broken by doc_id, so every
    ranking is a permutation) — 'do the three length notions agree
    on document ordering?'. W = (12*sum(R_i^2) - 3*m^2*n*(n+1)^2) /
    (m^2*(n^3-n)) with m = 3: all integer moments, ONE final
    division — bit-exact. Scale plan: each ranking is the
    distributed two-pass zipWithIndex shape (systematic_sample):
    per-metric-value histogram -> broadcast prefix offsets -> one
    exchange on the metric value assigns exact global ranks with
    doc_id tie-break inside the value bucket; a final doc_id
    exchange sums the three ranks per doc and folds (n, sum R^2)
    partials. Here the three rank passes co-reside in one
    metric-keyed exchange per ranker over bounded-domain metrics."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text", "n_chars"])

    def metrics(b: pd.DataFrame) -> pd.DataFrame:
        toks = [len(t.split()) if isinstance(t, str) and t.split()
                else 0 for t in b["text"]]
        lines = [t.count("\n") if isinstance(t, str) else 0
                 for t in b["text"]]
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "m1": b["n_chars"].to_numpy(np.int64),
            "m2": np.asarray(toks, np.int64),
            "m3": np.asarray(lines, np.int64)})

    feats = ds.map_batches(metrics, batch_format="pandas") \
        .materialize()

    def rank_one(col: str):
        # pass 1: per-value histogram -> prefix offsets
        def hist(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(col, as_index=False).size()
            return pd.DataFrame({
                "v": g[col].to_numpy(np.int64),
                "n": g["size"].to_numpy(np.int64)})

        h = _combine_partials(
            feats.map_batches(hist, batch_format="pandas"),
            ["v"], ["n"]).sort_values("v")
        offs = dict(zip(
            h["v"].to_numpy(np.int64),
            np.concatenate(([0],
                            np.cumsum(h["n"].to_numpy(np.int64))))
            [:-1]))
        off_ref = ray.put(offs)

        # pass 2: one exchange on the metric value; exact rank =
        # offset(value) + position among equal-valued docs by doc_id
        def assign(g: pd.DataFrame) -> pd.DataFrame:
            om = ray.get(off_ref)
            g = g.sort_values([col, "doc_id"], kind="mergesort")
            v = g[col].to_numpy(np.int64)
            starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
            within = np.arange(len(v), dtype=np.int64) \
                - np.repeat(starts, np.diff(np.r_[starts, len(v)]))
            base = np.array([om[int(x)] for x in v], np.int64)
            return pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "rank": base + within + 1})

        return partition_map(feats.select_columns(["doc_id", col]),
                             [col], assign, 8)

    ranks = rank_one("m1")
    for col in ("m2", "m3"):
        ranks = ranks.union(rank_one(col))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("doc_id", as_index=False)["rank"].sum()
        rs = a["rank"].to_numpy(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(a)], np.int64),
            "sr2": np.array([int(np.dot(rs.astype(object),
                                        rs.astype(object)))],
                            object)})

    s = _combine_partials(
        partition_map(ranks, ["doc_id"], fold, 16),
        ["j"], ["n", "sr2"], exact_int=True)
    n = int(s["n"].iloc[0])
    sr2 = int(s["sr2"].iloc[0])
    m = 3
    w = np.float64(12 * sr2 - 3 * m * m * n * (n + 1) * (n + 1)) \
        / np.float64(m * m * (n ** 3 - n))
    return pd.DataFrame({
        "n_docs": [np.int64(n)],
        "sum_rsum_sq": [np.int64(sr2)],
        "kendall_w": [w]})
