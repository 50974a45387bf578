# round-5 session-5 additions, batch 2: MAP@10 ranking evaluation,
# the McNemar paired test of two quality heuristics, and Newman
# modularity of the co-purchase graph under the brand partition.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, _read_dim, np, pd, rd,
                      register)
from .q10_feature_engineering_readability import _basket_edges

_MAP_K = 10
#: mcnemar_test: the two paired quality heuristics
_MC_CHARS = 300
_MC_TOKS = 55


@register("map_eval", sql="""
    WITH rel AS (SELECT doc_id, lang, n_chars,
                        CASE WHEN CAST(substr(source, 4) AS BIGINT)
                                  % 4 >= 2
                             THEN 1 ELSE 0 END AS rel
                 FROM documents),
    rk AS (SELECT lang, rel,
                  row_number() OVER (PARTITION BY lang
                      ORDER BY n_chars DESC, doc_id) AS pos
           FROM rel),
    top AS (SELECT lang, rel, pos,
                   CAST(sum(rel) OVER (PARTITION BY lang
                        ORDER BY pos ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum
            FROM rk WHERE pos <= {k}),
    t AS (SELECT lang,
                 CAST(sum(CASE WHEN rel = 1 THEN
                      CAST(floor(CAST(cum AS DOUBLE)
                                 / CAST(pos AS DOUBLE)
                                 * 1000000.0 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS ap_sum_micro,
                 CAST(sum(rel) AS BIGINT) AS n_relevant
          FROM top GROUP BY lang)
    SELECT lang, n_relevant, ap_sum_micro,
           CASE WHEN n_relevant > 0
                THEN CAST(ap_sum_micro AS DOUBLE) / 1000000.0
                     / CAST(n_relevant AS DOUBLE)
                ELSE NULL END AS ap10
    FROM t ORDER BY lang""".format(k=_MAP_K))
def map_eval(sf_dir: str):
    """MAP@10 (mean average precision) per language, completing the
    ndcg_eval ranking-evaluation pair with the binary-relevance
    metric: the same length ranking (n_chars DESC, doc_id tie-break)
    and the same deterministic labels (source id mod 4), binarized at
    grade >= 2. Precision@i at each relevant position quantizes to
    micro units with the shared half-up formula BEFORE the per-query
    sum (the ndcg fold policy), so AP is an exact integer fold with
    one final division by the within-list relevant count (NULL when
    none are relevant, matching the oracle CASE). Scale plan:
    per-batch local top-k per language (k x langs rows) merge on the
    driver — the topk_per_group combiner shape; nothing row-grain is
    shuffled."""
    k = _MAP_K
    ds = rd.read_parquet(
        _path(sf_dir, "documents"),
        columns=["doc_id", "lang", "n_chars", "source"])

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "lang": b["lang"],
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "n_chars": b["n_chars"].to_numpy(np.int64),
            "rel": np.array([1 if int(s[3:]) % 4 >= 2 else 0
                             for s in b["source"]], np.int64)})
        d = d.sort_values(["lang", "n_chars", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return d.groupby("lang", as_index=False).head(k)

    parts = ds.map_batches(local_top, batch_format="pandas") \
        .limit(1_000_001).to_pandas()
    if len(parts) > 1_000_000:
        raise ValueError("map_eval: top-k partials exceeded the "
                         "driver bound")
    rows = []
    for lang, g in parts.groupby("lang"):
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").head(k)
        rel = g["rel"].to_numpy(np.int64)
        pos = np.arange(1, len(rel) + 1, dtype=np.int64)
        cum = np.cumsum(rel)
        terms = np.where(
            rel == 1,
            np.floor(cum.astype(np.float64) / pos.astype(np.float64)
                     * 1000000.0 + 0.5),
            0.0).astype(np.int64)
        s, r = int(terms.sum()), int(rel.sum())
        ap = np.float64(s) / 1000000.0 / np.float64(r) if r > 0 \
            else np.nan
        rows.append({"lang": lang, "n_relevant": np.int64(r),
                     "ap_sum_micro": np.int64(s),
                     "ap10": np.float64(ap)})
    return pd.DataFrame(rows).sort_values(
        "lang", kind="mergesort").reset_index(drop=True)


@register("mcnemar_test", sql="""
    WITH f AS (SELECT CASE WHEN n_chars >= {ch} THEN 1 ELSE 0 END
                        AS a,
                      CASE WHEN CAST(CASE WHEN trim(text,
                                          E' \\t\\n\\r\\f') = ''
                                THEN 0
                                ELSE len(string_split_regex(
                                    trim(text, E' \\t\\n\\r\\f'),
                                    '[ \\t\\n\\r\\f]+')) END
                                AS BIGINT) >= {tk}
                           THEN 1 ELSE 0 END AS b
               FROM documents),
    c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(a * b) AS BIGINT) AS both_pass,
                 CAST(sum(a * (1 - b)) AS BIGINT) AS a_only,
                 CAST(sum((1 - a) * b) AS BIGINT) AS b_only,
                 CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS neither
          FROM f)
    SELECT n AS n_docs, both_pass, a_only, b_only, neither,
           CASE WHEN a_only + b_only > 0 THEN
                (abs(CAST(a_only AS DOUBLE) - CAST(b_only AS DOUBLE))
                 - 1.0)
                * (abs(CAST(a_only AS DOUBLE)
                       - CAST(b_only AS DOUBLE)) - 1.0)
                / CAST(a_only + b_only AS DOUBLE)
                ELSE NULL END AS mcnemar_chi2
    FROM c""".format(ch=_MC_CHARS, tk=_MC_TOKS))
def mcnemar_test(sf_dir: str):
    """MCNEMAR PAIRED TEST: do the char-length heuristic
    (n_chars >= 300) and the token-count heuristic (tokens >= 55)
    disagree symmetrically on the SAME documents? The 2x2 paired
    census (both / A-only / B-only / neither) is exact integer counts
    in one pass; the continuity-corrected statistic
    (|b - c| - 1)^2 / (b + c) uses only the discordant cells and is
    ONE shared float expression (NULL when no doc discords, matching
    the oracle CASE). The canonical A/B gate comparison when both
    classifiers score the same corpus. Scale plan: map-only 4-cell
    partials, O(blocks) driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["n_chars", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        _, k = tokens_flat(b["text"])
        a = (b["n_chars"].to_numpy(np.int64)
             >= _MC_CHARS).astype(np.int64)
        t = (k >= _MC_TOKS).astype(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "both_pass": np.array([int((a * t).sum())], np.int64),
            "a_only": np.array([int((a * (1 - t)).sum())], np.int64),
            "b_only": np.array([int(((1 - a) * t).sum())], np.int64),
            "neither": np.array([int(((1 - a) * (1 - t)).sum())],
                                np.int64)})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "both_pass", "a_only", "b_only", "neither"])
    n = int(s["n"].iloc[0])
    bp, ao = int(s["both_pass"].iloc[0]), int(s["a_only"].iloc[0])
    bo, ne = int(s["b_only"].iloc[0]), int(s["neither"].iloc[0])
    if ao + bo > 0:
        diff = np.abs(np.float64(ao) - np.float64(bo)) - 1.0
        chi2 = diff * diff / np.float64(ao + bo)
    else:
        chi2 = np.nan
    return pd.DataFrame({
        "n_docs": [np.int64(n)], "both_pass": [np.int64(bp)],
        "a_only": [np.int64(ao)], "b_only": [np.int64(bo)],
        "neither": [np.int64(ne)],
        "mcnemar_chi2": [np.float64(chi2)]})


@register("graph_modularity", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
    lab AS (SELECT x.p_brand AS ba, y.p_brand AS bb
            FROM e0 JOIN part x ON e0.pa = x.p_partkey
                    JOIN part y ON e0.pb = y.p_partkey),
    dg AS (SELECT brand, CAST(sum(e_in) AS BIGINT) AS e_in,
                  CAST(sum(deg) AS BIGINT) AS deg
           FROM (SELECT ba AS brand,
                        CASE WHEN ba = bb THEN 1 ELSE 0 END AS e_in,
                        1 AS deg
                 FROM lab
                 UNION ALL
                 SELECT bb, 0, 1 FROM lab)
           GROUP BY brand),
    q AS (SELECT brand, e_in, deg,
                 CAST(floor((CAST(e_in AS DOUBLE)
                       / CAST((SELECT m FROM mm) AS DOUBLE)
                       - (CAST(deg AS DOUBLE)
                          / CAST(2 * (SELECT m FROM mm) AS DOUBLE))
                         * (CAST(deg AS DOUBLE)
                            / CAST(2 * (SELECT m FROM mm)
                                   AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) AS q_micro
          FROM dg)
    SELECT brand, e_in AS edges_within, deg AS degree_sum, q_micro,
           CAST(sum(q_micro) OVER () AS BIGINT) AS modularity_micro
    FROM q ORDER BY brand""")
def graph_modularity(sf_dir: str):
    """NEWMAN MODULARITY of the co-purchase part graph under the
    brand partition: Q = sum_c [ e_c/m - (d_c/2m)^2 ] — does buying
    cluster within brands more than a degree-preserving random graph
    would? Per-community within-edge counts and degree sums are exact
    integer folds; each community's term quantizes to micro units
    with the shared half-up formula BEFORE the cross-community sum,
    so total modularity is an exact integer immune to float order.
    Scale plan: edges come from the shared support-filtered basket
    machinery (two bounded hash exchanges); brand labels attach via
    the guarded broadcast part dim (sorted-key searchsorted, the q16
    pattern); per-brand (e_in, deg, edge-count) partials are a
    bounded grid combined once on the driver."""
    part = _read_dim(_path(sf_dir, "part"), ["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(np.int64)
    order_ = np.argsort(pk, kind="stable")
    pk = pk[order_]
    brand = part["p_brand"].to_numpy()[order_]

    def label(b: pd.DataFrame) -> pd.DataFrame:
        pa = b["part_a"].to_numpy(np.int64)
        pb = b["part_b"].to_numpy(np.int64)
        ba = brand[np.searchsorted(pk, pa)]
        bb = brand[np.searchsorted(pk, pb)]
        same = (ba == bb).astype(np.int64)
        g = pd.concat([
            pd.DataFrame({"brand": ba, "e_in": same,
                          "deg": np.ones(len(b), np.int64),
                          "ec": np.ones(len(b), np.int64)}),
            pd.DataFrame({"brand": bb,
                          "e_in": np.zeros(len(b), np.int64),
                          "deg": np.ones(len(b), np.int64),
                          "ec": np.zeros(len(b), np.int64)})]) \
            .groupby("brand", as_index=False).sum()
        for c in ("e_in", "deg", "ec"):
            g[c] = g[c].astype(np.int64)
        return g

    s = _combine_partials(
        _basket_edges(sf_dir).map_batches(label,
                                          batch_format="pandas"),
        ["brand"], ["e_in", "deg", "ec"])
    m = int(s["ec"].sum())
    e_in = s["e_in"].to_numpy(np.int64)
    deg = s["deg"].to_numpy(np.int64)
    fm, f2m = np.float64(m), np.float64(2 * m)
    qm = np.floor((e_in.astype(np.float64) / fm
                   - (deg.astype(np.float64) / f2m)
                   * (deg.astype(np.float64) / f2m))
                  * 1000000.0 + 0.5).astype(np.int64)
    out = pd.DataFrame({
        "brand": s["brand"], "edges_within": e_in,
        "degree_sum": deg, "q_micro": qm}).sort_values(
        "brand", kind="mergesort").reset_index(drop=True)
    out["modularity_micro"] = np.int64(int(qm.sum()))
    return out
