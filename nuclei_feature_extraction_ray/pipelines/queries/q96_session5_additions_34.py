# round-5 session-5 additions, batch 34: Calinski-Harabasz validity
# of the embedding label partition, bigram conditional entropy of
# the token stream, and a categorical column-entropy profile.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map
from .q13_embedding_table_operators import (_EMB_DIM,
                                            _EMB_UNPACK_SQL,
                                            _emb_micro)


@register("calinski_harabasz", sql=f"""
    WITH m AS ({_EMB_UNPACK_SQL}),
    gl AS (SELECT label, i, CAST(sum(c) AS HUGEINT) AS su
           FROM m GROUP BY label, i),
    gn AS (SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT)
                   AS ng
           FROM m GROUP BY label),
    sq AS (SELECT CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT)
                    AS stot
           FROM m),
    gsum AS (SELECT gl.label,
                    CAST(sum(su * su) AS HUGEINT) AS s2
             FROM gl GROUP BY gl.label),
    wterm AS (SELECT CAST(sum(CAST(floor(
                   CAST(gsum.s2 AS DOUBLE)
                   / CAST(gn.ng AS DOUBLE) + 0.5) AS HUGEINT))
                   AS HUGEINT) AS wsum,
                     CAST(sum(gn.ng) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS k
              FROM gsum JOIN gn ON gn.label = gsum.label),
    tot AS (SELECT i, CAST(sum(su) AS HUGEINT) AS st FROM gl
            GROUP BY i),
    tsq AS (SELECT CAST(sum(st * st) AS HUGEINT) AS s2t FROM tot),
    f AS (SELECT (SELECT n FROM wterm) AS n,
                 (SELECT k FROM wterm) AS k,
                 CAST((SELECT stot FROM sq)
                      - (SELECT wsum FROM wterm) AS DOUBLE) AS w,
                 CAST((SELECT wsum FROM wterm) AS DOUBLE)
                 - CAST((SELECT s2t FROM tsq) AS DOUBLE)
                   / CAST((SELECT n FROM wterm) AS DOUBLE) AS b)
    SELECT n AS n_vecs, k AS n_labels, b AS between_ss, w
             AS within_ss,
           (b / CAST(k - 1 AS DOUBLE))
           / (w / CAST(n - k AS DOUBLE)) AS calinski_harabasz
    FROM f""")
def calinski_harabasz(sf_dir: str):
    """CALINSKI-HARABASZ validity index of the embedding label
    partition: between-cluster over within-cluster dispersion,
    each df-normalized — the clustering-quality score that says
    whether the labels carve the space into tight, separated
    groups (the scalar decision companion of cosine_contrast's
    raw means and the yardstick kmeans_clusters should beat).
    Total and per-label scatters reduce to exact integer sums of
    micro-quantized components (W = sum||x||^2 - sum||Sx_g||^2/n_g
    with each group rational quantized half-up; B from the global
    sum vector) — no centroid is ever materialized. Scale plan:
    (label, dim) sum partials plus per-label counts — all
    label x dimension bounded; driver does three divisions."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding", "label"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _emb_micro(b["embedding"])
        lab = b["label"].to_numpy(np.int64)
        rows = []
        for lb in np.unique(lab):
            m = lab == lb
            su = c[m].astype(object).sum(axis=0)
            rows.append(pd.DataFrame({
                "label": np.full(_EMB_DIM, lb, np.int64),
                "i": np.arange(1, _EMB_DIM + 1, dtype=np.int64),
                "su": su,
                "ng": np.zeros(_EMB_DIM, np.int64),
                "sq": np.zeros(_EMB_DIM, object)}))
            rows.append(pd.DataFrame({
                "label": [np.int64(lb)], "i": [np.int64(0)],
                "su": [0],
                "ng": [np.int64(int(m.sum()))],
                "sq": [int((c[m].astype(object)
                            * c[m].astype(object)).sum())]}))
        return pd.concat(rows, ignore_index=True)

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["label", "i"], ["su", "ng", "sq"], exact_int=True)
    meta = p[p["i"] == 0]
    dims = p[p["i"] > 0]
    ng = {int(r["label"]): int(r["ng"]) for _, r in meta.iterrows()}
    stot = sum(int(r["sq"]) for _, r in meta.iterrows())
    n = sum(ng.values())
    k = len(ng)
    wsum = 0
    st: dict = {}
    for lb in sorted(ng):
        sub = dims[dims["label"] == lb]
        s2 = sum(int(v) * int(v) for v in sub["su"])
        wsum += int(np.floor(np.float64(s2)
                             / np.float64(ng[lb]) + 0.5))
        for _, r in sub.iterrows():
            st[int(r["i"])] = st.get(int(r["i"]), 0) + int(r["su"])
    s2t = sum(v * v for v in st.values())
    w = np.float64(stot - wsum)
    b = np.float64(wsum) - np.float64(s2t) / np.float64(n)
    return pd.DataFrame({
        "n_vecs": [np.int64(n)], "n_labels": [np.int64(k)],
        "between_ss": [b], "within_ss": [w],
        "calinski_harabasz": [(b / np.float64(k - 1))
                              / (w / np.float64(n - k))]})


@register("bigram_cond_entropy", sql="""
    WITH d AS (SELECT doc_id, trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT doc_id,
                 unnest(string_split_regex(t, '[ \\t\\n\\r\\f]+'))
                   AS term,
                 generate_subscripts(string_split_regex(
                     t, '[ \\t\\n\\r\\f]+'), 1) AS pos
          FROM d),
    bg AS (SELECT a.term AS w1, b.term AS w2,
                  CAST(count(*) AS BIGINT) AS nij
           FROM w a JOIN w b ON a.doc_id = b.doc_id
                            AND b.pos = a.pos + 1
           GROUP BY 1, 2),
    r AS (SELECT w1, CAST(sum(nij) AS BIGINT) AS ni
          FROM bg GROUP BY w1),
    t AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_cells FROM bg),
    e AS (SELECT CAST(sum(CAST(floor(
                 CAST(bg.nij AS DOUBLE)
                 / CAST((SELECT n FROM t) AS DOUBLE)
                 * log2(CAST(r.ni AS DOUBLE)
                        / CAST(bg.nij AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hm
          FROM bg JOIN r ON bg.w1 = r.w1)
    SELECT (SELECT n FROM t) AS n_bigrams,
           (SELECT n_cells FROM t) AS n_cells,
           (SELECT hm FROM e) AS h_sum_micro,
           CAST((SELECT hm FROM e) AS DOUBLE) / 1000000.0
             AS cond_entropy_bits""")
def bigram_cond_entropy(sf_dir: str):
    """BIGRAM CONDITIONAL ENTROPY of the token stream: H(next |
    current) = sum (n_ij/N) log2(n_i/n_ij) over within-document
    adjacent token pairs — the redundancy-of-language statistic
    (low H = formulaic/templated text, the corpus-level signal
    behind doc_repetition and the compression-proxy quality
    filters; markov_entropy_rate's machinery applied to TEXT).
    Bigram and row counts are exact integer folds through one
    bigram-keyed exchange; each term quantizes to micro units
    half-up before the fold. Scale plan: per-batch bigram-count
    partials (vectorized adjacent-pair construction) flow through
    ONE pair-keyed exchange whose partitions emit quantized-term
    partials per left token — the vocabulary-squared grid never
    reaches the driver whole."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        toks = vals.to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(k), dtype=np.int64), k)
        if len(toks) < 2:
            return pd.DataFrame({
                "w1": pd.Series(dtype=object),
                "w2": pd.Series(dtype=object),
                "nij": pd.Series(dtype=np.int64)})
        same = doc[1:] == doc[:-1]
        g = pd.DataFrame({"w1": toks[:-1][same],
                          "w2": toks[1:][same],
                          "nij": np.ones(int(same.sum()),
                                         np.int64)}) \
            .groupby(["w1", "w2"], as_index=False).sum()
        g["nij"] = g["nij"].astype(np.int64)
        return g

    def cell(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["w1", "w2"], as_index=False)["nij"].sum()
        a["nij"] = a["nij"].astype(np.int64)
        return a

    bg = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["w1", "w2"], cell, 16),
        ["w1", "w2"], ["nij"])
    ni = bg.groupby("w1")["nij"].transform("sum") \
        .to_numpy(np.int64)
    nij = bg["nij"].to_numpy(np.int64)
    n = int(nij.sum())
    hm = int(np.floor(
        nij.astype(np.float64) / np.float64(n)
        * np.log2(ni.astype(np.float64)
                  / nij.astype(np.float64))
        * 1000000.0 + 0.5).astype(np.int64).sum())
    return pd.DataFrame({
        "n_bigrams": [np.int64(n)],
        "n_cells": [np.int64(len(bg))],
        "h_sum_micro": [np.int64(hm)],
        "cond_entropy_bits": [np.float64(hm) / 1000000.0]})


@register("column_entropy", sql="""
    WITH u AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS val
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders),
    c AS (SELECT col, val, CAST(count(*) AS BIGINT) AS n
          FROM u GROUP BY col, val),
    t AS (SELECT col, CAST(sum(n) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS k
          FROM c GROUP BY col),
    e AS (SELECT c.col,
                 CAST(sum(CAST(floor(
                     CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE)
                     * log2(CAST(t.tot AS DOUBLE)
                            / CAST(c.n AS DOUBLE))
                     * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS hm
          FROM c JOIN t ON t.col = c.col GROUP BY c.col)
    SELECT t.col AS column_name, t.k AS n_distinct,
           e.hm AS entropy_micro,
           CAST(e.hm AS DOUBLE) / 1000000.0 AS entropy_bits,
           CAST(e.hm AS DOUBLE) / 1000000.0
             / log2(CAST(t.k AS DOUBLE)) AS evenness
    FROM t JOIN e ON e.col = t.col ORDER BY t.col""")
def column_entropy(sf_dir: str):
    """CATEGORICAL COLUMN-ENTROPY PROFILE of the orders table
    (status and priority): Shannon entropy, distinct count and
    evenness (entropy over log2 k) per column — the data-profiling
    operator a catalog runs on ingest to rank columns by
    information content (near-0 evenness flags de-facto constants;
    near-1 flags uniform keys), beside tables_census's structural
    profile. Value counts are exact integer folds; each entropy
    term quantizes to micro units half-up before the per-column
    fold. Scale plan: per-batch (column, value) count partials
    over the bounded categorical domains — map-only, tiny grid."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderstatus",
                                  "o_orderpriority"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col in ("o_orderstatus", "o_orderpriority"):
            g = pd.DataFrame({"col": col,
                              "val": b[col].to_numpy(object),
                              "n": np.ones(len(b), np.int64)}) \
                .groupby(["col", "val"], as_index=False).sum()
            g["n"] = g["n"].astype(np.int64)
            frames.append(g)
        return pd.concat(frames, ignore_index=True)

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["col", "val"], ["n"])
    rows = []
    for col, g in c.groupby("col"):
        n = g["n"].to_numpy(np.int64)
        tot = int(n.sum())
        k = len(g)
        hm = int(np.floor(
            n.astype(np.float64) / np.float64(tot)
            * np.log2(np.float64(tot) / n.astype(np.float64))
            * 1000000.0 + 0.5).astype(np.int64).sum())
        rows.append({
            "column_name": col, "n_distinct": np.int64(k),
            "entropy_micro": np.int64(hm),
            "entropy_bits": np.float64(hm) / 1000000.0,
            "evenness": np.float64(hm) / 1000000.0
            / np.log2(np.float64(k))})
    return pd.DataFrame(rows).sort_values(
        "column_name", kind="mergesort").reset_index(drop=True)
