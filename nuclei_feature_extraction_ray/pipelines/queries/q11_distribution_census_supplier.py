# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_combine_partials, _path, _read_dim, np, partition_map, pd, rd, register)
from .q07_round_4_additions import (_hist_quantile_cont)

_KANON_K = 5


@register("cust_order_dist", sql="""
    WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
                FROM orders GROUP BY o_custkey),
    j AS (SELECT c_custkey, coalesce(n, 0) AS n_orders
          FROM customer LEFT JOIN oc ON c_custkey = o_custkey)
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM j GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC""")
def cust_order_dist(sf_dir: str):
    """TPC-H-Q13-shaped customer distribution: how many customers
    placed exactly k orders, INCLUDING the zero-order long tail (the
    left-join-then-histogram shape). Scale plan: orders collapse to
    per-batch (custkey, count) partials, customers stream as bare
    keys, ONE co-partitioning exchange joins them (absent customers
    get 0 vectorized via a fill after an outer C merge), and each
    partition emits a bounded (n_orders, count) histogram partial —
    the driver sees only the k-grid."""
    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_custkey"])
    cust = rd.read_parquet(_path(sf_dir, "customer"),
                           columns=["c_custkey"])

    def order_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False).agg(
            n=("o_custkey", "size"))
        return pd.DataFrame({"key": g["o_custkey"].to_numpy(np.int64),
                             "n": g["n"].to_numpy(np.int64),
                             "side": np.ones(len(g), np.int64)})

    def cust_keys(b: pd.DataFrame) -> pd.DataFrame:
        k = b["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame({"key": k, "n": np.zeros(len(k), np.int64),
                             "side": np.zeros(len(k), np.int64)})

    both = orders.map_batches(order_partial,
                              batch_format="pandas").union(
        cust.map_batches(cust_keys, batch_format="pandas"))

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        counts = g[g["side"] == 1].groupby("key")["n"].sum()
        ck = g.loc[g["side"] == 0, "key"]
        per_cust = ck.map(counts).fillna(0).astype(np.int64)
        h = per_cust.value_counts()
        return pd.DataFrame({"n_orders": h.index.to_numpy(np.int64),
                             "n": h.to_numpy(np.int64)})

    out = _combine_partials(
        partition_map(both, ["key"], hist, 16),
        ["n_orders"], ["n"]).rename(columns={"n": "n_customers"})
    out = out.astype({"n_orders": np.int64, "n_customers": np.int64})
    return out.sort_values(["n_customers", "n_orders"],
                           ascending=[False, False],
                           kind="mergesort").reset_index(drop=True)


@register("part_supplier_census", sql="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size""")
def part_supplier_census(sf_dir: str):
    """TPC-H-Q16-shaped supplier census: distinct suppliers observed
    per (brand, size) bucket, derived from the fact table's
    (part, supplier) co-occurrences. Scale plan: per-batch DISTINCT
    (partkey, suppkey) pairs map to (brand, size, suppkey) via the
    guarded part-dimension broadcast, ONE hash exchange on the full
    triple both finishes the global distinct AND pre-counts per
    (brand, size) inside each partition — the COUNT DISTINCT never
    needs a second shuffle because every copy of a triple lands in
    the same partition."""
    part = _read_dim(_path(sf_dir, "part"),
                     ["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy(np.int64)
    order_ = np.argsort(pk, kind="stable")
    pk = pk[order_]
    brand = part["p_brand"].to_numpy()[order_]
    size = part["p_size"].to_numpy(np.int64)[order_]

    li = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_suppkey"])

    def triple(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "pkey": b["l_partkey"].to_numpy(np.int64),
            "skey": b["l_suppkey"].to_numpy(np.int64),
        }).drop_duplicates(ignore_index=True)
        pos = np.searchsorted(pk, d["pkey"].to_numpy(np.int64))
        return pd.DataFrame({"p_brand": brand[pos],
                             "p_size": size[pos],
                             "skey": d["skey"].to_numpy(np.int64)})

    def census(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["p_brand", "p_size", "skey"])
        c = d.groupby(["p_brand", "p_size"], as_index=False).agg(
            n=("skey", "size"))
        c["p_size"] = c["p_size"].astype(np.int64)
        c["n"] = c["n"].astype(np.int64)
        return c

    out = _combine_partials(
        partition_map(li.map_batches(triple, batch_format="pandas"),
                      ["p_brand", "p_size", "skey"], census, 16),
        ["p_brand", "p_size"], ["n"]).rename(
            columns={"n": "supplier_cnt"})
    out = out.astype({"p_size": np.int64, "supplier_cnt": np.int64})
    return out.sort_values(["supplier_cnt", "p_brand", "p_size"],
                           ascending=[False, True, True],
                           kind="mergesort").reset_index(drop=True)


@register("robust_scale", sql="""
    WITH q AS (SELECT lang,
                      quantile_cont(n_chars, 0.25) AS q25,
                      quantile_cont(n_chars, 0.50) AS med,
                      quantile_cont(n_chars, 0.75) AS q75
               FROM documents GROUP BY lang)
    SELECT doc_id, d.lang, CAST(n_chars AS BIGINT) AS n_chars,
           CASE WHEN q75 = q25 THEN 0.0
                ELSE (CAST(n_chars AS DOUBLE) - med) / (q75 - q25)
           END AS scaled
    FROM documents d JOIN q USING (lang) ORDER BY doc_id""")
def robust_scale(sf_dir: str):
    """Per-group robust (median/IQR) feature scaling — the outlier-
    resistant sibling of min-max rescaling: each document's length
    centered on its language's median and divided by the
    interquartile range. Scale plan: ONE histogram pass ((lang,
    length) -> count partials, value-domain-bounded) yields exact
    q25/med/q75 via the shared quantile_cont formula
    (_hist_quantile_cont, bit-identical to DuckDB); the bounds
    broadcast as dicts and the rescale is one vectorized pass."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "n_chars"], as_index=False).agg(
            n=("n_chars", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        ds.map_batches(hist_partial, batch_format="pandas"),
        ["lang", "n_chars"], ["n"])
    q25, med, q75 = {}, {}, {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_chars", kind="mergesort")
        vals = g["n_chars"].to_numpy(np.int64)
        cts = g["n"].to_numpy(np.int64)
        q25[lang] = _hist_quantile_cont(vals, cts, 0.25)
        med[lang] = _hist_quantile_cont(vals, cts, 0.50)
        q75[lang] = _hist_quantile_cont(vals, cts, 0.75)

    def scale(b: pd.DataFrame) -> pd.DataFrame:
        lo = b["lang"].map(q25).to_numpy(np.float64)
        mid = b["lang"].map(med).to_numpy(np.float64)
        hi = b["lang"].map(q75).to_numpy(np.float64)
        x = b["n_chars"].to_numpy(np.int64)
        iqr = hi - lo
        scaled = np.where(iqr == 0.0, 0.0,
                          (x.astype(np.float64) - mid)
                          / np.where(iqr == 0.0, 1.0, iqr))
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "lang": b["lang"].astype(object),
            "n_chars": x, "scaled": scaled})

    out = ds.map_batches(scale, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id",
                           kind="mergesort").reset_index(drop=True)


@register("k_anonymize", sql="""
    WITH g AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY lang, source)
    SELECT doc_id,
           CASE WHEN n >= 5 THEN d.lang ELSE '*' END AS lang_k,
           CASE WHEN n >= 5 THEN d.source ELSE '*' END AS source_k,
           CAST(n >= 5 AS BOOLEAN) AS released
    FROM documents d JOIN g USING (lang, source)
    ORDER BY doc_id""")
def k_anonymize(sf_dir: str):
    """K-anonymity suppression over quasi-identifier columns: a
    document's (lang, source) pair is released only when at least K
    documents share it; smaller groups are masked to '*' — the
    group-size privacy rule applied before publishing corpus
    metadata. Scale plan: the quasi-identifier grid is bounded
    (langs x sources), so per-batch count partials collapse to one
    tiny combine, the released-set broadcasts as a dict, and masking
    is one vectorized map pass. The identity of WHICH rows get
    suppressed is exact, not sampled."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "source"], as_index=False).agg(
            n=("lang", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "source"], ["n"])
    ok = set(map(tuple, grid.loc[grid["n"] >= _KANON_K,
                                 ["lang", "source"]].to_numpy()))

    def mask(b: pd.DataFrame) -> pd.DataFrame:
        keys = list(zip(b["lang"], b["source"]))
        released = np.fromiter((k in ok for k in keys), bool,
                               count=len(keys))
        lang = np.where(released, b["lang"].to_numpy(object), "*")
        src = np.where(released, b["source"].to_numpy(object), "*")
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "lang_k": pd.Series(lang, dtype=object),
            "source_k": pd.Series(src, dtype=object),
            "released": released})

    out = ds.map_batches(mask, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id",
                           kind="mergesort").reset_index(drop=True)


@register("source_diversity", sql="""
    WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY source, lang),
    a AS (SELECT source,
                 CAST(sum(n) AS BIGINT) AS n_docs,
                 CAST(count(*) AS BIGINT) AS n_langs,
                 CAST(sum(CAST(floor(CAST(1e6 AS DOUBLE) * n
                                     * ln(CAST(n AS DOUBLE)) + 0.5)
                               AS BIGINT)) AS BIGINT) AS s_unat
          FROM c GROUP BY source)
    SELECT source, n_docs, n_langs,
           ln(CAST(n_docs AS DOUBLE))
             - (CAST(s_unat AS DOUBLE) / CAST(1e6 AS DOUBLE))
               / CAST(n_docs AS DOUBLE) AS lang_entropy
    FROM a ORDER BY source""")
def source_diversity(sf_dir: str):
    """Language-diversity index per source: Shannon entropy of each
    source's language mix — the balance metric a corpus-mixing plan
    monitors (0 = monolingual source, ln(k) = uniform over k). The
    (source, lang) grid is bounded, so one tiny combine holds all
    counts; entropy folds integer MICRO-NATS (floor(1e6·n·ln n +
    0.5) per cell, summed as int64) so the result is independent of
    both engines' float summation order — the doc_entropy policy
    applied at corpus grain."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["source", "lang"], as_index=False).agg(
            n=("lang", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "lang"], ["n"])
    rows = []
    for src, g in grid.groupby("source", sort=True):
        n = g["n"].to_numpy(np.int64)
        tot = int(n.sum())
        unat = int(np.floor(
            1e6 * n.astype(np.float64)
            * np.log(n.astype(np.float64)) + 0.5).astype(np.int64)
            .sum())
        rows.append({
            "source": src, "n_docs": np.int64(tot),
            "n_langs": np.int64(len(n)),
            "lang_entropy": np.log(np.float64(tot))
            - (np.float64(unat) / np.float64(1e6))
            / np.float64(tot)})
    return pd.DataFrame(rows)


@register("feature_corr", sql="""
    WITH f AS (
      SELECT CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                 AS x_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                 AS BIGINT) AS x_syll,
             CAST(n_chars AS BIGINT) AS x_chars
      FROM documents),
    s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x_chars) AS HUGEINT) AS sc,
                 CAST(sum(x_words) AS HUGEINT) AS sw,
                 CAST(sum(x_syll) AS HUGEINT) AS sy,
                 CAST(sum(x_chars * x_chars) AS HUGEINT) AS scc,
                 CAST(sum(x_words * x_words) AS HUGEINT) AS sww,
                 CAST(sum(x_syll * x_syll) AS HUGEINT) AS syy,
                 CAST(sum(x_chars * x_words) AS HUGEINT) AS scw,
                 CAST(sum(x_chars * x_syll) AS HUGEINT) AS scy,
                 CAST(sum(x_words * x_syll) AS HUGEINT) AS swy
          FROM f)
    SELECT 'chars_words' AS pair,
           CAST(n * scw - sc * sw AS DOUBLE)
             / sqrt(CAST(n * scc - sc * sc AS DOUBLE)
                    * CAST(n * sww - sw * sw AS DOUBLE)) AS r
    FROM s
    UNION ALL
    SELECT 'chars_syllables' AS pair,
           CAST(n * scy - sc * sy AS DOUBLE)
             / sqrt(CAST(n * scc - sc * sc AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS r
    FROM s
    UNION ALL
    SELECT 'words_syllables' AS pair,
           CAST(n * swy - sw * sy AS DOUBLE)
             / sqrt(CAST(n * sww - sw * sw AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS r
    FROM s
    ORDER BY pair""")
def feature_corr(sf_dir: str):
    """Pairwise Pearson correlation matrix over derived text features
    (chars, words, vowel-group syllables) — the redundancy screen a
    feature-engineering pass runs before training. Scale plan: the
    textbook sufficient-statistics reduction — each batch emits ONE
    row of exact integer sums (x, x², xy for all pairs; int64 within
    a batch, arbitrary-precision Python ints in the driver fold, so
    no overflow and NO float fold-order sensitivity), and the three
    correlations are composed from the exact sums in the identical
    expression both engines use."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text", "n_chars"])

    def sums(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].astype(str)
        w = t.str.count(r"\S+").to_numpy(np.int64)
        y = t.str.lower().str.count(r"[aeiouy]+").to_numpy(np.int64)
        c = b["n_chars"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": np.zeros(1, np.int64), "n": [np.int64(len(b))],
            "sc": [c.sum()], "sw": [w.sum()], "sy": [y.sum()],
            "scc": [(c * c).sum()], "sww": [(w * w).sum()],
            "syy": [(y * y).sum()], "scw": [(c * w).sum()],
            "scy": [(c * y).sum()], "swy": [(w * y).sum()]})

    p = _combine_partials(
        ds.map_batches(sums, batch_format="pandas"), ["k"],
        ["n", "sc", "sw", "sy", "scc", "sww", "syy",
         "scw", "scy", "swy"], exact_int=True)
    v = {c: int(p[c].iloc[0]) for c in p.columns if c != "k"}

    def corr(sxy, sx, sy_, sxx, syy_):
        n = v["n"]
        num = np.float64(n * v[sxy] - v[sx] * v[sy_])
        den = np.sqrt(np.float64(n * v[sxx] - v[sx] * v[sx])
                      * np.float64(n * v[syy_] - v[sy_] * v[sy_]))
        return num / den

    return pd.DataFrame({
        "pair": ["chars_syllables", "chars_words", "words_syllables"],
        "r": [corr("scy", "sc", "sy", "scc", "syy"),
              corr("scw", "sc", "sw", "scc", "sww"),
              corr("swy", "sw", "sy", "sww", "syy")]})
