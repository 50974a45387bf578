# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (JACCARD_NGRAM, JACCARD_TAU, ORACLE, _combine_partials, _path, _read_dim, dedup_mod, np, partition_map, partitioned_apply, pd, rd, register)

_COVERAGE_KS = (1, 5, 10, 25)


@register("ltv_cohorts", sql="""
    WITH f AS (SELECT o_custkey,
                      min(date_trunc('month', o_orderdate)) AS cm
               FROM orders GROUP BY o_custkey)
    SELECT CAST(year(cm) AS BIGINT) AS cohort_y,
           CAST(month(cm) AS BIGINT) AS cohort_m,
           CAST((year(o_orderdate) - year(cm)) * 12
                + (month(o_orderdate) - month(cm)) AS BIGINT)
               AS month_offset,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cp
    FROM orders o JOIN f USING (o_custkey)
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")
def ltv_cohorts(sf_dir: str):
    """Customer-lifetime-value cohort matrix: revenue and order count
    by (first-order month, months-since-first) — the LTV triangle a
    growth model is fit on (retention_cohorts is its user-count
    sibling on events). ONE hash exchange on custkey co-locates each
    customer's orders; the cohort month is a partition-local
    transform('min') and the (cohort, offset) grid partials are
    bounded by months², so only the triangle reaches the driver."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def rows(b: pd.DataFrame) -> pd.DataFrame:
        dt = b["o_orderdate"]
        return pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(np.int64),
            "mo": (dt.dt.year.to_numpy(np.int64) * 12
                   + dt.dt.month.to_numpy(np.int64)),
            "cp": np.round(b["o_totalprice"].to_numpy()
                           * 100).astype(np.int64)})

    def grid(g: pd.DataFrame) -> pd.DataFrame:
        cm = g.groupby("o_custkey")["mo"].transform("min") \
            .to_numpy(np.int64)
        mo = g["mo"].to_numpy(np.int64)
        d = pd.DataFrame({
            "cohort_y": (cm - 1) // 12,
            "cohort_m": (cm - 1) % 12 + 1,
            "month_offset": mo - cm,
            "n": np.ones(len(g), np.int64),
            "cp": g["cp"].to_numpy(np.int64)})
        return d.groupby(["cohort_y", "cohort_m", "month_offset"],
                         as_index=False).agg(n=("n", "sum"),
                                             cp=("cp", "sum"))

    out = _combine_partials(
        partitioned_apply(
            ds.map_batches(rows, batch_format="pandas"),
            "o_custkey", grid, 16),
        ["cohort_y", "cohort_m", "month_offset"], ["n", "cp"]) \
        .rename(columns={"n": "n_orders", "cp": "revenue_cp"})
    out = out.astype({"cohort_y": np.int64, "cohort_m": np.int64,
                      "month_offset": np.int64, "n_orders": np.int64,
                      "revenue_cp": np.int64})
    return out.sort_values(["cohort_y", "cohort_m", "month_offset"],
                           kind="mergesort").reset_index(drop=True)


@register("discount_quantity_corr", sql="""
    WITH d AS (SELECT p_brand,
                      CAST(round(l_discount * 100) AS BIGINT) AS x,
                      CAST(round(l_quantity) AS BIGINT) AS y
               FROM lineitem JOIN part ON l_partkey = p_partkey),
    s AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * y) AS HUGEINT) AS sxy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(y * y) AS HUGEINT) AS syy
          FROM d GROUP BY p_brand)
    SELECT p_brand, CAST(n AS BIGINT) AS n_items,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE))
               AS corr_disc_qty
    FROM s ORDER BY p_brand""")
def discount_quantity_corr(sf_dir: str):
    """Per-brand Pearson correlation between discount depth and
    quantity — the grouped elasticity screen (feature_corr's
    sufficient-statistics reduction, applied per group). The brand
    dimension broadcasts guarded; each batch emits brands-many rows
    of exact integer sums; the per-brand correlations compose from
    python-int exact sums in oracle order."""
    part = _read_dim(_path(sf_dir, "part"), ["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(np.int64)
    po = np.argsort(pk)
    pk = pk[po]
    brand = part["p_brand"].to_numpy()[po]

    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_discount",
                                  "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pos = np.searchsorted(pk, b["l_partkey"].to_numpy(np.int64))
        x = np.round(b["l_discount"].to_numpy()
                     * 100).astype(np.int64)
        y = np.round(b["l_quantity"].to_numpy()).astype(np.int64)
        d = pd.DataFrame({"p_brand": brand[pos],
                          "n": np.ones(len(b), np.int64),
                          "sx": x, "sy": y, "sxy": x * y,
                          "sxx": x * x, "syy": y * y})
        return d.groupby("p_brand", as_index=False).sum()

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["p_brand"], ["n", "sx", "sy", "sxy", "sxx", "syy"])
    rows = []
    for _, r in s.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sxx, syy = int(r["sxy"]), int(r["sxx"]), int(r["syy"])
        rows.append({
            "p_brand": r["p_brand"], "n_items": np.int64(n),
            "corr_disc_qty": np.float64(n * sxy - sx * sy)
            / np.sqrt(np.float64(n * sxx - sx * sx)
                      * np.float64(n * syy - sy * sy))})
    out = pd.DataFrame(rows)
    return out.sort_values("p_brand",
                           kind="mergesort").reset_index(drop=True)


@register("vocab_coverage", sql="""
    WITH toks AS (
      SELECT unnest(string_split_regex(
               trim(text, E' \\t\\n\\r\\f'), '[ \\t\\n\\r\\f]+'))
               AS token
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS freq
      FROM toks GROUP BY token
    ), r AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, token) AS rnk,
             sum(freq) OVER (ORDER BY freq DESC, token
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM c
    ), t AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM c)
    SELECT CAST(rnk AS BIGINT) AS k,
           CAST(cum AS BIGINT) AS covered_tokens,
           total AS total_tokens,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
    FROM r, t WHERE rnk IN (1, 5, 10, 25) ORDER BY rnk""")
def vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve: what fraction of all token
    occurrences the top-k vocabulary covers, at several k — the
    tokenizer-sizing curve (how big must the vocab be before OOV is
    negligible). Scale plan: term-count partials -> ONE token
    exchange -> per-partition COUNT-OF-COUNTS histograms (bounded by
    distinct frequency VALUES, not vocab size) -> tiny combine; the
    driver walks the descending frequency histogram greedily, which
    equals the SQL's rank-window cum at every k because ties share a
    frequency."""
    import re as _re

    from ...functions.text_stats import WS_CLASS
    ws_re = _re.compile(WS_CLASS + "+")
    ds = rd.read_parquet(_path(sf_dir, "documents"), columns=["text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in batch["text"]:
            if not isinstance(t, str):
                continue
            t = t.strip(" \t\n\r\f")
            if t:
                toks.extend(ws_re.split(t))
        if not toks:
            return pd.DataFrame({"token": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        uniq, counts = np.unique(np.asarray(toks, object),
                                 return_counts=True)
        return pd.DataFrame({"token": uniq,
                             "n": counts.astype(np.int64)})

    def freq_hist(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("token", as_index=False).agg(n=("n", "sum"))
        h = f.groupby("n", as_index=False).agg(
            n_terms=("token", "size"))
        return h.astype({"n": np.int64, "n_terms": np.int64})

    hist = _combine_partials(
        partition_map(ds.map_batches(explode, batch_format="pandas"),
                      ["token"], freq_hist, 16),
        ["n"], ["n_terms"]).sort_values("n", ascending=False,
                                        kind="mergesort")
    freqs = hist["n"].to_numpy(np.int64)
    nterms = hist["n_terms"].to_numpy(np.int64)
    total = int((freqs * nterms).sum())
    cum_terms = np.cumsum(nterms)
    cum_tokens = np.cumsum(freqs * nterms)
    rows = []
    for k in _COVERAGE_KS:
        if k > int(cum_terms[-1]):
            continue
        gi = int(np.searchsorted(cum_terms, k))
        prev_terms = int(cum_terms[gi - 1]) if gi else 0
        prev_tokens = int(cum_tokens[gi - 1]) if gi else 0
        covered = prev_tokens + (k - prev_terms) * int(freqs[gi])
        rows.append({"k": np.int64(k),
                     "covered_tokens": np.int64(covered),
                     "total_tokens": np.int64(total),
                     "coverage": np.float64(covered)
                     / np.float64(total)})
    return pd.DataFrame(rows)


@register("dup_cluster_hist", sql="""
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
      FROM reach GROUP BY src
    ), sizes AS (
      SELECT cluster, CAST(count(*) AS BIGINT) AS sz
      FROM cl GROUP BY cluster)
    SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY sz ORDER BY sz""")
def dup_cluster_hist(sf_dir: str):
    """Near-dup cluster-size histogram: how many duplicate clusters
    of each size the corpus contains — the dedup impact report
    (singletons = unique docs; the tail = template families). Reuses
    dedup_clusters' distributed pipeline (exact Jaccard pairs ->
    min-label connected components -> cluster attach), then ONE
    cluster-keyed exchange finishes per-cluster sizes and each
    partition emits a bounded size histogram partial."""
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

    def size_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("cluster", as_index=False).agg(
            sz=("cluster", "size"))
        return g.astype({"cluster": np.int64, "sz": np.int64})

    def size_hist(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("cluster", as_index=False).agg(sz=("sz", "sum"))
        h = s.groupby("sz", as_index=False).agg(
            n_clusters=("cluster", "size"))
        return h.astype({"sz": np.int64, "n_clusters": np.int64})

    out = _combine_partials(
        partition_map(
            labeled.map_batches(size_partial, batch_format="pandas"),
            ["cluster"], size_hist, 8),
        ["sz"], ["n_clusters"]).rename(
            columns={"sz": "cluster_size"})
    out = out.astype({"cluster_size": np.int64,
                      "n_clusters": np.int64})
    return out.sort_values("cluster_size",
                           kind="mergesort").reset_index(drop=True)


ORACLE["dup_cluster_hist"] = ORACLE["dup_cluster_hist"].format(
    jac=ORACLE["jaccard_pairs"])
