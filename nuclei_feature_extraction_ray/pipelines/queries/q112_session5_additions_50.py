# round-5 session-5 additions, batch 50: 2x2 factorial effect
# estimation, the cross-source exact-duplicate census, and
# document-initial token bias.
from __future__ import annotations

from ...functions.hashing import md5_upper64_flat, tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_ITB_MIN = 20
_ITB_TOP = 15


@register("factorial_effects", sql="""
    WITH r AS (SELECT CAST(CASE WHEN l_discount > 0 THEN 1 ELSE 0
                           END AS BIGINT) AS fa,
                      CAST(CASE WHEN l_returnflag = 'R'
                           THEN 1 ELSE 0 END AS BIGINT) AS fb,
                      CAST(l_quantity AS BIGINT) AS y
               FROM lineitem),
    c AS (SELECT fa, fb, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS s
          FROM r GROUP BY fa, fb),
    m AS (SELECT
        (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) FROM c
         WHERE fa = 0 AND fb = 0) AS m00,
        (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) FROM c
         WHERE fa = 1 AND fb = 0) AS m10,
        (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) FROM c
         WHERE fa = 0 AND fb = 1) AS m01,
        (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) FROM c
         WHERE fa = 1 AND fb = 1) AS m11)
    SELECT (SELECT CAST(sum(n) AS BIGINT) FROM c) AS n_rows,
           ((m10 - m00) + (m11 - m01)) / 2.0 AS effect_discount,
           ((m01 - m00) + (m11 - m10)) / 2.0 AS effect_returned,
           ((m11 - m01) - (m10 - m00)) / 2.0 AS interaction
    FROM m""")
def factorial_effects(sf_dir: str):
    """2x2 FACTORIAL EFFECT ESTIMATION on line quantity with the
    discounted and returned flags as factors: main effects as the
    average of simple contrasts and the interaction as half their
    difference — the design-of-experiments reading that separates
    'discount moves quantity' from 'discount moves quantity ONLY
    on returned lines' (the factorial sibling of twoway_anova's
    variance split and diff_in_diff's 2x2). Cell sums and counts
    are exact integer folds; the four cell means and three
    contrasts are shared float expressions. Scale plan: 4-cell
    moment partials, map-only, O(blocks) driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_discount", "l_returnflag",
                                  "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        fa = (b["l_discount"].to_numpy(np.float64)
              > 0).astype(np.int64)
        fb = (b["l_returnflag"].to_numpy(object)
              == "R").astype(np.int64)
        g = pd.DataFrame({"fa": fa, "fb": fb,
                          "n": np.ones(len(b), np.int64),
                          "s": b["l_quantity"]
                          .to_numpy(np.int64)}) \
            .groupby(["fa", "fb"], as_index=False).sum()
        for c in ("n", "s"):
            g[c] = g[c].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["fa", "fb"], ["n", "s"], exact_int=True)
    mean = {}
    for _, r in c.iterrows():
        mean[(int(r["fa"]), int(r["fb"]))] = \
            np.float64(int(r["s"])) / np.float64(int(r["n"]))
    n_rows = sum(int(v) for v in c["n"])
    m00, m10 = mean[(0, 0)], mean[(1, 0)]
    m01, m11 = mean[(0, 1)], mean[(1, 1)]
    return pd.DataFrame({
        "n_rows": [np.int64(n_rows)],
        "effect_discount": [((m10 - m00) + (m11 - m01)) / 2.0],
        "effect_returned": [((m01 - m00) + (m11 - m10)) / 2.0],
        "interaction": [((m11 - m01) - (m10 - m00)) / 2.0]})


@register("dup_cross_source", sql="""
    WITH h AS (SELECT md5(text) AS hv, source FROM documents),
    g AS (SELECT hv, CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT source) AS BIGINT) AS ns
          FROM h GROUP BY hv),
    d AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS dup_groups,
                 CAST(sum(CASE WHEN n > 1 AND ns > 1
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS cross_source_groups,
                 CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END)
                      AS BIGINT) AS dup_docs
          FROM g)
    SELECT n_groups, dup_groups, cross_source_groups, dup_docs,
           CASE WHEN dup_groups > 0 THEN
                CAST(cross_source_groups AS DOUBLE)
                / CAST(dup_groups AS DOUBLE)
           ELSE NULL END AS cross_source_rate
    FROM d""")
def dup_cross_source(sf_dir: str):
    """CROSS-SOURCE EXACT-DUPLICATE CENSUS: among md5-identical
    text groups with more than one copy, the fraction spanning
    MULTIPLE sources — duplicates inside one source are re-crawls,
    duplicates ACROSS sources are syndication/mirroring that
    per-source dedup would miss entirely (the provenance question
    dedup_exact's flat census cannot answer, and the reason
    corpus-level dedup must precede source-level quotas like
    waterfill_alloc). Group sizes and distinct-source counts fold
    inside ONE text-hash exchange; all censuses are exact integers
    (NULL rate when no duplicates, matching the oracle). Scale
    plan: the dedup_exact plan — 16-byte hash keys on the wire,
    per-partition group censuses, 4 scalars out."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hv = md5_upper64_flat(b["text"])
        return pd.DataFrame({
            "hv": hv.astype(np.uint64),
            "source": b["source"].to_numpy(object)})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("hv").agg(n=("source", "size"),
                                ns=("source", "nunique"))
        n = a["n"].to_numpy(np.int64)
        ns = a["ns"].to_numpy(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n_groups": np.array([len(a)], np.int64),
            "dup_groups": np.array([int((n > 1).sum())],
                                   np.int64),
            "cross": np.array([int(((n > 1)
                                    & (ns > 1)).sum())],
                              np.int64),
            "dup_docs": np.array([int(n[n > 1].sum())],
                                 np.int64)})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["hv"], cells, 16),
        ["j"], ["n_groups", "dup_groups", "cross", "dup_docs"])
    ng = int(s["n_groups"].iloc[0])
    dg = int(s["dup_groups"].iloc[0])
    cs = int(s["cross"].iloc[0])
    dd = int(s["dup_docs"].iloc[0])
    rate = np.float64(cs) / np.float64(dg) if dg > 0 else np.nan
    return pd.DataFrame({
        "n_groups": [np.int64(ng)],
        "dup_groups": [np.int64(dg)],
        "cross_source_groups": [np.int64(cs)],
        "dup_docs": [np.int64(dd)],
        "cross_source_rate": [rate]})


@register("initial_token_bias", sql="""
    WITH d AS (SELECT trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    toks AS (SELECT string_split_regex(t, '[ \\t\\n\\r\\f]+')
                      AS arr
             FROM d),
    first AS (SELECT arr[1] AS term,
                     CAST(count(*) AS BIGINT) AS nf
              FROM toks GROUP BY 1),
    alltk AS (SELECT unnest(arr) AS term FROM toks),
    tot AS (SELECT term, CAST(count(*) AS BIGINT) AS nt
            FROM alltk GROUP BY term),
    t AS (SELECT CAST(sum(nf) AS BIGINT) AS sf FROM first),
    a AS (SELECT CAST(count(*) AS BIGINT) AS sa FROM alltk),
    j AS (SELECT f.term, f.nf, tot.nt,
                 CAST(floor(CAST(f.nf AS DOUBLE)
                      / CAST((SELECT sf FROM t) AS DOUBLE)
                      / (CAST(tot.nt AS DOUBLE)
                         / CAST((SELECT sa FROM a) AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT)
                   AS lift_micro
          FROM first f JOIN tot ON tot.term = f.term
          WHERE f.nf >= {m})
    SELECT term, nf AS n_first, nt AS n_total, lift_micro,
           CAST(lift_micro AS DOUBLE) / 1000000.0 AS lift
    FROM j ORDER BY lift_micro DESC, term LIMIT {k}""".format(
    m=_ITB_MIN, k=_ITB_TOP))
def initial_token_bias(sf_dir: str):
    """DOCUMENT-INITIAL TOKEN BIAS: the tokens most over-
    represented at position 1 relative to their corpus-wide rate
    (lift = P(term|first)/P(term), minimum {m} first-position
    occurrences) — the positional-bias census behind LM prompt
    sensitivity and boilerplate openings (a template's first word
    lights up here long before template_overlap can see the whole
    line). Both frequencies come from exact integer censuses; the
    lift quantizes to micro units half-up, so the top-{k} ranking
    (lift DESC, term) is an exact integer sort. Scale plan: the
    first-token census is doc-bounded and the total census rides
    the term-keyed exchange; the join is first-token-vocabulary
    sized."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        toks = vals.to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.cumsum(k)[:-1]])
        first = toks[starts[k > 0]]
        un_f = pd.Series(first, dtype=object).value_counts()
        un_t = pd.Series(toks, dtype=object).value_counts()
        f = pd.DataFrame({"term": un_f.index.to_numpy(object),
                          "nf": un_f.to_numpy(np.int64),
                          "nt": np.zeros(len(un_f), np.int64)})
        t = pd.DataFrame({"term": un_t.index.to_numpy(object),
                          "nf": np.zeros(len(un_t), np.int64),
                          "nt": un_t.to_numpy(np.int64)})
        return pd.concat([f, t], ignore_index=True)

    def cell(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("term", as_index=False)[["nf", "nt"]].sum()
        for c in ("nf", "nt"):
            a[c] = a[c].astype(np.int64)
        return a

    cells = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["term"], cell, 16),
        ["term"], ["nf", "nt"])
    sf = int(cells["nf"].sum())
    sa = int(cells["nt"].sum())
    sub = cells[cells["nf"] >= _ITB_MIN].copy()
    lift = [int(np.floor(
        np.float64(int(r["nf"])) / np.float64(sf)
        / (np.float64(int(r["nt"])) / np.float64(sa))
        * 1000000.0 + 0.5)) for _, r in sub.iterrows()]
    sub["lift_micro"] = pd.Series(lift, index=sub.index,
                                  dtype=np.int64)
    out = sub.sort_values(["lift_micro", "term"],
                          ascending=[False, True],
                          kind="mergesort").head(_ITB_TOP) \
        .reset_index(drop=True)
    return pd.DataFrame({
        "term": out["term"],
        "n_first": out["nf"].astype(np.int64),
        "n_total": out["nt"].astype(np.int64),
        "lift_micro": out["lift_micro"],
        "lift": out["lift_micro"].astype(np.float64)
        / 1000000.0})
