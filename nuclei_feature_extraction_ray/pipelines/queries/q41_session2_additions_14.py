# round-5 session-2 additions, batch 14: temperature-scaled source
# mixing weights (the multilingual data-mixing operator), a
# multi-constraint referential-integrity audit, and positional
# phrase search over an inverted index.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (ORACLE, _combine_partials, _path, np, pa,
                      partition_map, pc, pd, ray, rd, register)

_MIX_ALPHA = 0.3           # temperature exponent (mC4 / XLM-R style)
_PHRASE = ("table", "hash")  # the searched 2-token phrase

_FK_SPECS = [
    # (name, child table, child col, parent table, parent col)
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
]


@register("source_temperature_mix", sql="""
    WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY source),
    t AS (SELECT source, n_docs,
                 pow(CAST(n_docs AS DOUBLE), {a}) AS w
          FROM c)
    SELECT source, n_docs,
           w / (SELECT sum(w) FROM t) AS mix_weight,
           w / (SELECT sum(w) FROM t)
             * (SELECT CAST(sum(n_docs) AS DOUBLE) FROM c)
             / CAST(n_docs AS DOUBLE) AS oversample_factor
    FROM t ORDER BY source""".format(a=_MIX_ALPHA))
def source_temperature_mix(sf_dir: str):
    """Temperature-scaled mixture weights per corpus source:
    p_s ∝ n_s^α (α = 0.3, the mC4 / XLM-R low-resource up-sampling
    rule) plus the implied oversample factor p_s·N/n_s — the
    data-mixing table a multilingual/multi-source training run is
    configured from. Per-batch integer count partials collapse to one
    row per source before the driver fold; the pow/normalize algebra
    runs on the handful of source rows in the identical double
    expressions the oracle evaluates (round-6 comparison absorbs the
    sub-ulp sum-order difference across ~5 terms). Map-only at any
    scale: the only thing ever moved is sources × blocks tiny
    partials."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("source", as_index=False).size() \
            .rename(columns={"size": "n_docs"})
        g["n_docs"] = g["n_docs"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["n_docs"])
    c = c.sort_values("source", kind="mergesort") \
        .reset_index(drop=True)
    n = c["n_docs"].to_numpy(np.int64)
    w = np.power(n.astype(np.float64), _MIX_ALPHA)
    mix = w / w.sum()
    return pd.DataFrame({
        "source": c["source"].to_numpy(object),
        "n_docs": n,
        "mix_weight": mix,
        "oversample_factor": mix * np.float64(n.sum()) / n})


def _fk_sql() -> str:
    parts = []
    for name, ct, cc, pt, pk in _FK_SPECS:
        parts.append(f"""
    SELECT '{name}' AS fk, CAST(count(*) AS BIGINT) AS n_child,
           CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM {ct} c LEFT JOIN
         (SELECT DISTINCT {pk} AS k FROM {pt}) p ON c.{cc} = p.k""")
    return " UNION ALL ".join(parts) + " ORDER BY fk"


@register("fk_audit", sql=_fk_sql())
def fk_audit(sf_dir: str):
    """Referential-integrity audit across every foreign-key edge of
    the star schema: per constraint, the child row count and the
    orphan count (child keys with no parent) — the data-quality sweep
    a warehouse runs after every load. Per constraint the engine
    pre-aggregates child keys to (key, n) partials inside map_batches
    (so the wire carries distinct keys, not rows), tags parent
    distinct keys into the same narrow frame, and finishes with ONE
    hash exchange per constraint: inside each key partition a C isin
    against the partition's parent keys yields orphan partials, and
    the driver folds constraints × partitions tiny rows. No broadcast
    of any parent (orders/customer are fact-sized at 100 TB), no
    driver-side key sets."""
    rows = []
    for name, ct, cc, pt, pk in _FK_SPECS:
        child = rd.read_parquet(_path(sf_dir, ct), columns=[cc])
        parent = rd.read_parquet(_path(sf_dir, pt), columns=[pk])

        def cpart(b: pd.DataFrame, cc=cc) -> pd.DataFrame:
            g = b.groupby(cc, as_index=False).size()
            return pd.DataFrame({
                "k": g[cc].to_numpy(np.int64),
                "n": g["size"].to_numpy(np.int64),
                "is_parent": np.zeros(len(g), np.int64)})

        def ppart(b: pd.DataFrame, pk=pk) -> pd.DataFrame:
            k = np.unique(b[pk].to_numpy(np.int64))
            return pd.DataFrame({
                "k": k, "n": np.zeros(len(k), np.int64),
                "is_parent": np.ones(len(k), np.int64)})

        tagged = child.map_batches(cpart, batch_format="pandas") \
            .union(parent.map_batches(ppart, batch_format="pandas"))

        def audit(g: pd.DataFrame) -> pd.DataFrame:
            ch = g[g["is_parent"] == 0]
            pk_set = g.loc[g["is_parent"] == 1, "k"].to_numpy()
            orphan = ~ch["k"].isin(pk_set)
            return pd.DataFrame({
                "n_child": [np.int64(ch["n"].sum())],
                "n_orphans": [np.int64(ch.loc[orphan, "n"].sum())]})

        p = partition_map(tagged, ["k"], audit, 16).to_pandas()
        rows.append((name, int(p["n_child"].sum()),
                     int(p["n_orphans"].sum())))
    rows.sort()
    return pd.DataFrame({
        "fk": [r[0] for r in rows],
        "n_child": np.array([r[1] for r in rows], np.int64),
        "n_orphans": np.array([r[2] for r in rows], np.int64)})


@register("phrase_search", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    p AS (SELECT doc_id, unnest(w) AS term,
                 unnest(generate_series(1, len(w))) AS pos
          FROM docs),
    bi AS (SELECT a.doc_id
           FROM p a JOIN p b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
           WHERE a.term = '{t1}' AND b.term = '{t2}')
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM bi GROUP BY doc_id ORDER BY doc_id""".format(
    t1=_PHRASE[0], t2=_PHRASE[1]))
def phrase_search(sf_dir: str):
    """Positional phrase search: documents containing the exact
    2-token phrase '{t1} {t2}' with the occurrence count — the
    positional-posting-list intersection behind quoted-phrase
    retrieval (term_postings builds the index; this is the query-time
    operator). The engine never touches positions row-by-row: one
    Arrow whitespace tokenization flattens the batch
    (functions.hashing.tokens_flat), two vectorized equality masks
    shifted by one plus a same-document mask find every adjacent
    match, and a bincount per document finishes the count — map-only,
    zero exchange, and the phrase mask generalizes to k tokens by
    ANDing k shifted masks."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    t1, t2 = _PHRASE

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        if len(vals) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "n_occurrences": pd.Series(dtype=np.int64)})
        doc = np.repeat(np.arange(len(k), dtype=np.int64), k)
        a = pc.equal(vals, t1).to_numpy(zero_copy_only=False)
        c = pc.equal(vals, t2).to_numpy(zero_copy_only=False)
        hit = a[:-1] & c[1:] & (doc[:-1] == doc[1:])
        ids = b["doc_id"].to_numpy(np.int64)
        cnt = np.bincount(doc[:-1][hit], minlength=len(k))
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            "doc_id": ids[nz],
            "n_occurrences": cnt[nz].astype(np.int64)})

    out = ds.map_batches(fn, batch_format="pandas")
    return out.sort("doc_id")


phrase_search.__doc__ = phrase_search.__doc__.format(
    t1=_PHRASE[0], t2=_PHRASE[1])
