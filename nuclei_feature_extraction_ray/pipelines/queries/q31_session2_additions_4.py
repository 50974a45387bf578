# round-5 session-2 additions, batch 4: per-doc n-gram novelty (the
# first-seen curation signal), Cohen's kappa of the lang-ID heuristic
# against truth, reciprocal top-1 inner-product neighbors over the
# embedding table (mutual-NN alignment), and SymSpell delete-variant
# blocking for edit-distance-1 record linkage.
from __future__ import annotations

from ._shared import (ORACLE, QUERIES, _combine_partials, _path, np,
                      pa, partition_map, pc, pd, ray, rd, register)
from ...functions.hashing import gram_strings_flat, md5_upper64_flat
from ...functions.texture import _sql_r6
from ...stages.dedup import _empty, segment_all_pairs

#: gram_novelty: word n-gram order (same 3-gram family as the
#: decontamination ops)
_NOVEL_N = 3

#: mutual_nn: fixed-point grid for the exact integer dot product —
#: |x| <= ~0.53 here, so codes stay under ~1024 and a 64-dim dot
#: fits int32 range with room (exactness is what matters: both
#: engines floor to the SAME grid and compare exact integers)
_MNN_GRID = 1000.0

#: mutual_nn / embedding table dimensionality (embeddings.parquet)
_MNN_DIM = 64

#: mutual_nn: broadcast guard — the quantized matrix is shipped once
#: via ray.put; above this the IVF/LSH tiers (stages/ann.py) are the
#: scale path for candidate generation
_MNN_MAX_ROWS = 1_000_000


@register("gram_novelty", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    g AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(w) < 3
               THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
               END)) AS gram
      FROM docs),
    f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0
                    END) AS BIGINT) AS n_novel,
           sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
             * 1.0 / count(*) AS novelty
    FROM g JOIN f USING (gram)
    GROUP BY g.doc_id""")
def gram_novelty(sf_dir: str):
    """Per-document n-gram NOVELTY: the fraction of each doc's
    distinct 3-grams whose FIRST occurrence (min doc_id) is this doc
    — the curation signal behind novelty-ordered training curricula
    and incremental-crawl value estimates (a doc whose grams were all
    seen before adds nothing). Plan: vectorized flat gram strings ->
    one portable-md5 kernel (the md5-64 gram key is the same
    collision contract as the md5 oracle twins); gram hash exchange
    computes min-doc per gram and folds (doc, novel) partials in
    place; a doc hash exchange finishes the per-doc counts. The
    novelty ratio is int/int -> bit-identical, no rounding."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        grams, didx, _ = gram_strings_flat(b["text"], _NOVEL_N)
        h = md5_upper64_flat(grams).astype(np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[didx]
        order = np.lexsort((h, ids))
        ids, h = ids[order], h[order]
        keep = np.ones(len(h), bool)
        keep[1:] = (ids[1:] != ids[:-1]) | (h[1:] != h[:-1])
        return pa.table({"gram": pa.array(h[keep]),
                         "doc": pa.array(ids[keep])})

    post = ds.map_batches(explode, batch_format="pyarrow")

    def novel_part(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("gram")["doc"].transform("min")
        out = pd.DataFrame({
            "doc": g["doc"].to_numpy(np.int64),
            "n": np.ones(len(g), np.int64),
            "novel": (g["doc"].to_numpy(np.int64)
                      == first.to_numpy(np.int64)).astype(np.int64)}) \
            .groupby("doc", as_index=False).sum()
        for c in ("n", "novel"):
            out[c] = out[c].astype(np.int64)
        return out

    mid = partition_map(post, ["gram"], novel_part, 16)

    def doc_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc", as_index=False).agg(
            n_grams=("n", "sum"), n_novel=("novel", "sum"))
        n_grams = agg["n_grams"].to_numpy(np.int64)
        n_novel = agg["n_novel"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": agg["doc"].to_numpy(np.int64),
            "n_grams": n_grams, "n_novel": n_novel,
            "novelty": n_novel / n_grams})

    return partition_map(mid, ["doc"], doc_part, 16)


def _lang_kappa_sql() -> str:
    from ...functions.langid import langid_sql
    return """
    WITH pred AS ({langid}),
    j AS (SELECT d.lang AS actual, p.pred_lang AS pred
          FROM documents d JOIN pred p USING (doc_id)),
    c AS (SELECT actual, pred, CAST(count(*) AS BIGINT) AS n
          FROM j GROUP BY 1, 2),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                 CAST(coalesce(sum(CASE WHEN actual = pred THEN n
                      END), 0) AS BIGINT) AS agree
          FROM c),
    ma AS (SELECT actual AS cls, CAST(sum(n) AS BIGINT) AS an
           FROM c GROUP BY 1),
    mp AS (SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS pn
           FROM c GROUP BY 1),
    pe AS (SELECT CAST(coalesce(sum(CAST(an AS HUGEINT) * pn), 0)
                  AS HUGEINT) AS pe_num
           FROM ma JOIN mp USING (cls))
    SELECT t.total AS n_docs, t.agree AS n_agree,
           CASE WHEN CAST(t.total AS HUGEINT) * t.total = pe.pe_num
                THEN NULL ELSE {kap} END AS kappa
    FROM t CROSS JOIN pe""".format(
        langid=langid_sql(),
        kap=_sql_r6(
            "CAST(CAST(t.agree AS HUGEINT) * t.total - pe.pe_num"
            " AS DOUBLE) / CAST(CAST(t.total AS HUGEINT) * t.total"
            " - pe.pe_num AS DOUBLE)"))


@register("lang_kappa", sql=_lang_kappa_sql())
def lang_kappa(sf_dir: str):
    """Cohen's kappa of the heuristic lang-ID (doc_langid's kernel)
    against the corpus truth label — chance-corrected agreement, the
    honest report card a classifier census (lang_confusion) feeds.
    kappa = (po - pe) / (1 - pe) cleared of denominators:
    (agree*total - pe_num) / (total^2 - pe_num) with pe_num =
    sum(actual_marginal * pred_marginal) — every term an exact
    python int (SQL HUGEINT), ONE shared-r6 double division at the
    end, NULL when chance agreement is total (degenerate one-class
    corpora). Scale: per-batch confusion partials over the
    class-pair-bounded key, one tiny combine."""
    from ...functions.langid import langid_frame

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pred = langid_frame(b["text"])["pred_lang"].to_numpy(object)
        g = pd.DataFrame({
            "actual": b["lang"].to_numpy(object), "pred": pred,
            "n": np.ones(len(b), np.int64)}) \
            .groupby(["actual", "pred"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["actual", "pred"], ["n"])
    total = int(c["n"].sum())
    agree = int(c.loc[c["actual"] == c["pred"], "n"].sum())
    ma = c.groupby("actual")["n"].sum()
    mp = c.groupby("pred")["n"].sum()
    pe_num = sum(int(ma[k]) * int(mp[k])
                 for k in ma.index if k in mp.index)
    if total * total == pe_num:
        kappa = np.nan
    else:
        from ...functions.texture import r6
        kappa = float(r6(float(agree * total - pe_num)
                         / float(total * total - pe_num)))
    return pd.DataFrame({"n_docs": [np.int64(total)],
                         "n_agree": [np.int64(agree)],
                         "kappa": [np.float64(kappa)]})


@register("mutual_nn", sql="""
    WITH m AS (
      SELECT vec_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * {g} + 0.5)
                  AS BIGINT) AS c
      FROM embeddings CROSS JOIN generate_series(1, {d}) g(i)),
    dots AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             CAST(sum(a.c * b.c) AS BIGINT) AS dot
      FROM m a JOIN m b ON a.i = b.i AND a.vec_id <> b.vec_id
      GROUP BY 1, 2),
    r AS (SELECT ia, ib, dot, row_number() OVER (
            PARTITION BY ia ORDER BY dot DESC, ib) AS rk
          FROM dots),
    top AS (SELECT ia, ib, dot FROM r WHERE rk = 1)
    SELECT t1.ia AS a, t1.ib AS b, t1.dot AS dot_q
    FROM top t1 JOIN top t2 ON t1.ib = t2.ia AND t2.ib = t1.ia
    WHERE t1.ia < t1.ib""".format(g=_MNN_GRID, d=_MNN_DIM))
def mutual_nn(sf_dir: str):
    """Reciprocal top-1 neighbors (mutual NN) over the embedding
    table under inner-product similarity — the alignment primitive of
    MNN batch correction and unsupervised translation-pair mining: a
    pair survives only if each vector is the other's single best
    match, the strongest cheap filter against hubness. Embeddings are
    floored onto a fixed integer grid IDENTICALLY in both engines, so
    the argmax compares exact int64 dots (ties broken by smallest
    neighbor id = numpy first-max over id-sorted columns); the oracle
    replays the same grid in SQL. Plan: the quantized matrix
    broadcasts once (guarded at _MNN_MAX_ROWS — above it, stages/ann's
    IVF/LSH candidate tiers are the scale path); each batch computes
    one integer matmul + row argmax; the two directed top-1 rows of a
    mutual pair meet in ONE unordered-pair exchange."""
    import pyarrow.parquet as pq

    path = _path(sf_dir, "embeddings")
    meta_rows = pq.read_metadata(path).num_rows
    if meta_rows > _MNN_MAX_ROWS:
        raise ValueError(
            "mutual_nn: %d rows > %d broadcast guard — use the "
            "stages/ann IVF or LSH candidate tier" %
            (meta_rows, _MNN_MAX_ROWS))
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    full = ds.to_pandas()
    ids = full["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    M = np.stack([
        np.floor(np.asarray(v, np.float64) * _MNN_GRID + 0.5)
        for v in full["embedding"].to_numpy(object)[order]]) \
        .astype(np.int64)
    mref = ray.put((ids, M))

    class Top1:
        def __init__(self):
            self.ids, self.M = ray.get(mref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            bid = b["vec_id"].to_numpy(np.int64)
            Q = np.stack([
                np.floor(np.asarray(v, np.float64) * _MNN_GRID + 0.5)
                for v in b["embedding"]]).astype(np.int64)
            D = Q @ self.M.T
            pos = np.searchsorted(self.ids, bid)
            D[np.arange(len(bid)), pos] = np.iinfo(np.int64).min
            best = np.argmax(D, axis=1)
            return pd.DataFrame({
                "ia": bid, "ib": self.ids[best],
                "dot": D[np.arange(len(bid)), best].astype(np.int64)})

    tops = ds.map_batches(Top1, batch_format="pandas", concurrency=2)

    def pair_key(b: pd.DataFrame) -> pd.DataFrame:
        ia = b["ia"].to_numpy(np.int64)
        ib = b["ib"].to_numpy(np.int64)
        return pd.DataFrame({
            "lo": np.minimum(ia, ib), "hi": np.maximum(ia, ib),
            "ia": ia, "dot": b["dot"].to_numpy(np.int64)})

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby(["lo", "hi"])["ia"].transform("size")
        out = g[sz == 2].drop_duplicates(["lo", "hi"])
        return pd.DataFrame({
            "a": out["lo"].to_numpy(np.int64),
            "b": out["hi"].to_numpy(np.int64),
            "dot_q": out["dot"].to_numpy(np.int64)})

    return partition_map(
        tops.map_batches(pair_key, batch_format="pandas"),
        ["lo", "hi"], mutual, 8)


@register("name_typo_pairs", sql="""
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           CAST(1 AS BIGINT) AS dist
    FROM customer a JOIN customer b
      ON a.c_name < b.c_name
     AND abs(length(a.c_name) - length(b.c_name)) <= 1
     AND levenshtein(a.c_name, b.c_name) = 1""")
def name_typo_pairs(sf_dir: str):
    """Edit-distance-1 record linkage via SYMSPELL DELETE-VARIANT
    blocking (Garbe's SymSpell / FastSS): every name keys itself plus
    its |s| single-deletion variants; two names at distance 1 ALWAYS
    share a variant (substitution -> delete the differing position
    from both; insertion -> the shorter string itself), so blocking
    is COMPLETE for d<=1 — unlike part_linkage's heuristic last-word
    block — while candidates stay ~|s| per name. Verification runs
    the vectorized Wagner-Fischer kernel (functions/editdist) on the
    deduped candidate pairs. Per-name variant generation is a
    dimension-grain Python loop (names are entity-table-sized, never
    corpus-sized)."""
    from ...functions.editdist import levenshtein_pairs

    ds = rd.read_parquet(_path(sf_dir, "customer"),
                         columns=["c_name"])

    def variants(b: pd.DataFrame) -> pd.DataFrame:
        vs, ns = [], []
        for s in b["c_name"]:
            vs.append(s)
            ns.append(s)
            for i in range(len(s)):
                vs.append(s[:i] + s[i + 1:])
                ns.append(s)
        return pd.DataFrame({
            "variant": np.asarray(vs, object),
            "name": np.asarray(ns, object)})

    post = ds.map_batches(variants, batch_format="pandas")

    def cand_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["variant", "name"], kind="mergesort")
        nm = g["name"].to_numpy(object)
        i, j = segment_all_pairs(g["variant"].to_numpy(object))
        if not len(i):
            return _empty({"a": object, "b": object})
        return pd.DataFrame({"a": nm[i],
                             "b": nm[j]}).drop_duplicates()

    cand = partition_map(post, ["variant"], cand_part, 16)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["a", "b"])
        g = g[g["a"] != g["b"]]
        if g.empty:
            return pd.DataFrame({
                "name_a": pd.Series(dtype=object),
                "name_b": pd.Series(dtype=object),
                "dist": pd.Series(dtype=np.int64)})
        d = levenshtein_pairs(g["a"], g["b"])
        keep = d == 1
        return pd.DataFrame({
            "name_a": g["a"].to_numpy(object)[keep],
            "name_b": g["b"].to_numpy(object)[keep],
            "dist": np.ones(int(keep.sum()), np.int64)})

    return partition_map(cand, ["a", "b"], verify, 16)
