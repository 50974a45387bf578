# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (JACCARD_NGRAM, JACCARD_TAU, _combine_partials, _path, _r6, cooc_sql, dedup_mod, langid_frame, langid_sql, np, pa, partition_map, pd, quality_frame, quality_sql, ray, rd, register, runlen_sql, spectrum_sql, text_stats_frame, text_stats_sql, texture_frame, winnow_fingerprint)

@register("doc_stats", sql=(
    "SELECT doc_id, " + ", ".join(
        "%s AS %s" % (expr, name)
        for name, expr in text_stats_sql("text").items())
    + " FROM documents"))
def doc_stats(sf_dir: str):
    """Per-document structural descriptors — the page-'shape' feature
    family (cf. src/features/shape.rs:15-135)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = text_stats_frame(batch["text"])
        out.insert(0, "doc_id", batch["doc_id"].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


@register("doc_quality", sql=(
    "SELECT doc_id, " + ", ".join(
        "round(%s, 6) AS %s" % (expr, name) if name != "n_tokens"
        else "%s AS %s" % (expr, name)
        for name, expr in quality_sql("text").items())
    + " FROM documents"))
def doc_quality(sf_dir: str):
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = quality_frame(batch["text"])
        out = _r6(out, ["stop_ratio", "quality"])
        out.insert(0, "doc_id", batch["doc_id"].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


@register("lang_profile", sql="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(sum(n_chars) * 1.0 / count(*), 6) AS avg_chars
    FROM documents GROUP BY lang""")
def lang_profile(sf_dir: str):
    """Grouped aggregate with the partial-combine pattern: per-batch
    pre-aggregation shrinks the shuffle to (distinct langs x blocks)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("lang", as_index=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum"))
        g["n"] = g["n"].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"), ["lang"],
        ["n", "s"]).rename(columns={"n": "n_docs", "s": "total_chars"})
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_chars"] = out["total_chars"].astype(np.int64)
    out["avg_chars"] = (out["total_chars"] / out["n_docs"]).round(6)
    return out


@register("token_totals", sql="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum({tok}) AS BIGINT) AS total_tokens
    FROM documents GROUP BY source""".format(
        tok=text_stats_sql("text")["n_tokens"]))
def token_totals(sf_dir: str):
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        nt = text_stats_frame(batch["text"])["n_tokens"]
        g = pd.DataFrame({"source": batch["source"], "t": nt}) \
            .groupby("source", as_index=False).agg(
                n=("t", "size"), t=("t", "sum"))
        g["n"] = g["n"].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"), ["source"],
        ["n", "t"]).rename(columns={"n": "n_docs", "t": "total_tokens"})
    return out.astype({"n_docs": np.int64, "total_tokens": np.int64})


def _texture_query(which: tuple[str, ...]):
    def run(sf_dir: str):
        ds = rd.read_parquet(_path(sf_dir, "documents"),
                             columns=["doc_id", "text"])

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = texture_frame(batch["text"], which=which)
            out.insert(0, "doc_id", batch["doc_id"].to_numpy())
            return out

        return ds.map_batches(fn, batch_format="pandas")
    return run


# Texture-analog families (functions/texture.py): doc_cooc = GLCM
# analog (reference src/features/texture.rs:22-172), doc_runlen =
# GLRLM analog (:174-315), doc_spectrum = Gabor analog (:317-374).
register("doc_cooc", sql=cooc_sql())(_texture_query(("cooc",)))
register("doc_runlen", sql=runlen_sql())(_texture_query(("runlen",)))
register("doc_spectrum", sql=spectrum_sql())(_texture_query(("spectrum",)))


@register("dedup_exact", sql="""
    SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY text""")
def dedup_exact(sf_dir: str):
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return dedup_mod.exact_dedup(ds, "text", "doc_id")


@register("jaccard_pairs", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents
      -- empty / whitespace-only docs have NO shingles (engine
      -- semantics: _tokenize yields [] -> no postings); without this
      -- the SQL would give them the [''] singleton set and pair all
      -- empty docs at jaccard 1.0
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), sh AS (
      SELECT doc_id, list_distinct(CASE WHEN len(w) < 2
               THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1]) END) AS s
      FROM docs
    ), pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT a, b, inter * 1.0 / uni AS jaccard
    FROM pairs WHERE uni > 0 AND inter * 1.0 / uni >= 0.08""")
def jaccard_pairs(sf_dir: str):
    """Exact n-gram-Jaccard near-dup pairs via the inverted-index plan
    (posting lists -> pair counts); the SQL oracle brute-forces all
    pairs — same result, quadratic plan."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    # int/int division is bit-identical across engines: no rounding.
    return dedup_mod.jaccard_pairs(ds, "text", "doc_id",
                                   ngram=JACCARD_NGRAM,
                                   threshold=JACCARD_TAU)


@register("minhash_pairs")  # probabilistic recall -> rows-only check
def minhash_pairs(sf_dir: str):
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return dedup_mod.minhash_lsh_pairs(ds, "text", "doc_id",
                                       ngram=JACCARD_NGRAM,
                                       threshold=0.2)


def _minhash_md5_sql(k: int = 64, bands: int = 16,
                     threshold: float = 0.2, seed: int = 7) -> str:
    """Brute-force SQL twin of the portable MinHash+LSH: signatures
    rebuilt lane-by-lane with the SAME wrap-then-mod universal hash
    (numpy uint64 wrap == HUGEINT % 2^64, verified term-for-term),
    candidates = any band's lanes all equal (the FNV band key equality
    of the engine, minus its ~2^-64 collision slack), verify =
    lane-agreement fraction >= threshold. ngram=2 gram shape shared
    with the jaccard_pairs oracle."""
    from ...functions.hashing import _MERSENNE, _hash_params
    a, b = _hash_params(k, seed)
    M64 = 1 << 64
    lanes = ", ".join(
        "list_min(list_transform(sh, h -> CAST(((CAST(%d AS HUGEINT) * h"
        " + %d) %% %d) %% %d AS UBIGINT))) AS s%d"
        % (int(a[j]), int(b[j]), M64, _MERSENNE, j) for j in range(k))
    r = k // bands
    band_or = " OR ".join(
        "(" + " AND ".join("x.s%d = y.s%d" % (j, j)
                           for j in range(bnd * r, (bnd + 1) * r)) + ")"
        for bnd in range(bands))
    agree = " + ".join("(CASE WHEN x.s%d = y.s%d THEN 1 ELSE 0 END)"
                       % (j, j) for j in range(k))
    return """
    WITH docs AS (
      SELECT doc_id, string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                        '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), shing AS (
      SELECT doc_id, list_distinct(list_transform(
        CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i+1]) END,
        g -> ('0x' || substr(md5(g), 1, 16))::UBIGINT)) AS sh
      FROM docs
    ), sigs AS (SELECT doc_id, {lanes} FROM shing)
    SELECT x.doc_id AS a, y.doc_id AS b,
           CAST({agree} AS DOUBLE) / {k} AS jaccard_est
    FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
    WHERE ({band_or})
      AND CAST({agree} AS DOUBLE) / {k} >= {thr}""".format(
        lanes=lanes, agree=agree, band_or=band_or, k=k, thr=threshold)


@register("minhash_pairs_md5", sql=_minhash_md5_sql())
def minhash_pairs_md5(sf_dir: str):
    """MinHash+LSH with the PORTABLE md5 shingle hash — identical
    banded plan to minhash_pairs (signatures-only shuffles, vectorized
    lane-agreement verify) but every hash is reproducible in DuckDB,
    so the whole probabilistic op is driver-oracled EXACTLY (the
    doc_fingerprint_md5 pattern)."""
    from ...functions.hashing import md5_shingles_flat
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return dedup_mod.minhash_lsh_pairs(
        ds, "text", "doc_id", ngram=JACCARD_NGRAM, threshold=0.2,
        shingle_flat_fn=lambda col: md5_shingles_flat(
            col, JACCARD_NGRAM))


@register("simhash_pairs")  # not SQL-expressible -> rows-only check
def simhash_pairs(sf_dir: str):
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return dedup_mod.simhash_pairs(ds, "text", "doc_id", max_hamming=3)


def _simhash_md5_sql() -> str:
    """Brute-force SQL twin of the portable SimHash: per-doc signature
    rebuilt bit-by-bit (64 majority votes over the md5 token hashes —
    powers of two emitted as literals: DuckDB's 1<<63 overflows), then
    an all-pairs hamming join. The engine's pigeonhole banding is
    EXACT for hamming <= 3, so the sets match."""
    tt = "trim(text, E' \\t\\n\\r\\f')"
    bit_terms = " + ".join(
        "CASE WHEN coalesce(list_sum(list_transform(th, h -> CASE WHEN "
        "(h >> %d) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0 THEN "
        "CAST(%d AS UBIGINT) ELSE CAST(0 AS UBIGINT) END" % (b, 1 << b)
        for b in range(64))
    return """
    WITH docs AS (
      SELECT doc_id,
             list_transform(string_split_regex({tt}, '[ \\t\\n\\r\\f]+'),
               t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS th
      FROM documents WHERE {tt} <> ''
    ), sh AS (SELECT doc_id, {sim} AS s FROM docs)
    SELECT a.doc_id AS a, b.doc_id AS b,
           CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3""".format(tt=tt, sim=bit_terms)


@register("simhash_pairs_md5", sql=_simhash_md5_sql())
def simhash_pairs_md5(sf_dir: str):
    """SimHash near-dup with the PORTABLE md5 token hash — same
    pigeonhole-banded plan as simhash_pairs, but every step is
    reproducible in DuckDB, so the op is driver-oracled (the
    doc_fingerprint_md5 pattern). Empty/whitespace-only docs are
    dropped on both sides (they all share signature 0)."""
    from ...functions.hashing import md5_token_hashes_batch
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return dedup_mod.simhash_pairs(
        ds, "text", "doc_id", max_hamming=3,
        token_hash_batch_fn=md5_token_hashes_batch, drop_empty=True)


@register("doc_langid", sql=langid_sql())
def doc_langid(sf_dir: str):
    """Heuristic lang-ID with a full SQL oracle: the scoring is pure
    arithmetic over regex counts + fixed stopword lists, mirrored
    expression-for-expression in functions/langid.langid_sql."""
    from ...functions.texture import r6
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = langid_frame(batch["text"])
        out["lang_confidence"] = r6(
            out["lang_confidence"].to_numpy(np.float64))
        out.insert(0, "doc_id", batch["doc_id"].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


@register("doc_fingerprint")  # rolling-hash winnowing -> rows-only
def doc_fingerprint(sf_dir: str):
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        fps = [winnow_fingerprint(t) for t in batch["text"]]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_fingerprints": np.asarray([len(f) for f in fps], np.int64),
            "fp_xor": np.asarray(
                [int(np.bitwise_xor.reduce(f)) - (1 << 63) if len(f)
                 else 0 for f in fps], np.int64),
        })

    return ds.map_batches(fn, batch_format="pandas")


def _corpus_clean_sql() -> str:
    from ...functions.langid import langid_sql
    return """
    WITH winners AS (
      SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies,
             text
      FROM documents GROUP BY text
    ), lid AS ({lid}),
    q AS (SELECT doc_id, round({quality}, 6) AS quality FROM winners)
    SELECT w.doc_id, w.n_copies, l.pred_lang, l.lang_confidence,
           q.quality
    FROM winners w
    JOIN lid l ON w.doc_id = l.doc_id
    JOIN q ON w.doc_id = q.doc_id
    WHERE q.quality >= 0.3 AND l.pred_lang <> 'und'""".format(
        lid=langid_sql("winners"), quality=quality_sql("text")["quality"])


@register("corpus_clean", sql=_corpus_clean_sql())
def corpus_clean(sf_dir: str):
    """The canonical training-data cleaning chain as ONE composed
    pipeline: exact dedup (keep min-id winner) -> per-row quality
    scoring + language ID -> filter (quality >= 0.3, identifiable
    language). Demonstrates operator composition on a streaming plan:
    one 16-byte-key hash exchange (the dedup), then stateless scoring
    map_batches — the filters never see a second shuffle. Fully
    SQL-oracled."""
    from ...functions.texture import r6
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    winners = dedup_mod.exact_dedup(ds, "text", "doc_id",
                                    keep_content=True)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_frame(batch["text"])
        l = langid_frame(batch["text"])
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_copies": batch["n_copies"].to_numpy(np.int64),
            "pred_lang": l["pred_lang"].to_numpy(),
            "lang_confidence": r6(
                l["lang_confidence"].to_numpy(np.float64)),
            "quality": q["quality"].round(6).to_numpy(),
        })
        keep = (out["quality"] >= 0.3) & (out["pred_lang"] != "und")
        return out[keep]

    return winners.map_batches(score, batch_format="pandas")


@register("vocab_topk", sql="""
    WITH toks AS (
      SELECT unnest(string_split_regex(
               trim(text, E' \\t\\n\\r\\f'), '[ \\t\\n\\r\\f]+')) AS token
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    )
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM toks GROUP BY token
    ORDER BY n DESC, token LIMIT 100""")
def vocab_topk(sf_dir: str):
    """Vocabulary building — the corpus-wide term-frequency top-k a
    training-data pipeline needs for tokenizer/vocab construction.
    Plan: per-batch token explode with LOCAL pre-aggregation
    (np.unique counts: the exchange carries (token, count) partials,
    never raw tokens), one hash exchange on token, vectorized
    per-partition sum + partial top-k, tiny driver merge. Tokenization
    matches text_stats (split on the explicit ws class after strip) so
    the SQL oracle is exact."""
    return _vocab_top(sf_dir, 100)


def _vocab_top(sf_dir: str, K: int) -> pd.DataFrame:
    """Exact global top-K (token, count) table — the vocab_topk plan,
    factored for reuse by zipf_fit."""
    import re as _re

    from ...stages.partition import partition_map
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

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", as_index=False).agg(n=("n", "sum"))
        out["n"] = out["n"].astype(np.int64)
        # partial top-k: only K rows per partition reach the driver
        out = out.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort")
        return out.head(K)

    parts = partition_map(ds.map_batches(explode, batch_format="pandas"),
                          ["token"], combine, 16).to_pandas()
    top = parts.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").head(K)
    return top.reset_index(drop=True)


#: bigram_pmi: candidate floor and result size
PMI_MIN_COUNT = 5
PMI_K = 50


@register("bigram_pmi", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ),
    words AS (SELECT doc_id, unnest(w) AS tok,
                     generate_subscripts(w, 1) AS pos
              FROM docs),
    ucnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
             FROM words GROUP BY tok),
    nu AS (SELECT count(*) AS n FROM words),
    big AS (SELECT a.tok AS w1, b.tok AS w2
            FROM words a JOIN words b
              ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    nb AS (SELECT count(*) AS n FROM big),
    bcnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
             FROM big GROUP BY w1, w2
             HAVING count(*) >= {m}),
    scored AS (
      SELECT w1, w2, c_xy, u1.c AS c_x, u2.c AS c_y,
             round(ln((CAST(c_xy AS DOUBLE) * CAST(nu.n AS DOUBLE)
                       * CAST(nu.n AS DOUBLE))
                      / (CAST(nb.n AS DOUBLE) * CAST(u1.c AS DOUBLE)
                         * CAST(u2.c AS DOUBLE))), 6) AS pmi
      FROM bcnt JOIN ucnt u1 ON u1.tok = w1
                JOIN ucnt u2 ON u2.tok = w2
      CROSS JOIN nu CROSS JOIN nb)
    SELECT w1, w2, c_xy, c_x, c_y, pmi
    FROM scored ORDER BY pmi DESC, w1, w2 LIMIT {k}""".format(
        m=PMI_MIN_COUNT, k=PMI_K))
def bigram_pmi(sf_dir: str):
    """Collocation mining: top-K adjacent-token bigrams by pointwise
    mutual information ``ln(p(xy) / (p(x) p(y)))`` with a min-count
    floor — the phrase-detection pass (word2vec-style phrasing, NER
    gazetteer seeding) of a text pipeline.

    Scale plan: phase A reuses the vocab exchange — per-batch unigram
    partials (plus an ndocs sentinel) -> one token exchange -> the
    count table broadcast ONCE under the same 20M-row guard as
    doc_tfidf (min-count cutoff is the documented web-scale knob);
    total bigrams need NO extra pass: every nonempty doc has exactly
    len-1 bigrams, so n_bi = n_uni - n_docs. Phase B exchanges
    per-batch (w1, w2, count) partials on the bigram key, filters to
    the min-count floor per partition, attaches both word counts by
    searchsorted against the broadcast, computes PMI as exact integer
    counts entering ONE double expression in oracle order, and ships
    only a per-partition top-K to the driver merge."""
    from ...stages.dedup import _tokenize
    from ...stages.partition import partition_map
    from ...functions.texture import r6

    SENTINEL = "\x00ndocs"
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def uni_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks, ndocs = [], 0
        for t in _tokenize(b["text"]):
            if not t:
                continue
            ndocs += 1
            toks.extend(t)
        if not toks:
            return pd.DataFrame({"tok": pd.Series(dtype=object),
                                 "c": pd.Series(dtype=np.int64)})
        u, c = np.unique(np.asarray(toks, object), return_counts=True)
        out = pd.DataFrame({"tok": u, "c": c.astype(np.int64)})
        return pd.concat([out, pd.DataFrame(
            {"tok": [SENTINEL], "c": np.asarray([ndocs], np.int64)})],
            ignore_index=True)

    def uni_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("tok", as_index=False).agg(c=("c", "sum"))
        out["c"] = out["c"].astype(np.int64)
        return out

    ucnt = partition_map(ds.map_batches(uni_partial,
                                        batch_format="pandas"),
                         ["tok"], uni_combine, 16) \
        .limit(20_000_001).to_pandas()
    if len(ucnt) > 20_000_000:
        raise ValueError("bigram_pmi: vocabulary too large to "
                         "broadcast; raise PMI_MIN_COUNT / apply a "
                         "min-count cutoff first")
    n_docs = int(ucnt.loc[ucnt["tok"] == SENTINEL, "c"].iloc[0])
    ucnt = ucnt[ucnt["tok"] != SENTINEL]
    n_uni = int(ucnt["c"].sum())
    n_bi = n_uni - n_docs
    order = np.argsort(ucnt["tok"].to_numpy())
    ref = ray.put((ucnt["tok"].to_numpy()[order],
                   ucnt["c"].to_numpy(np.int64)[order]))

    def bi_partial(b: pd.DataFrame) -> pd.DataFrame:
        w1, w2 = [], []
        for t in _tokenize(b["text"]):
            if len(t) < 2:
                continue
            w1.extend(t[:-1])
            w2.extend(t[1:])
        if not w1:
            return pd.DataFrame({"w1": pd.Series(dtype=object),
                                 "w2": pd.Series(dtype=object),
                                 "c_xy": pd.Series(dtype=np.int64)})
        out = pd.DataFrame({"w1": w1, "w2": w2}).groupby(
            ["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "c_xy"})
        out["c_xy"] = out["c_xy"].astype(np.int64)
        return out

    def top_pmi(g: pd.DataFrame) -> pd.DataFrame:
        # broadcast fetch: per-task ray.get hits the node-local
        # object store (zero-copy numpy), never re-ships per batch
        toks, cs = ray.get(ref)
        g = g.groupby(["w1", "w2"], as_index=False).agg(
            c_xy=("c_xy", "sum"))
        g = g[g["c_xy"] >= PMI_MIN_COUNT]
        if not len(g):
            return pd.DataFrame({
                "w1": pd.Series(dtype=object),
                "w2": pd.Series(dtype=object),
                "c_xy": pd.Series(dtype=np.int64),
                "c_x": pd.Series(dtype=np.int64),
                "c_y": pd.Series(dtype=np.int64),
                "pmi": pd.Series(dtype=np.float64)})
        cx = cs[np.searchsorted(toks, g["w1"].to_numpy(object))]
        cy = cs[np.searchsorted(toks, g["w2"].to_numpy(object))]
        c_xy = g["c_xy"].to_numpy(np.int64)
        num = c_xy.astype(np.float64) * float(n_uni) * float(n_uni)
        den = float(n_bi) * cx.astype(np.float64) \
            * cy.astype(np.float64)
        out = pd.DataFrame({
            "w1": g["w1"].to_numpy(object),
            "w2": g["w2"].to_numpy(object),
            "c_xy": c_xy.astype(np.int64),
            "c_x": cx.astype(np.int64),
            "c_y": cy.astype(np.int64),
            "pmi": r6(np.log(num / den))})
        out = out.sort_values(["pmi", "w1", "w2"],
                              ascending=[False, True, True],
                              kind="mergesort")
        return out.head(PMI_K)

    parts = partition_map(ds.map_batches(bi_partial,
                                         batch_format="pandas"),
                          ["w1", "w2"], top_pmi, 16).to_pandas()
    top = parts.sort_values(["pmi", "w1", "w2"],
                            ascending=[False, True, True],
                            kind="mergesort").head(PMI_K)
    return top.reset_index(drop=True)


@register("vocab_heavy_approx")   # approximate sketch: no SQL oracle
def vocab_heavy_approx(sf_dir: str):
    """SHUFFLE-FREE heavy-hitter vocabulary (the fixed-memory scale
    path beside vocab_topk's exact exchange): every block emits its
    local candidate top-100 plus a count-min sketch partial (4x4096
    int64, 128 KiB — Cormode & Muthukrishnan 2005); partials tree-
    merge 64->1 by addition like the HLL registers, and the driver
    re-ranks the merged candidate union by CMS-estimated counts.
    CMS never undercounts (est >= true count; over by <= eps*N w.p.
    1-delta: w=4096 -> eps~0.07% of total tokens, d=4 -> delta~1.8%).
    Candidate recall relies on global heavy hitters being locally
    heavy in at least one block — the standard CMS+candidates
    compromise, property-tested against the exact top-k in pytest."""
    import re as _re

    from ...functions.hashing import hash64
    from ...functions.sketch import cms_merge, cms_partial, cms_query
    from ...functions.text_stats import WS_CLASS
    ws_re = _re.compile(WS_CLASS + "+")
    K = 25
    LOCAL_K = 100
    ds = rd.read_parquet(_path(sf_dir, "documents"), columns=["text"])

    def partial(batch: pd.DataFrame) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"]:
            if not isinstance(t, str):
                continue
            t = t.strip(" \t\n\r\f")
            if t:
                toks.extend(ws_re.split(t))
        arr = np.asarray(toks, object)
        sk = cms_partial(hash64(arr))
        if len(arr):
            uniq, counts = np.unique(arr, return_counts=True)
            order = np.lexsort((uniq, -counts))[:LOCAL_K]
            cands = uniq[order]
        else:
            cands = np.empty(0, object)
        return pa.table({
            "cands": pa.array([list(cands)], pa.list_(pa.string())),
            "sketch": pa.array([sk.tobytes()], pa.binary())})

    def combine(batch: pa.Table) -> pa.Table:
        sks = [np.frombuffer(b, np.int64).reshape(4, -1)
               for b in batch["sketch"].to_pylist()]
        cands = np.unique(np.asarray(
            [c for row in batch["cands"].to_pylist() for c in row],
            object))
        return pa.table({
            "cands": pa.array([list(cands)], pa.list_(pa.string())),
            "sketch": pa.array([cms_merge(sks).tobytes()],
                               pa.binary())})

    parts = ds.map_batches(partial, batch_format="pandas") \
        .map_batches(combine, batch_format="pyarrow",
                     batch_size=64).to_pandas()
    sk = cms_merge([np.frombuffer(b, np.int64).reshape(4, -1)
                    for b in parts["sketch"]])
    cands = np.unique(np.asarray(
        [c for row in parts["cands"] for c in row], object))
    if not len(cands):
        return pd.DataFrame({"token": pd.Series(dtype=object),
                             "n_est": pd.Series(dtype=np.int64)})
    est = cms_query(sk, hash64(cands))
    order = np.lexsort((cands, -est))[:K]
    return pd.DataFrame({"token": cands[order],
                         "n_est": est[order].astype(np.int64)})


_CMS_D, _CMS_W, _CMS_TOPK = 4, 4096, 25


def _cms_md5_sql(d: int = _CMS_D, w: int = _CMS_W,
                 k: int = _CMS_TOPK) -> str:
    """DuckDB twin of ``vocab_heavy_md5``: exact counts pick the
    top-k; the count-min table is rebuilt from the SAME
    ``md5_number_upper(token || '#' || row) % w`` family the engine
    uses, so every estimated count is integer-identical."""
    return f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(
               trim(text, E' \\t\\n\\r\\f'), '[ \\t\\n\\r\\f]+')) AS token
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), counts AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n_true
      FROM toks GROUP BY token
    ), topk AS (
      SELECT token, n_true FROM counts
      ORDER BY n_true DESC, token LIMIT {k}
    ), rws AS (
      SELECT CAST(r AS BIGINT) AS r FROM range({d}) t(r)
    ), cms AS (
      SELECT r, md5_number_upper(token || '#' || CAST(r AS VARCHAR))
               % {w} AS bucket,
             CAST(sum(n_true) AS BIGINT) AS cnt
      FROM counts CROSS JOIN rws GROUP BY 1, 2
    )
    SELECT t.token, t.n_true, CAST(min(c.cnt) AS BIGINT) AS n_est
    FROM topk t CROSS JOIN rws r
    JOIN cms c ON c.r = r.r
     AND c.bucket = md5_number_upper(t.token || '#'
                      || CAST(r.r AS VARCHAR)) % {w}
    GROUP BY 1, 2"""


@register("vocab_heavy_md5", sql=_cms_md5_sql())
def vocab_heavy_md5(sf_dir: str):
    """``vocab_heavy_approx`` with the PORTABLE md5 hash family —
    the count-min sketch tier driver-oracled EXACTLY (the
    custkey_distinct_hll_md5 pattern applied to heavy hitters): the
    distributed CMS fold, the exact top-25 selection, and every
    min-over-rows estimate are integer-identical to the DuckDB twin.
    Single scan, single token-key exchange: per-batch local (token,
    count) partials -> one hash exchange -> per-partition CMS partial
    (4x4096 int64, tokens hashed once each at their GLOBAL count)
    plus the partition's exact top-25; driver folds <= 16 summary
    rows. Proves the sketch arithmetic the fast ``vocab_heavy_approx``
    (in-engine hash64) relies on; its candidate-recall compromise is
    separately property-tested."""
    import re as _re

    from ...functions.hashing import md5_suffixed64_flat
    from ...functions.text_stats import WS_CLASS
    ws_re = _re.compile(WS_CLASS + "+")
    D, W, K = _CMS_D, _CMS_W, _CMS_TOPK
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

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("token", as_index=False).agg(n=("n", "sum"))
        tok = g["token"].to_numpy(object)
        n = g["n"].to_numpy(np.int64)
        sk = np.zeros((D, W), np.int64)
        if len(tok):
            hv = md5_suffixed64_flat(tok, D)
            for r in range(D):
                np.add.at(sk[r], (hv[r] % np.uint64(W)).astype(np.int64),
                          n)
        g = g.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").head(K)
        return pd.DataFrame({
            "token": [list(g["token"])],
            "n": [list(g["n"])],
            "sketch": [sk.tobytes()]})

    parts = partition_map(
        ds.map_batches(explode, batch_format="pandas"),
        ["token"], per_part, 16).to_pandas()
    sk = np.zeros((D, W), np.int64)
    for b in parts["sketch"]:
        sk += np.frombuffer(b, np.int64).reshape(D, W)
    toks = np.asarray([t for row in parts["token"] for t in row],
                      object)
    ns = np.asarray([v for row in parts["n"] for v in row], np.int64)
    if not len(toks):
        return pd.DataFrame({"token": pd.Series(dtype=object),
                             "n_true": pd.Series(dtype=np.int64),
                             "n_est": pd.Series(dtype=np.int64)})
    order = np.lexsort((toks, -ns))[:K]
    toks, ns = toks[order], ns[order]
    hv = md5_suffixed64_flat(toks, D)
    est = np.min(np.stack(
        [sk[r][(hv[r] % np.uint64(W)).astype(np.int64)]
         for r in range(D)]), axis=0)
    return pd.DataFrame({"token": toks, "n_true": ns,
                         "n_est": est.astype(np.int64)})


@register("doc_fingerprint_md5", sql="""
    WITH g AS (
      SELECT doc_id, length(coalesce(text, '')) AS n,
        CASE WHEN length(coalesce(text, '')) = 0
               THEN CAST([] AS VARCHAR[])
             WHEN length(text) < 8 THEN [substr(md5(text), 1, 16)]
             ELSE list_transform(range(1, length(text) - 8 + 2),
                    i -> substr(md5(substr(text, i, 8)), 1, 16))
        END AS hv
      FROM documents
    ), w AS (
      SELECT doc_id,
        CASE WHEN len(hv) = 0 THEN CAST([] AS VARCHAR[])
             WHEN len(hv) <= 16 THEN [list_min(hv)]
             ELSE list_distinct(list_transform(
                    range(1, len(hv) - 16 + 2),
                    j -> list_min(hv[j:j+15])))
        END AS fps
      FROM g)
    SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
           list_min(fps) AS fp_min, list_max(fps) AS fp_max
    FROM w""")
def doc_fingerprint_md5(sf_dir: str):
    """Winnowing fingerprint with the PORTABLE md5 gram hash
    (functions/hashing.winnow_fingerprint_md5) — algorithmically
    identical to doc_fingerprint but fully reproducible in DuckDB, so
    the winnowing op gets a driver-verified oracle (VERDICT r2 #6).
    Fixed-width lowercase hex == numeric order, so window minima and
    fp_min/fp_max agree across engines by construction."""
    from ...functions.hashing import winnow_fingerprint_md5_batch
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        fps = winnow_fingerprint_md5_batch(list(batch["text"]))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_fingerprints": np.asarray([len(f) for f in fps],
                                         np.int64),
            "fp_min": [f[0] if f else None for f in fps],
            "fp_max": [f[-1] if f else None for f in fps],
        })

    return ds.map_batches(fn, batch_format="pandas")
