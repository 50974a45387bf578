# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (JACCARD_NGRAM, JACCARD_TAU, ORACLE, _BENCH_VEC_MAX, _COMBINE_MAX_ROWS, _combine_partials, _path, _r6, _sorted_member, dedup_mod, np, pa, partition_map, pc, pd, ray, rd, register, text_stats_frame, text_stats_sql)
from .q00_documents_per_row import (_minhash_md5_sql)
from .q05_pages_flagship import (_GOPHER, _QC_BIAS, _QC_BUCKETS, _QC_MIX, _QC_MOD, _SEQ_BUCKET, _gopher_sql)

@register("quality_classifier", sql="""
    WITH docs AS (
      SELECT doc_id, trim(text, E' \\t\\n\\r\\f') AS t FROM documents),
    words AS (
      SELECT doc_id,
             unnest(string_split_regex(t, '[ \\t\\n\\r\\f]+')) AS term
      FROM docs WHERE t <> ''),
    w AS (
      SELECT doc_id,
             (CAST(('0x' || substr(md5(term), 1, 16))::UBIGINT
                   % {nb} AS BIGINT) * {mix} + {bias})
               % {md} - {half} AS wt
      FROM words),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(wt) AS BIGINT) AS score_micro
      FROM w GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce(a.score_micro, 0) AS score_micro,
           round(1.0 / (1.0 + exp(-(CAST(coalesce(a.score_micro, 0)
                 AS DOUBLE) / greatest(coalesce(a.n_tokens, 0), 1)
                 / 1000000.0))), 6) AS prob,
           CAST(coalesce(a.score_micro, 0) > 0 AS BIGINT) AS keep
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN agg a USING (doc_id)""".format(
        nb=_QC_BUCKETS, mix=_QC_MIX, bias=_QC_BIAS, md=_QC_MOD,
        half=(_QC_MOD - 1) // 2))
def quality_classifier(sf_dir: str):
    """Fasttext-style linear quality classifier: hashed bag-of-words
    (md5 token hash -> one of 1024 buckets) scored by a fixed
    per-bucket weight vector, mean-pooled into a logit and squashed to
    a keep probability — the model-scoring step of a CCNet/Gopher-style
    curation pipeline (the weights here are deterministic
    bucket-derived integers so the op is fully driver-oracle-able; a
    real deployment swaps in trained weights via ray.put broadcast,
    identical plumbing). Float policy: per-token weights are INTEGER
    micro-logits summed exactly (fold-order-free, like lm_score's
    micro-nats); the single final sigmoid is one deterministic double
    expression. Map-only: no shuffle, no driver state — tokens are
    hashed by one vectorized md5 C kernel per batch
    (functions/hashing.md5_upper64_flat)."""
    from ...functions.hashing import md5_upper64_flat
    from ...stages.dedup import _tokenize

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    half = (_QC_MOD - 1) // 2

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks = _tokenize(batch["text"])
        lens = np.asarray([len(t) for t in toks], np.int64)
        flat = [w for ws in toks for w in ws]
        score = np.zeros(len(toks), np.int64)
        if flat:
            hv = md5_upper64_flat(flat)
            b = (hv % _QC_BUCKETS).astype(np.int64)
            wt = (b * _QC_MIX + _QC_BIAS) % _QC_MOD - half
            nz = lens > 0
            off = np.zeros(len(toks), np.int64)
            off[1:] = np.cumsum(lens)[:-1]
            score[nz] = np.add.reduceat(wt, off[nz])
        prob = 1.0 / (1.0 + np.exp(
            -(score / np.maximum(lens, 1) / 1e6)))
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_tokens": lens,
            "score_micro": score,
            "prob": prob,
            "keep": (score > 0).astype(np.int64),
        })
        return _r6(out, ["prob"])

    return ds.map_batches(fn, batch_format="pandas")


@register("gopher_rules", sql=_gopher_sql())
def gopher_rules(sf_dir: str):
    """Gopher-style rule-based quality filter (the public web-pipeline
    composite: word-count bounds, mean-word-length bounds, minimum
    stopword count, minimum alpha-word fraction, maximum symbol-to-word
    ratio), emitting the survivors WITH the rule metrics so the filter
    decision is auditable. One stateless vectorized pass per batch —
    no shuffle, embarrassingly parallel at any scale; the word-level
    counts share the single tokenize pass with text_stats (same split
    semantics as the oracle SQL, byte-agreed).

    Graft analog of the reference's per-record keep/drop gate on
    degenerate nuclei (src/features/shape.rs:142-207): a pure
    per-record predicate with the *reasons* kept as columns."""
    import re
    from ...functions.quality import STOPWORDS
    from ...functions.text_stats import WS_CLASS
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    g = _GOPHER
    alpha_re = re.compile(r"[A-Za-z]")
    stop = frozenset(STOPWORDS)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("")
        st = text_stats_frame(s)
        n_words = st["n_tokens"].to_numpy(np.int64)
        mwl = st["mean_token_len"].to_numpy(np.float64)
        toks = s.str.strip(" \t\n\r\f").str.split(WS_CLASS + "+")
        n_stop = np.asarray(
            [sum(t in stop for t in tl) if tl != [""] else 0
             for tl in toks], np.int64)
        n_alpha = np.asarray(
            [sum(alpha_re.search(t) is not None for t in tl)
             for tl in toks], np.int64)
        n_sym = (s.str.count("#")
                 + s.str.count(r"\.\.\.")).to_numpy(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha_frac = np.where(n_words > 0, n_alpha / n_words, np.nan)
            sym_ratio = np.where(n_words > 0, n_sym / n_words, np.nan)
        keep = ((n_words >= g["min_words"]) & (n_words <= g["max_words"])
                & (mwl >= g["min_mwl"]) & (mwl <= g["max_mwl"])
                & (n_stop >= g["min_stop"])
                & (alpha_frac >= g["min_alpha_frac"])
                & (sym_ratio <= g["max_sym_ratio"]))
        # r6 = half-AWAY-from-zero, matching DuckDB round(); numpy's
        # half-even would differ exactly on 5e-7 dyadic boundaries.
        from ...functions.texture import r6
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_words": n_words,
            "mean_word_len": r6(mwl),
            "n_stop": n_stop,
            "alpha_frac": r6(alpha_frac),
            "sym_ratio": r6(sym_ratio),
        })
        return out[keep]

    return ds.map_batches(fn, batch_format="pandas")


LANGS = ["de", "en", "es", "fr", "zh"]


@register("lang_pivot", sql="""
    SELECT source, {cells},
           CAST(count(*) AS BIGINT) AS n_total
    FROM documents GROUP BY source""".format(cells=", ".join(
        "CAST(sum(CASE WHEN lang='%s' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_%s" % (l, l) for l in LANGS)))
def lang_pivot(sf_dir: str):
    """Pivot/reshape: long (source, lang) pairs -> one wide row per
    source with a column per language — the corpus-composition matrix
    a mix designer reads. Per-batch crosstab partials (distinct
    sources x langs rows, pre-aggregated before any exchange) fold
    through the guarded driver combine; the pivoted schema is FIXED by
    the ``LANGS`` list, so block schemas agree regardless of which
    languages a batch happens to contain."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(b["source"], b["lang"])
        ct = ct.reindex(columns=LANGS, fill_value=0)
        out = ct.reset_index()
        out.columns = ["source"] + ["n_%s" % l for l in LANGS]
        for l in LANGS:
            out["n_%s" % l] = out["n_%s" % l].astype(np.int64)
        return out

    cols = ["n_%s" % l for l in LANGS]
    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], cols)
    for c in cols:
        out[c] = out[c].astype(np.int64)
    out["n_total"] = out[cols].sum(axis=1).astype(np.int64)
    return out


SHUFFLE_SEED = 7


@register("epoch_shuffle", sql="""
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':{seed}'),
                        doc_id)
           AS BIGINT) AS pos
    FROM documents""".format(seed=SHUFFLE_SEED))
def epoch_shuffle(sf_dir: str):
    """Reproducible epoch shuffle: every doc gets its position in a
    SEEDED deterministic global permutation (order by a portable md5
    of ``doc_id:seed``) — the data-ordering step of a training run
    that must be bit-reproducible across retries and resumes, unlike
    ``random_shuffle``. A new seed is a new permutation.

    Scale shape: rank-over-unique-keys, so the quality_rank histogram
    would be corpus-sized — instead bucket by the hash PREFIX (256
    buckets: lexicographic order of the first two hex chars equals
    bucket-integer order), phase A counts per bucket (bounded driver
    combine, 256 rows), phase B is one hash exchange on bucket +
    partition-local sort by (hash, doc_id); position = broadcast
    bucket offset + intra-bucket rank. The md5 runs as ONE vectorized
    C kernel per batch (DuckDB's md5_number_upper/lower over the
    id column — no per-row Python loop), split into two uint64 sort
    keys whose big-endian order equals the oracle's hex-string
    order (hex lexicographic == digest-byte order)."""
    from ...stages.partition import partition_map

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id"])

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        # Plain task (not an actor pool): duckdb's import is cached
        # per worker process, so tasks avoid the ~2 s actor-pool
        # spawn that dominated this stage.
        from ...functions.hashing import md5_id64_flat
        ids = batch["doc_id"].to_numpy(np.int64)
        h_hi, h_lo = md5_id64_flat(ids, ":%d" % SHUFFLE_SEED)
        return pd.DataFrame({
            "doc_id": ids,
            "h_hi": h_hi,
            "h_lo": h_lo,
            "bucket": (h_hi >> np.uint64(56)).astype(np.int64)})

    # Materialize the NARROW keyed rows (doc_id + two uint64 keys +
    # bucket, 32 B/row — the text never entered): both the histogram
    # pass and the rank exchange consume them, and a lazy Dataset
    # would re-run the read+md5 per consumer. Spillable object-store
    # blocks, not driver memory — safe at any corpus size.
    keyed = ds.map_batches(key, batch_format="pandas").materialize()

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("bucket", as_index=False).agg(n=("doc_id", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        keyed.map_batches(hist_partial, batch_format="pandas"),
        ["bucket"], ["n"]).sort_values("bucket", kind="mergesort")
    offs = np.concatenate(([0], np.cumsum(
        hist["n"].to_numpy(np.int64))[:-1]))
    ref = ray.put((hist["bucket"].to_numpy(np.int64), offs))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        bk, off = ray.get(ref)
        g = g.sort_values(["h_hi", "h_lo", "doc_id"], kind="mergesort")
        base = off[np.searchsorted(bk, g["bucket"].to_numpy(np.int64))]
        intra = g.groupby("bucket", sort=False).cumcount().to_numpy()
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "pos": (base + intra + 1).astype(np.int64)})

    return partition_map(keyed, ["bucket"], rank_part, 8)


@register("dedup_clusters", sql="""
    WITH RECURSIVE pairs AS MATERIALIZED (
      SELECT a, b FROM ({jac}) jp
    ), edges AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM pairs
      UNION SELECT b, a FROM pairs
    ), reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster,
           CAST(CASE WHEN min(dst) = src THEN 1 ELSE 0 END AS BIGINT)
               AS is_rep
    FROM reach GROUP BY src""")
def dedup_clusters(sf_dir: str):
    """Near-duplicate CLUSTER resolution: exact Jaccard pairs ->
    distributed connected components (min-label propagation,
    ``stages/graph.py``) -> every doc labeled with its component's min
    id and an ``is_rep`` keep flag — the decision step that turns a
    pair list into "which rows survive dedup". Singletons (including
    empty docs, which have no shingles) are their own cluster via one
    keyed left-join exchange. The oracle recomputes the components
    with a recursive transitive-closure CTE over the same pair SQL —
    quadratic like every exact-pair oracle, while the engine's rounds
    move only edge-sized label messages."""
    from ...stages.graph import attach_clusters, connected_components

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    pairs = dedup_mod.jaccard_pairs(ds, "text", "doc_id",
                                    ngram=JACCARD_NGRAM,
                                    threshold=JACCARD_TAU)
    cc = connected_components(pairs, "a", "b", num_partitions=8)
    ids = rd.read_parquet(_path(sf_dir, "documents"),
                          columns=["doc_id"])
    return attach_clusters(ids, cc, "doc_id", num_partitions=8)


ORACLE["dedup_clusters"] = ORACLE["dedup_clusters"].format(
    jac=ORACLE["jaccard_pairs"])


@register("topk_per_group", sql="""
    SELECT lang, source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT lang, source, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents)
    WHERE rk <= 3""")
def topk_per_group(sf_dir: str):
    """Grouped top-k (top-3 longest docs per lang x source) WITHOUT a
    global sort: per-block partial top-k per group (vectorized sort +
    groupby.head) shrinks each block to <= groups_in_block x k rows,
    then ONE hash exchange on the group key and a final per-partition
    top-k + rank. Scale shape: the exchange moves at most
    k x |groups| x blocks rows (k-bounded, text never ships); no
    driver-side materialization at any point. The global-top-k twin is
    ``top_spenders``; this is the per-group form every
    "best-N-documents-per-domain" curation pass needs."""
    K = 3
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "source", "doc_id",
                                  "n_chars"])

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True], kind="mergesort")
        return b.groupby(["lang", "source"], sort=False).head(K)

    from ...stages.partition import partition_map

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True], kind="mergesort")
        g = g.groupby(["lang", "source"], sort=False).head(K).copy()
        g["rk"] = g.groupby(["lang", "source"], sort=False) \
            .cumcount().to_numpy(np.int64) + 1
        return g[["lang", "source", "doc_id", "n_chars", "rk"]]

    return partition_map(ds.map_batches(block_topk,
                                        batch_format="pandas"),
                         ["lang", "source"], final_topk, 8)


@register("dup_spans", sql="""
    WITH RECURSIVE idx(i) AS (
      SELECT CAST(0 AS BIGINT)
      UNION ALL
      SELECT i + 1 FROM idx
      WHERE i + 1 <= (SELECT max(length(text)) - 20 FROM documents)
    ), grams AS (
      SELECT d.doc_id, idx.i AS pos,
             substring(d.text, CAST(idx.i AS INTEGER) + 1, 20) AS g
      FROM documents d JOIN idx ON idx.i <= length(d.text) - 20
    ), dup AS (
      SELECT g FROM grams GROUP BY g
      HAVING count(DISTINCT doc_id) > 1
    ), hits AS (
      SELECT gr.doc_id, gr.pos FROM grams gr JOIN dup USING (g)
    ), brks AS (
      SELECT doc_id, pos,
             CASE WHEN pos > lag(pos, 1, -999999) OVER w + 20
                  THEN 1 ELSE 0 END AS brk
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), isles AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isle
      FROM brks
    )
    SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) + 20 AS BIGINT) AS span_end,
           CAST(max(pos) + 20 - min(pos) AS BIGINT) AS span_len
    FROM isles GROUP BY doc_id, isle""")
def dup_spans(sf_dir: str):
    """Exact duplicate-substring span detection (Lee et al. ACL'22
    ExactSubstr goal): maximal character ranges of each doc covered by
    a 20-gram that also occurs in another doc — the ranges a
    substring-level dedup would cut. Engine: ``stages.dedup
    .duplicate_spans`` (vectorized 128-bit rolling-hash grams -> gram
    exchange -> per-doc island merge). Oracle: literal substring
    grams + gaps-and-islands windows — string-quadratic like every
    exact oracle, while the engine ships only 24-byte gram rows."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return dedup_mod.duplicate_spans(ds, "text", "doc_id", k=20,
                                     num_partitions=8)


@register("lm_score", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), words AS (SELECT doc_id, unnest(w) AS term FROM docs),
    cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM words GROUP BY term),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM words),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM words GROUP BY doc_id, term),
    contrib AS (
      SELECT doc_id, tf,
             CAST(floor(tf * ln(CAST(t AS DOUBLE) / c) * 1000000
                        + 0.5) AS BIGINT) AS m
      FROM tf JOIN cnt USING (term) CROSS JOIN tot)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(m) AS BIGINT) AS nll_micro,
           floor(CAST(sum(m) AS DOUBLE) / sum(tf) / ln(2) + 0.5)
             / 1000000.0 AS bits_per_token
    FROM contrib GROUP BY doc_id""")
def lm_score(sf_dir: str):
    """CCNet-style language-model quality scoring: per-document
    negative log-likelihood under the corpus UNIGRAM LM (the cheap,
    fully-distributable stand-in for the KenLM perplexity filter of
    Wenzek et al., "CCNet", LREC'20). Low bits/token = repetitive,
    high = unusual vocabulary — both tails are filter candidates.

    Pass 1 builds the unigram count table exchanging only (term,
    partial-count) rows + a total-token sentinel; the vocabulary-sized
    result is broadcast ONCE behind the same 20M-row guard as
    doc_tfidf. Pass 2 is map-only: per-doc np.unique + searchsorted
    lookup. Float policy: each (doc, term) contribution becomes
    INTEGER micro-nats via the identical floor(x*1e6 + 0.5) expression
    in numpy and SQL, so the per-doc sum is exact integer arithmetic —
    no fold-order dependence — and the final bits/token is a single
    deterministic expression over exact integers."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return _lm_scores(ds)


def _lm_scores(ds):
    """lm_score's engine body over any (doc_id, text) Dataset — shared
    with corpus_curation, whose LM is fit on the deduped corpus."""
    from ...stages.dedup import _tokenize
    from ...stages.partition import partition_map

    SENTINEL = "\x00total"

    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = []
        for t in _tokenize(b["text"]):
            if t:
                toks.extend(t)
        if not toks:
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 "c": pd.Series(dtype=np.int64)})
        u, c = np.unique(np.asarray(toks, object), return_counts=True)
        out = pd.DataFrame({"term": u, "c": c.astype(np.int64)})
        return pd.concat([out, pd.DataFrame(
            {"term": [SENTINEL],
             "c": np.asarray([len(toks)], np.int64)})],
            ignore_index=True)

    def cnt_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False).agg(c=("c", "sum"))
        out["c"] = out["c"].astype(np.int64)
        return out

    cnts = partition_map(ds.map_batches(cnt_partial,
                                        batch_format="pandas"),
                         ["term"], cnt_combine, 16) \
        .limit(20_000_001).to_pandas()
    if len(cnts) > 20_000_000:
        raise ValueError("lm_score: vocabulary too large to "
                         "broadcast; apply a min-count cutoff first")
    total = int(cnts.loc[cnts["term"] == SENTINEL, "c"].iloc[0])
    cnts = cnts[cnts["term"] != SENTINEL]
    order = np.argsort(cnts["term"].to_numpy())
    ref = ray.put((cnts["term"].to_numpy()[order],
                   cnts["c"].to_numpy(np.int64)[order], total))

    class Score:
        def __init__(self):
            self.terms, self.counts, self.total = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids, ntoks, nlls, bits = [], [], [], []
            for doc_id, t in zip(b["doc_id"].to_numpy(np.int64),
                                 _tokenize(b["text"])):
                if not t:
                    continue
                u, tf = np.unique(np.asarray(t, dtype=object),
                                  return_counts=True)
                c = self.counts[np.searchsorted(self.terms, u)]
                m = np.floor(
                    tf * np.log(np.float64(self.total) / c)
                    * 1000000 + 0.5).astype(np.int64)
                nll = int(m.sum())
                nt = int(tf.sum())
                ids.append(doc_id)
                ntoks.append(nt)
                nlls.append(nll)
                bits.append(np.floor(
                    np.float64(nll) / nt / np.log(2.0) + 0.5)
                    / 1000000.0)
            return pd.DataFrame({
                "doc_id": np.asarray(ids, np.int64),
                "n_tokens": np.asarray(ntoks, np.int64),
                "nll_micro": np.asarray(nlls, np.int64),
                "bits_per_token": np.asarray(bits, np.float64)})

    return ds.map_batches(Score, batch_format="pandas", concurrency=2)


@register("corpus_curation", sql="""
    WITH kept AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    ), kdocs AS (
      SELECT d.doc_id,
             string_split_regex(trim(d.text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents d JOIN kept USING (doc_id)
      WHERE trim(d.text, E' \\t\\n\\r\\f') <> ''
    ), words AS (SELECT doc_id, unnest(w) AS term FROM kdocs),
    cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM words GROUP BY term),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM words),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM words GROUP BY doc_id, term),
    contrib AS (
      SELECT doc_id, tf,
             CAST(floor(tf * ln(CAST(t AS DOUBLE) / c) * 1000000
                        + 0.5) AS BIGINT) AS m
      FROM tf JOIN cnt USING (term) CROSS JOIN tot),
    scored AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             floor(CAST(sum(m) AS DOUBLE) / sum(tf) / ln(2) + 0.5)
               / 1000000.0 AS bits_per_token
      FROM contrib GROUP BY doc_id),
    q AS (SELECT quantile_cont(bits_per_token, 0.05) AS lo,
                 quantile_cont(bits_per_token, 0.95) AS hi
          FROM scored)
    SELECT doc_id, n_tokens, bits_per_token
    FROM scored, q
    WHERE bits_per_token >= q.lo AND bits_per_token <= q.hi""")
def corpus_curation(sf_dir: str):
    """End-to-end curation composition over documents — the
    three-stage pass a training corpus actually gets: (1) EXACT dedup
    (128-bit content hash, min-id winner), (2) unigram-LM scoring fit
    on the DEDUPED corpus (``_lm_scores`` — integer micro-nat float
    policy), (3) perplexity band-pass keeping [P5, P95] of
    bits/token (both tails are junk: boilerplate repetition below,
    lexical noise above — the CCNet/Gopher filter shape).

    Scale accounting: one 16-byte-key exchange (dedup) + one (term,
    count) exchange (LM fit) + a value-histogram threshold pass
    (bounded by DISTINCT score values, broadcast comparison) — the
    full corpus text never crosses a shuffle and the driver sees only
    the guarded vocab and histogram combines. Fully SQL-oracled:
    every stage is deterministic, so the composition stays bit-exact
    through all three stages."""
    docs = rd.read_parquet(_path(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    kept = dedup_mod.exact_dedup(docs, "text", "doc_id",
                                 keep_content=True) \
        .select_columns(["doc_id", "text"])
    scored = _lm_scores(kept).materialize()

    def vc_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("bits_per_token", as_index=False).agg(
            n=("bits_per_token", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        scored.map_batches(vc_partial, batch_format="pandas"),
        ["bits_per_token"], ["n"]) \
        .sort_values("bits_per_token", kind="mergesort")
    vals = hist["bits_per_token"].to_numpy(np.float64)
    cum = np.cumsum(hist["n"].to_numpy(np.int64))
    n = int(cum[-1])

    def q_cont(q: float) -> float:
        # DuckDB quantile_cont (same derivation as quality_band)
        h = (n - 1) * q
        i = int(np.floor(h))
        lo = vals[np.searchsorted(cum, i + 1)]
        hi = vals[np.searchsorted(cum, min(i + 2, n))]
        return float(lo + (hi - lo) * (h - np.floor(h)))

    lo, hi = q_cont(0.05), q_cont(0.95)

    def band(batch: pa.Table) -> pa.Table:
        b = batch["bits_per_token"].to_numpy(zero_copy_only=False)
        out = batch.filter(pa.array((b >= lo) & (b <= hi)))
        return out.select(["doc_id", "n_tokens", "bits_per_token"])

    return scored.map_batches(band, batch_format="pyarrow")


@register("oov_rate", sql="""
    WITH toks AS (
      SELECT unnest(string_split_regex(
               trim(text, E' \\t\\n\\r\\f'), '[ \\t\\n\\r\\f]+')) AS token
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), vocab AS (
      SELECT token FROM toks GROUP BY token
      ORDER BY count(*) DESC, token LIMIT 25
    ), words AS (
      SELECT doc_id, unnest(string_split_regex(
               trim(text, E' \\t\\n\\r\\f'), '[ \\t\\n\\r\\f]+')) AS token
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    )
    SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS oov_rate
    FROM words w LEFT JOIN vocab v USING (token)
    GROUP BY w.doc_id""")
def oov_rate(sf_dir: str):
    """Tokenizer-vocabulary coverage: per-document out-of-vocabulary
    token fraction against the corpus top-25 vocabulary — the
    coverage check run before committing to a tokenizer vocab. Pass 1
    is vocab_topk's partial-count exchange (only (token, count) rows
    move, partial top-k per partition); the tiny vocab broadcasts
    once; pass 2 is map-only np.isin per doc. The rate is one exact
    int/int division, so floats match the oracle bit-for-bit."""
    import re as _re

    from ...functions.text_stats import WS_CLASS
    from ...stages.dedup import _tokenize
    from ...stages.partition import partition_map
    ws_re = _re.compile(WS_CLASS + "+")
    K = 25
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in _tokenize(batch["text"]):
            toks.extend(t)
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
        out = out.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort")
        return out.head(K)

    parts = partition_map(ds.map_batches(explode,
                                         batch_format="pandas"),
                          ["token"], combine, 16).to_pandas()
    vocab = parts.sort_values(["n", "token"],
                              ascending=[False, True],
                              kind="mergesort").head(K)
    vref = ray.put(np.sort(vocab["token"].to_numpy(object)))

    class Rate:
        def __init__(self):
            self.vocab = ray.get(vref)          # sorted

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            toks = _tokenize(b["text"])
            ids = b["doc_id"].to_numpy(np.int64)
            keep = np.asarray([bool(t) for t in toks])
            if not keep.any():
                return pd.DataFrame({
                    "doc_id": np.empty(0, np.int64),
                    "n_tokens": np.empty(0, np.int64),
                    "n_oov": np.empty(0, np.int64),
                    "oov_rate": np.empty(0, np.float64)})
            flat = np.asarray(
                [w for t in toks for w in t], dtype=object)
            inv = ~_sorted_member(self.vocab, flat)
            lens = np.asarray([len(t) for t in toks if t], np.int64)
            cs = np.concatenate(([0], np.cumsum(inv)))
            off = np.concatenate(([0], np.cumsum(lens)))
            oovs = (cs[off[1:]] - cs[off[:-1]]).astype(np.int64)
            return pd.DataFrame({
                "doc_id": ids[keep],
                "n_tokens": lens,
                "n_oov": oovs,
                "oov_rate": oovs.astype(np.float64) / lens})

    return ds.map_batches(Rate, batch_format="pandas", concurrency=2)


@register("near_dedup_keep_md5", sql="""
    WITH RECURSIVE pairs AS MATERIALIZED (
      SELECT a, b FROM ({mh}) mp
    ), edges AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM pairs
      UNION SELECT b, a FROM pairs
    ), reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster,
           CAST(CASE WHEN min(dst) = src THEN 1 ELSE 0 END AS BIGINT)
               AS is_rep
    FROM reach GROUP BY src""")
def near_dedup_keep_md5(sf_dir: str):
    """``near_dedup_keep`` with the PORTABLE md5 shingle hash: the
    SAME MinHash+LSH -> connected-components -> keep-flag composition
    the production dedup runs, but with every hash reproducible in
    DuckDB — so even the LSH clustering path gets a full bit-exact
    driver oracle (recursive closure over the minhash_pairs_md5 SQL).
    Between this, ``dedup_clusters`` (exact-Jaccard twin) and
    ``near_dedup_keep`` (fast in-engine hash), every tier of the
    near-dedup decision pipeline is either SQL-oracled or
    pytest-pinned to an oracled twin."""
    from ...functions.hashing import md5_shingles_flat
    from ...stages.graph import attach_clusters, connected_components

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    pairs = dedup_mod.minhash_lsh_pairs(
        ds, "text", "doc_id", ngram=JACCARD_NGRAM, threshold=0.2,
        shingle_flat_fn=lambda col: md5_shingles_flat(
            col, JACCARD_NGRAM))
    cc = connected_components(pairs, "a", "b", num_partitions=8)
    ids = rd.read_parquet(_path(sf_dir, "documents"),
                          columns=["doc_id"])
    return attach_clusters(ids, cc, "doc_id", num_partitions=8)


ORACLE["near_dedup_keep_md5"] = ORACLE["near_dedup_keep_md5"].format(
    mh=_minhash_md5_sql())


@register("decontaminate_bloom")  # Bloom membership -> rows-only
def decontaminate_bloom(sf_dir: str):
    """``decontaminate``'s fixed-memory scale tier: benchmark gram
    membership via a BLOOM FILTER instead of the exact broadcast gram
    array. The filter is built DISTRIBUTED — per-batch 16 KiB bitmap
    partials (``functions.sketch.bloom_partial``) OR-merged like the
    HLL registers — then broadcast once (128 KiB here vs the unbounded
    exact gram set). No false negatives, so ``contaminated`` is a
    SUPERSET of the exact tier's (asserted in pytest with the FPP
    bound); at web scale you size m from a first-pass gram count.
    Probabilistic membership -> rows-only in the driver gate; the
    exact tier IS SQL-oracled."""
    from ...functions.hashing import hash64
    from ...functions.sketch import (bloom_contains, bloom_merge,
                                    bloom_partial)
    from ...stages.dedup import _tokenize

    M_BITS, K = 1 << 20, 7

    def grams_of(toks: list[str]) -> np.ndarray:
        if not toks:
            return np.empty(0, dtype=object)
        if len(toks) < 3:
            return np.asarray([" ".join(toks)], dtype=object)
        return np.unique(np.asarray(
            [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)],
            dtype=object))

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def bench_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] % 97 == 0]
        gs = [grams_of(t) for t in _tokenize(b["text"])]
        gs = [g for g in gs if len(g)]
        h = (hash64(np.concatenate(gs)) if gs
             else np.empty(0, np.uint64))
        return pd.DataFrame(
            {"bmp": [bloom_partial(h, M_BITS, K).tobytes()]})

    parts = ds.map_batches(bench_partial,
                           batch_format="pandas") \
        .limit(100_000).to_pandas()
    bmp = bloom_merge([np.frombuffer(p, np.uint8)
                       for p in parts["bmp"]])
    bref = ray.put(bmp)

    class Mark:
        def __init__(self):
            self.bmp = ray.get(bref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            # flattened probe: one hash64 + bloom_contains per batch
            gs = [grams_of(t) for t in _tokenize(b["text"])]
            keep = np.asarray([len(g) > 0 for g in gs])
            hits = np.zeros(len(gs), np.int64)
            if keep.any():
                flat = np.concatenate([g for g in gs if len(g)])
                memb = bloom_contains(self.bmp, hash64(flat), K)
                lens = np.asarray([len(g) for g in gs if len(g)])
                cs = np.concatenate(([0], np.cumsum(memb)))
                off = np.concatenate(([0], np.cumsum(lens)))
                hits[keep] = cs[off[1:]] - cs[off[:-1]]
            out = pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_hits": hits})[keep]
            out["is_benchmark"] = (out["doc_id"] % 97 == 0)
            out["contaminated"] = out["n_hits"] > 0
            return out[["doc_id", "is_benchmark", "n_hits",
                        "contaminated"]]

    return ds.map_batches(Mark, batch_format="pandas", concurrency=2)


_BLOOM_MD5_M, _BLOOM_MD5_K = 1 << 20, 7


def _bloom_md5_sql(m: int = _BLOOM_MD5_M,
                   k: int = _BLOOM_MD5_K) -> str:
    """DuckDB twin of ``decontaminate_bloom_md5``: the benchmark
    side's Bloom BIT SET is rebuilt from the same
    ``md5_number_upper(gram || '#' || k) % m`` family; a gram is
    positive iff ALL k positions are set — false positives and all."""
    return f"""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), g AS (
      SELECT doc_id, list_distinct(CASE WHEN len(w) < 3
               THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS s
      FROM docs
    ), u AS (
      SELECT doc_id, unnest(s) AS gram FROM g
    ), ks AS (
      SELECT CAST(r AS BIGINT) AS k FROM range({k}) t(r)
    ), bits AS (
      SELECT DISTINCT md5_number_upper(gram || '#'
               || CAST(k AS VARCHAR)) % {m} AS bit
      FROM (SELECT DISTINCT gram FROM u WHERE doc_id % 97 = 0)
      CROSS JOIN ks
    ), probe AS (
      SELECT u.doc_id, u.gram,
             min(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS hit
      FROM u CROSS JOIN ks
      LEFT JOIN bits b
        ON b.bit = md5_number_upper(u.gram || '#'
                     || CAST(ks.k AS VARCHAR)) % {m}
      GROUP BY u.doc_id, u.gram
    ), hits AS (
      SELECT doc_id, CAST(sum(hit) AS BIGINT) AS n_hits
      FROM probe GROUP BY doc_id
    )
    SELECT g.doc_id, g.doc_id % 97 = 0 AS is_benchmark,
           coalesce(h.n_hits, 0) AS n_hits,
           coalesce(h.n_hits, 0) > 0 AS contaminated
    FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id"""


@register("decontaminate_bloom_md5", sql=_bloom_md5_sql())
def decontaminate_bloom_md5(sf_dir: str):
    """``decontaminate_bloom`` with the PORTABLE md5 position family
    — the Bloom membership tier driver-oracled EXACTLY, false
    positives included (the custkey_distinct_hll_md5 pattern applied
    to set membership). Same distributed shape as the fast tier:
    per-batch 128 KiB bitmap partials OR-merged on the driver,
    broadcast once, probed with one vectorized (k x grams) position
    lookup per batch; the SQL twin recomputes the benchmark bit set
    and flags a gram iff all {k} positions are set."""
    from ...functions.hashing import md5_suffixed64_flat
    from ...stages.dedup import _tokenize

    M, K = _BLOOM_MD5_M, _BLOOM_MD5_K

    def grams_of(toks: list[str]) -> np.ndarray:
        if not toks:
            return np.empty(0, dtype=object)
        if len(toks) < 3:
            return np.asarray([" ".join(toks)], dtype=object)
        return np.unique(np.asarray(
            [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)],
            dtype=object))

    def positions(grams: np.ndarray) -> np.ndarray:
        return (md5_suffixed64_flat(grams, K)
                % np.uint64(M)).astype(np.int64)

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def bench_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] % 97 == 0]
        gs = [grams_of(t) for t in _tokenize(b["text"])]
        gs = [g for g in gs if len(g)]
        bmp = np.zeros(M >> 3, np.uint8)
        if gs:
            pos = positions(np.unique(np.concatenate(gs))).ravel()
            np.bitwise_or.at(
                bmp, pos >> 3,
                np.left_shift(np.uint8(1),
                              (pos & 7).astype(np.uint8)))
        return pd.DataFrame({"bmp": [bmp.tobytes()]})

    parts = ds.map_batches(bench_partial,
                           batch_format="pandas") \
        .limit(100_000).to_pandas()
    bmp = np.zeros(M >> 3, np.uint8)
    for p in parts["bmp"]:
        bmp |= np.frombuffer(p, np.uint8)
    bref = ray.put(bmp)

    class Mark:
        def __init__(self):
            self.bmp = ray.get(bref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            gs = [grams_of(t) for t in _tokenize(b["text"])]
            keep = np.asarray([len(g) > 0 for g in gs])
            hits = np.zeros(len(gs), np.int64)
            if keep.any():
                flat = np.concatenate([g for g in gs if len(g)])
                pos = positions(flat)                       # (K, G)
                memb = ((self.bmp[pos >> 3]
                         >> (pos & 7).astype(np.uint8)) & 1) \
                    .all(axis=0)
                lens = np.asarray([len(g) for g in gs if len(g)])
                cs = np.concatenate(([0], np.cumsum(memb)))
                off = np.concatenate(([0], np.cumsum(lens)))
                hits[keep] = cs[off[1:]] - cs[off[:-1]]
            out = pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_hits": hits})[keep]
            out["is_benchmark"] = (out["doc_id"] % 97 == 0)
            out["contaminated"] = out["n_hits"] > 0
            return out[["doc_id", "is_benchmark", "n_hits",
                        "contaminated"]]

    return ds.map_batches(Mark, batch_format="pandas", concurrency=2)


@register("doc_chunks", sql="""
    WITH RECURSIVE idx(i) AS (
      SELECT CAST(0 AS BIGINT)
      UNION ALL
      SELECT i + 1 FROM idx
      WHERE (i + 1) * 150 < (SELECT max(length(text)) FROM documents)
    )
    SELECT d.doc_id, CAST(idx.i AS BIGINT) AS chunk_id,
           CAST(idx.i * 150 AS BIGINT) AS chunk_start,
           substring(d.text, CAST(idx.i * 150 AS INTEGER) + 1, 200)
             AS chunk_text,
           CAST(least(200, length(d.text) - idx.i * 150) AS BIGINT)
             AS chunk_chars
    FROM documents d JOIN idx ON idx.i * 150 < length(d.text)""")
def doc_chunks(sf_dir: str):
    """Context-window document chunking: split every doc into
    200-char windows with 50-char overlap (stride 150) — the
    long-document splitter that feeds fixed-context training. A pure
    row-EXPANDING map (flat expansion inside one map_batches): no
    exchange, no state, each batch independently yields ~n_chars/150
    rows per doc, so the streaming executor backpressures on output
    size, never on doc count. Character semantics match SQL
    substring (the corpus is validated single-code-unit)."""
    CHUNK, STRIDE = 200, 150
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def chunks(b: pd.DataFrame) -> pd.DataFrame:
        ids, cids, starts, texts, lens = [], [], [], [], []
        for did, txt in zip(b["doc_id"].to_numpy(np.int64),
                            b["text"].to_numpy()):
            n = len(txt)
            k = 0
            for start in range(0, n, STRIDE):
                piece = txt[start:start + CHUNK]
                ids.append(did)
                cids.append(k)
                starts.append(start)
                texts.append(piece)
                lens.append(len(piece))
                k += 1
        return pd.DataFrame({
            "doc_id": np.asarray(ids, np.int64),
            "chunk_id": np.asarray(cids, np.int64),
            "chunk_start": np.asarray(starts, np.int64),
            "chunk_text": pd.Series(texts, dtype=object),
            "chunk_chars": np.asarray(lens, np.int64)})

    return ds.map_batches(chunks, batch_format="pandas")


@register("term_postings", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), words AS (SELECT doc_id, unnest(w) AS term FROM docs),
    dd AS (SELECT DISTINCT term, doc_id FROM words)
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ','
                      ORDER BY doc_id) AS postings
    FROM dd GROUP BY term""")
def term_postings(sf_dir: str):
    """Inverted-index build: term -> sorted posting list of doc ids
    (the IR primitive behind BM25 / keyword retrieval over a corpus).
    Per-batch DISTINCT (term, doc) pairs collapse before the single
    term-keyed exchange; each partition then sorts its postings and
    emits one row per term with the df count and the comma-joined
    sorted list. Posting lists are the only thing that grows with
    corpus size — they stay sharded by term (never driver-side), and
    the string join mirrors the oracle's ORDER BY string_agg exactly.
    At web scale hot terms (stopwords) get long lists: the documented
    mitigation is a df cutoff (drop terms above max_df, as
    jaccard_pairs does) — retrieval never scans stopword postings."""
    from ...stages.dedup import _tokenize
    from ...stages.partition import partition_map

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        terms, dids = [], []
        for did, t in zip(b["doc_id"].to_numpy(np.int64),
                          _tokenize(b["text"])):
            if not t:
                continue
            u = np.unique(np.asarray(t, dtype=object))
            terms.append(u)
            dids.append(np.full(len(u), did, np.int64))
        if not terms:
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 "doc_id": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"term": np.concatenate(terms),
                             "doc_id": np.concatenate(dids)})

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["term", "doc_id"]) \
            .sort_values(["term", "doc_id"], kind="mergesort")
        out = g.groupby("term", as_index=False).agg(
            df=("doc_id", "size"),
            postings=("doc_id",
                      lambda s: ",".join(map(str, s))))
        out["df"] = out["df"].astype(np.int64)
        return out

    return partition_map(ds.map_batches(pairs, batch_format="pandas"),
                         ["term"], build, 16)


@register("near_dedup_keep")  # probabilistic candidates -> rows-only
def near_dedup_keep(sf_dir: str):
    """The SCALE-PATH near-dedup decision pipeline end-to-end:
    MinHash+LSH candidate pairs (constant work per doc, signatures
    only across the exchange) -> distributed connected components ->
    (doc_id, cluster, is_rep) keep flags for every document. This is
    the composition a 100 TB dedup actually runs; ``dedup_clusters``
    is its exact-Jaccard twin whose pair stage is quadratic by design
    (it exists for the SQL oracle). Probabilistic candidates make
    this rows-only in the driver gate; determinism and the exact twin
    are covered by pytest + the dedup_clusters oracle."""
    from ...stages.graph import attach_clusters, connected_components

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    pairs = dedup_mod.minhash_lsh_pairs(ds, "text", "doc_id",
                                        ngram=JACCARD_NGRAM,
                                        threshold=0.2)
    cc = connected_components(pairs, "a", "b", num_partitions=8)
    ids = rd.read_parquet(_path(sf_dir, "documents"),
                          columns=["doc_id"])
    return attach_clusters(ids, cc, "doc_id", num_partitions=8)


@register("cust_no_orders", sql="""
    SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)""")
def cust_no_orders(sf_dir: str):
    """Distributed ANTI-join (TPC-H Q22 flavor): customers with no
    high-value (>300k) order. Large-large shape: BOTH sides stream key-partials into ONE
    co-partitioning exchange on custkey — the orders side collapses to
    DISTINCT custkeys per batch before shuffling (8-byte keys, never
    order rows), then each partition anti-merges vectorized. No
    broadcast (either side may be huge at scale), no driver
    materialization. The semi-join is the same plan with the filter
    flipped (region_orders covers the broadcast-small-side variant).
    acctbal crosses engines as exact integer cents (repo float
    policy)."""
    from ...stages.partition import partition_map

    cust = rd.read_parquet(_path(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])
    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["c_custkey"].to_numpy(np.int64),
            "c_nationkey": b["c_nationkey"].to_numpy(np.int64),
            "acctbal_cents": np.round(
                b["c_acctbal"].to_numpy() * 100).astype(np.int64),
            "side": np.zeros(len(b), np.int64)})

    def order_keys(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_totalprice"].to_numpy() > 300000]
        k = np.unique(b["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "key": k,
            "c_nationkey": np.zeros(len(k), np.int64),
            "acctbal_cents": np.zeros(len(k), np.int64),
            "side": np.ones(len(k), np.int64)})

    both = cust.map_batches(cust_rows, batch_format="pandas").union(
        orders.map_batches(order_keys, batch_format="pandas"))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        has = g.loc[g["side"] == 1, "key"].to_numpy(np.int64)
        c = g[g["side"] == 0]
        keep = ~np.isin(c["key"].to_numpy(np.int64), has)
        out = c.loc[keep, ["key", "c_nationkey", "acctbal_cents"]]
        return out.rename(columns={"key": "c_custkey"})

    return partition_map(both, ["key"], anti, 16)


@register("order_fill_rates", sql="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE li.n IS NOT NULL) AS BIGINT)
             AS n_filled,
           CAST(count(*) FILTER (WHERE li.n IS NULL) AS BIGINT)
             AS n_unfilled,
           CAST(sum(coalesce(li.n, 0)) AS BIGINT) AS n_items,
           CAST(sum(coalesce(li.qc, 0)) AS BIGINT) AS qty_cents
    FROM orders o LEFT JOIN (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qc
      FROM lineitem GROUP BY l_orderkey) li
    ON li.l_orderkey = o.o_orderkey
    GROUP BY o_orderpriority""")
def order_fill_rates(sf_dir: str):
    """LEFT OUTER join aggregate (the join family's missing flavor —
    J4 is inner, J5 anti, J6 semi): per order priority, how many
    orders have line items at all, plus item and quantity totals with
    null-side zero fill. The corpus plants orders with no line items,
    so the outer edge is exercised.

    Scale plan: lineitem pre-aggregates per batch to (orderkey,
    n, qty-cents) grain BEFORE the one orderkey co-partitioning
    exchange (union-tagged, the cust_no_orders shape); each partition
    left-merges vectorized and pre-aggregates to priority grain, so
    the driver combine is 5 x partitions rows. Quantities cross
    engines as exact integer cents."""
    from ...stages.partition import partition_map

    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    li = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_quantity"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(np.int64),
            "prio": b["o_orderpriority"].to_numpy(object),
            "n": np.zeros(len(b), np.int64),
            "qc": np.zeros(len(b), np.int64),
            "side": np.zeros(len(b), np.int64)})

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "key": b["l_orderkey"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64),
            "qc": np.round(b["l_quantity"].to_numpy(np.float64)
                           * 100).astype(np.int64)})
        g = g.groupby("key", as_index=False).agg(
            n=("n", "sum"), qc=("qc", "sum"))
        g["prio"] = ""
        g["side"] = np.int64(1)
        return g[["key", "prio", "n", "qc", "side"]]

    both = orders.map_batches(order_rows, batch_format="pandas") \
        .union(li.map_batches(li_partial, batch_format="pandas"))

    def left_agg(g: pd.DataFrame) -> pd.DataFrame:
        right = g[g["side"] == 1].groupby("key", as_index=False).agg(
            n=("n", "sum"), qc=("qc", "sum"))
        left = g.loc[g["side"] == 0, ["key", "prio"]]
        m = left.merge(right, on="key", how="left")
        filled = m["n"].notna()
        out = pd.DataFrame({
            "o_orderpriority": m["prio"].to_numpy(object),
            "n_orders": np.ones(len(m), np.int64),
            "n_filled": filled.to_numpy().astype(np.int64),
            "n_unfilled": (~filled).to_numpy().astype(np.int64),
            "n_items": m["n"].fillna(0).to_numpy(np.int64),
            "qty_cents": m["qc"].fillna(0).to_numpy(np.int64)})
        return out.groupby("o_orderpriority", as_index=False).sum()

    parts = partition_map(both, ["key"], left_agg, 16) \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("order_fill_rates: partial frame too large")
    out = parts.groupby("o_orderpriority", as_index=False).sum()
    for c in ("n_orders", "n_filled", "n_unfilled", "n_items",
              "qty_cents"):
        out[c] = out[c].astype(np.int64)
    return out


@register("sales_rollup", sql="""
    SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL')
             AS order_year,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)""")
def sales_rollup(sf_dir: str):
    """Hierarchical GROUPING-SETS aggregate (ROLLUP): revenue by
    (year, priority) plus per-year subtotals plus the grand total —
    the OLAP cube edge none of the flat groupbys cover. Subtotal
    levels surface as the string 'ALL' (no real NULLs in the group
    keys, so coalesce is unambiguous).

    Scale plan: per-batch partials collapse to at most
    years x priorities cells before ANY data movement; the driver
    combine is bounded by the cube size (guarded), and all three
    rollup levels are derived from the finest cells driver-side —
    integer cents, no shuffle at all."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_orderpriority",
                                  "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["o_orderdate"].to_numpy("datetime64[Y]") \
            .astype(np.int64) + 1970
        g = pd.DataFrame({
            "y": y,
            "prio": b["o_orderpriority"].to_numpy(object),
            "n": np.ones(len(b), np.int64),
            "cents": np.round(b["o_totalprice"].to_numpy(np.float64)
                              * 100).astype(np.int64)})
        return g.groupby(["y", "prio"], as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum"))

    parts = ds.map_batches(partial, batch_format="pandas") \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("sales_rollup: cube too large for the "
                         "driver combine")
    fine = parts.groupby(["y", "prio"], as_index=False).agg(
        n=("n", "sum"), cents=("cents", "sum"))
    by_year = fine.groupby("y", as_index=False).agg(
        n=("n", "sum"), cents=("cents", "sum"))
    by_year["prio"] = "ALL"
    total = pd.DataFrame({"y": ["ALL"], "prio": ["ALL"],
                          "n": [fine["n"].sum()],
                          "cents": [fine["cents"].sum()]})
    fine["y"] = fine["y"].astype(str)
    by_year["y"] = by_year["y"].astype(str)
    out = pd.concat([fine, by_year, total], ignore_index=True)
    return pd.DataFrame({
        "order_year": out["y"].to_numpy(object),
        "priority": out["prio"].to_numpy(object),
        "n_orders": out["n"].to_numpy(np.int64),
        "revenue_cents": out["cents"].to_numpy(np.int64)})


@register("orders_audit", sql="""
    SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_orders,
           CAST((SELECT count(*) FROM (
                   SELECT o_orderkey FROM orders
                   GROUP BY o_orderkey HAVING count(*) > 1))
                AS BIGINT) AS n_dup_orderkey,
           CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                AS BIGINT) AS n_null_custkey,
           CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0)
                AS BIGINT) AS n_nonpos_price,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                   WHERE l.l_orderkey = o.o_orderkey))
                AS BIGINT) AS n_orders_no_items,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphan_lineitems""")
def orders_audit(sf_dir: str):
    """Data-quality audit in ONE pass: row count, duplicate primary
    keys, null foreign keys, non-positive amounts, referential
    completeness in BOTH directions (orders without line items, line
    items without an order) — the validation report a pipeline runs
    before trusting an ingest.

    Scale plan: stateless checks ride the per-batch partials; the
    referential checks share ONE orderkey co-partitioning exchange
    (union-tagged, lineitem collapsed to (key, count) per batch);
    each partition emits a single row of counters and the driver adds
    partitions x 1 rows."""
    from ...stages.partition import partition_map

    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    li = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(np.int64),
            "null_ck": b["o_custkey"].isna().to_numpy()
            .astype(np.int64),
            "nonpos": (b["o_totalprice"].to_numpy(np.float64) <= 0)
            .astype(np.int64),
            "n_items": np.zeros(len(b), np.int64),
            "side": np.zeros(len(b), np.int64)})

    def li_partial(b: pd.DataFrame) -> pd.DataFrame:
        k, c = np.unique(b["l_orderkey"].to_numpy(np.int64),
                         return_counts=True)
        return pd.DataFrame({
            "key": k, "null_ck": np.zeros(len(k), np.int64),
            "nonpos": np.zeros(len(k), np.int64),
            "n_items": c.astype(np.int64),
            "side": np.ones(len(k), np.int64)})

    both = orders.map_batches(order_rows, batch_format="pandas") \
        .union(li.map_batches(li_partial, batch_format="pandas"))

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1].groupby("key", as_index=False).agg(
            n_items=("n_items", "sum"))
        okeys = o["key"].to_numpy(np.int64)
        ouniq, ocnt = np.unique(okeys, return_counts=True)
        lkeys = l["key"].to_numpy(np.int64)
        no_items = ~_sorted_member(np.sort(lkeys), okeys)
        orphan_mask = ~_sorted_member(ouniq, lkeys)
        return pd.DataFrame({
            "n_orders": [np.int64(len(o))],
            "n_dup_orderkey": [np.int64((ocnt > 1).sum())],
            "n_null_custkey": [o["null_ck"].sum()],
            "n_nonpos_price": [o["nonpos"].sum()],
            "n_orders_no_items": [np.int64(no_items.sum())],
            "n_orphan_lineitems":
                [l.loc[orphan_mask, "n_items"].sum()]})

    parts = partition_map(both, ["key"], audit, 16).to_pandas()
    out = parts.sum().to_frame().T
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


@register("dup_spans_apply", sql="""
    WITH RECURSIVE idx(i) AS (
      SELECT CAST(0 AS BIGINT)
      UNION ALL
      SELECT i + 1 FROM idx
      WHERE i + 1 <= (SELECT max(length(text)) - 20 FROM documents)
    ), grams AS (
      SELECT d.doc_id, idx.i AS pos,
             substring(d.text, CAST(idx.i AS INTEGER) + 1, 20) AS g
      FROM documents d JOIN idx ON idx.i <= length(d.text) - 20
    ), gstat AS (
      SELECT g, count(DISTINCT doc_id) AS nd, min(doc_id) AS mn
      FROM grams GROUP BY g
    ), hits AS (
      SELECT gr.doc_id, gr.pos FROM grams gr JOIN gstat USING (g)
      WHERE gstat.nd > 1 AND gr.doc_id > gstat.mn
    ), brks AS (
      SELECT doc_id, pos,
             CASE WHEN pos > lag(pos, 1, -999999) OVER w + 20
                  THEN 1 ELSE 0 END AS brk
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), isles AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isle
      FROM brks
    ), spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 20 AS e
      FROM isles GROUP BY doc_id, isle
    ), seg AS (
      SELECT doc_id, s, e,
             lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s)
               AS prev_e
      FROM spans
    ), pieces AS (
      SELECT sg.doc_id,
             substring(d.text, CAST(sg.prev_e AS INTEGER) + 1,
                       CAST(sg.s - sg.prev_e AS INTEGER)) AS piece,
             sg.s AS ord
      FROM seg sg JOIN documents d USING (doc_id)
      UNION ALL
      SELECT mx.doc_id,
             substring(d.text, CAST(mx.last_e AS INTEGER) + 1)
               AS piece,
             2147483647 AS ord
      FROM (SELECT doc_id, max(e) AS last_e FROM spans
            GROUP BY doc_id) mx JOIN documents d USING (doc_id)
    ), cleaned AS (
      SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS clean_text
      FROM pieces GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(c.clean_text, d.text) AS clean_text,
           CAST(length(d.text)
                - length(coalesce(c.clean_text, d.text)) AS BIGINT)
             AS n_cut
    FROM documents d LEFT JOIN cleaned c USING (doc_id)""")
def dup_spans_apply(sf_dir: str):
    """APPLY the substring dedup: every duplicated 20-gram span is cut
    from all but its first (min doc id) carrier — the executable form
    of ``dup_spans`` (Lee et al. keep-one-copy semantics). Engine:
    ``stages.dedup.remove_duplicate_spans`` (keep_first span list +
    one doc-keyed exchange + per-partition splice). Oracle rebuilds
    the cut text with gaps-and-islands windows + ORDER BY string_agg
    over the surviving segments."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return dedup_mod.remove_duplicate_spans(ds, "text", "doc_id",
                                            k=20, num_partitions=8)


@register("lang_zscore", sql="""
    WITH s AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_chars) AS BIGINT) AS sm,
             CAST(sum(n_chars * n_chars) AS BIGINT) AS sq
      FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang, d.n_chars,
           (d.n_chars - CAST(sm AS DOUBLE) / n)
             / sqrt((sq - CAST(sm AS DOUBLE) * sm / n) / (n - 1))
             AS z
    FROM documents d JOIN s USING (lang)""")
def lang_zscore(sf_dir: str):
    """Group-wise feature standardization (per-language z-score of
    doc length) — the normalization pass feature pipelines apply
    before mixing signals. Per-batch INTEGER moment partials (n, sum,
    sum-of-squares per lang) reach the driver through the guarded
    combine, so the group moments are exact and order-free; the
    per-row z is then ONE identical float expression in numpy and SQL
    ((x - sm/n) / sqrt((sq - sm*sm/n)/(n-1)), IEEE ops in the same
    tree shape), making the result bit-exact with no rounding step.
    Broadcast moments, map-only second pass — no shuffle."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["n_chars"].to_numpy(np.int64)
        g = pd.DataFrame({"lang": b["lang"], "x": x, "x2": x * x}) \
            .groupby("lang", as_index=False).agg(
                n=("x", "size"), sm=("x", "sum"), sq=("x2", "sum"))
        for c in ("n", "sm", "sq"):
            g[c] = g[c].astype(np.int64)
        return g

    mom = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang"], ["n", "sm", "sq"]).set_index("lang")
    mref = ray.put({l: (int(r["n"]), int(r["sm"]), int(r["sq"]))
                    for l, r in mom.iterrows()})

    class Z:
        def __init__(self):
            self.m = ray.get(mref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            langs = b["lang"].to_numpy()
            x = b["n_chars"].to_numpy(np.int64)
            n = np.asarray([self.m[l][0] for l in langs], np.int64)
            sm = np.asarray([self.m[l][1] for l in langs], np.int64)
            sq = np.asarray([self.m[l][2] for l in langs], np.int64)
            smf = sm.astype(np.float64)
            z = (x - smf / n) / np.sqrt((sq - smf * sm / n) / (n - 1))
            return pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "lang": langs, "n_chars": x, "z": z})

    return ds.map_batches(Z, batch_format="pandas", concurrency=2)


@register("weighted_sample", sql="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                     1, 16))::UBIGINT AS DOUBLE)
                / 18446744073709551616.0) / n_chars AS k
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, n_chars, k
    FROM keyed ORDER BY k DESC, doc_id LIMIT 50""")
def weighted_sample(sf_dir: str):
    """Distributed weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row gets key = ln(u)/w with u a PORTABLE
    md5-derived uniform and w = n_chars; the global top-k by key is an
    exact weighted sample — the data-selection primitive behind
    importance-weighted corpus subsetting. Per-block partial top-k
    (only k rows per block survive), tiny driver merge — top_spenders'
    scale shape. Deterministic (seedless md5 of the id) and therefore
    retry-idempotent AND SQL-oracle-exact: ln/division is the same
    IEEE expression tree in numpy and DuckDB."""
    from ...functions.hashing import md5_upper64_flat

    K = 50
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "n_chars"])

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_chars"].to_numpy(np.int64) > 0]
        ids = b["doc_id"].to_numpy(np.int64)
        h = md5_upper64_flat([str(i) for i in ids])
        u = h.astype(np.float64) / 18446744073709551616.0
        k = np.log(u) / b["n_chars"].to_numpy(np.int64)
        out = pd.DataFrame({"doc_id": ids,
                            "n_chars": b["n_chars"]
                            .to_numpy(np.int64), "k": k})
        out = out.sort_values(["k", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort")
        return out.head(K)

    parts = ds.map_batches(block_topk,
                           batch_format="pandas").to_pandas()
    top = parts.sort_values(["k", "doc_id"],
                            ascending=[False, True],
                            kind="mergesort").head(K)
    return top.reset_index(drop=True)


@register("doc_entropy", sql="""
    WITH d AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), c AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(w) AS tok FROM d) t
      GROUP BY doc_id, tok
    ), a AS (
      SELECT doc_id,
             CAST(sum(CAST(floor(CAST(1e6 AS DOUBLE) * c
                                 * ln(CAST(c AS DOUBLE)) + 0.5)
                           AS BIGINT)) AS BIGINT) AS s_unat,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types
      FROM c GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_types, s_unat,
           CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
           ln(CAST(n_tokens AS DOUBLE))
             - (CAST(s_unat AS DOUBLE) / CAST(1e6 AS DOUBLE))
               / CAST(n_tokens AS DOUBLE) AS entropy_nat
    FROM a""")
def doc_entropy(sf_dir: str):
    """Token Shannon entropy per document (a Gopher/CCNet-family
    quality signal: low entropy = repetitive boilerplate). Entropy =
    ln(N) - (sum_t c_t ln c_t)/N over token counts c_t.

    Float policy (bit-exact vs the oracle): each c*ln(c) term is
    rounded to INTEGER micro-nats with the shared half-away formula
    (floor(x*1e6 + 0.5); terms are >= 0) so the per-doc sum is
    fold-order-exact, and the final expression is the identical IEEE
    tree in both engines. ln comes from libm in BOTH engines: numpy's
    SIMD np.log diverges from math.log on ~22% of integer inputs
    (measured), so the engine evaluates ln through a math.log lookup
    table over the integer count domain — vectorized AND bit-identical
    to DuckDB's ln.

    Scale shape: map-only, zero shuffles; per-batch counting is one
    pandas groupby over the flattened token stream."""
    import math
    from ...stages.dedup import _tokenize

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def ent(b: pd.DataFrame) -> pd.DataFrame:
        toks = _tokenize(b["text"])
        ids = b["doc_id"].to_numpy(np.int64)
        keep = np.asarray([len(t) > 0 for t in toks])
        if not keep.any():
            return pd.DataFrame({
                "doc_id": np.empty(0, np.int64),
                "n_tokens": np.empty(0, np.int64),
                "n_types": np.empty(0, np.int64),
                "s_unat": np.empty(0, np.int64),
                "ttr": np.empty(0, np.float64),
                "entropy_nat": np.empty(0, np.float64)})
        lens = np.asarray([len(t) for t in toks if len(t)], np.int64)
        flat = np.concatenate([np.asarray(t, object)
                               for t in toks if len(t)])
        did = np.repeat(ids[keep], lens)
        cnt = pd.DataFrame({"d": did, "t": flat}) \
            .groupby(["d", "t"], sort=False).size().reset_index()
        c = cnt[0].to_numpy(np.int64)
        # libm-ln lookup over the integer count domain (see docstring)
        logtab = np.asarray(
            [0.0] + [math.log(i)
                     for i in range(1, int(max(c.max(),
                                               lens.max())) + 1)])
        terms = np.floor(1e6 * c.astype(np.float64) * logtab[c]
                         + 0.5).astype(np.int64)
        agg = pd.DataFrame({"d": cnt["d"].to_numpy(np.int64),
                            "c": c, "s": terms}) \
            .groupby("d", sort=False).agg(
                s_unat=("s", "sum"), n_tokens=("c", "sum"),
                n_types=("c", "size")).reset_index()
        n = agg["n_tokens"].to_numpy(np.int64)
        s = agg["s_unat"].to_numpy(np.int64)
        ty = agg["n_types"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": agg["d"].to_numpy(np.int64),
            "n_tokens": n, "n_types": ty, "s_unat": s,
            "ttr": ty.astype(np.float64) / n.astype(np.float64),
            "entropy_nat": logtab[n]
            - (s.astype(np.float64) / 1e6) / n.astype(np.float64)})

    return ds.map_batches(ent, batch_format="pandas")


_TOKEN_BUDGET = 1000                 # tokens kept per language


@register("token_budget", sql="""
    WITH t AS (SELECT doc_id, lang, CAST({tok} AS BIGINT) AS n_tok
               FROM documents),
    c AS (SELECT doc_id, lang, n_tok,
                 sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
          FROM t)
    SELECT doc_id, lang, n_tok, CAST(cum AS BIGINT) AS cum_tok,
           cum <= {B} AS kept
    FROM c""".format(tok=text_stats_sql("text")["n_tokens"],
                     B=_TOKEN_BUDGET))
def token_budget(sf_dir: str):
    """Per-language token-budget selection (the 'take the first N
    tokens of each language' mixing primitive): docs are consumed in
    doc_id order within each lang and kept while the running token
    total stays inside the budget. All integer arithmetic ->
    bit-exact oracle.

    Scale shape: seq_pack's two-phase distributed prefix sum, keyed
    per (lang, doc_id-bucket): phase A pre-aggregates per-(lang,
    bucket) token totals into the guarded driver combine, which turns
    them into per-lang cumulative offsets broadcast ONCE; phase B is
    one hash exchange on bucket + partition-local sort/cumsum. Text
    never crosses the exchange."""
    from ...stages.partition import partition_map

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "text"])

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        nt = text_stats_frame(batch["text"])["n_tokens"] \
            .to_numpy(np.int64)
        return pd.DataFrame({"doc_id": ids, "lang": batch["lang"],
                             "bucket": ids // _SEQ_BUCKET,
                             "n_tok": nt})

    tok_ds = ds.map_batches(toks, batch_format="pandas")

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "bucket"], as_index=False) \
            .agg(s=("n_tok", "sum"))
        g["s"] = g["s"].astype(np.int64)
        return g

    hist = _combine_partials(
        tok_ds.map_batches(hist_partial, batch_format="pandas"),
        ["lang", "bucket"], ["s"]) \
        .sort_values(["lang", "bucket"], kind="mergesort")
    hist["off"] = (hist.groupby("lang", sort=False)["s"].cumsum()
                   - hist["s"]).astype(np.int64)
    ref = ray.put(hist[["lang", "bucket", "off"]])

    def select(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(ref)
        g = g.sort_values("doc_id", kind="mergesort")
        g["intra"] = (g.groupby(["lang", "bucket"], sort=False)
                      ["n_tok"].cumsum() - g["n_tok"]) \
            .astype(np.int64)
        g = g.merge(offs, on=["lang", "bucket"], how="left")
        cum = (g["off"].to_numpy(np.int64)
               + g["intra"].to_numpy(np.int64)
               + g["n_tok"].to_numpy(np.int64))
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "lang": g["lang"],
            "n_tok": g["n_tok"].to_numpy(np.int64),
            "cum_tok": cum, "kept": cum <= _TOKEN_BUDGET})

    return partition_map(tok_ds, ["bucket"], select, 8)


@register("returned_customers", sql="""
    SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  WHERE o.o_custkey = c.c_custkey
                    AND l.l_returnflag = 'R')""")
def returned_customers(sf_dir: str):
    """Two-hop distributed SEMI-join chain (customers with at least
    one returned lineitem): lineitem -> orders -> customer, all three
    sides large. Complements cust_no_orders (single-hop anti).

    Scale shape: TWO co-partitioning exchanges, no broadcast, no
    driver state. Hop 1 shuffles only DISTINCT returned orderkeys
    (8 bytes each, pre-deduped per block) against (orderkey, custkey)
    pairs and semi-merges per partition into distinct custkeys; hop 2
    shuffles those keys against customer rows and semi-merges
    vectorized. acctbal crosses engines as exact integer cents."""
    from ...stages.partition import partition_map

    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_returnflag"])
    cust = rd.read_parquet(_path(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(np.int64),
            "cust": b["o_custkey"].to_numpy(np.int64),
            "side": np.zeros(len(b), np.int64)})

    def returned_keys(b: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(b.loc[b["l_returnflag"] == "R", "l_orderkey"]
                      .to_numpy(np.int64))
        return pd.DataFrame({"key": k,
                             "cust": np.zeros(len(k), np.int64),
                             "side": np.ones(len(k), np.int64)})

    hop1 = orders.map_batches(order_rows, batch_format="pandas") \
        .union(li.map_batches(returned_keys, batch_format="pandas"))

    def semi_custkeys(g: pd.DataFrame) -> pd.DataFrame:
        ret = np.unique(g.loc[g["side"] == 1, "key"]
                        .to_numpy(np.int64))
        o = g[g["side"] == 0]
        hit = _sorted_member(ret, o["key"].to_numpy(np.int64))
        k = np.unique(o.loc[hit, "cust"].to_numpy(np.int64))
        return pd.DataFrame({
            "key": k, "c_nationkey": np.zeros(len(k), np.int64),
            "acctbal_cents": np.zeros(len(k), np.int64),
            "side": np.ones(len(k), np.int64)})

    keys_ds = partition_map(hop1, ["key"], semi_custkeys, 16)

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["c_custkey"].to_numpy(np.int64),
            "c_nationkey": b["c_nationkey"].to_numpy(np.int64),
            "acctbal_cents": np.round(
                b["c_acctbal"].to_numpy() * 100).astype(np.int64),
            "side": np.zeros(len(b), np.int64)})

    hop2 = cust.map_batches(cust_rows, batch_format="pandas") \
        .union(keys_ds)

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        has = np.unique(g.loc[g["side"] == 1, "key"]
                        .to_numpy(np.int64))
        c = g[g["side"] == 0]
        keep = _sorted_member(has, c["key"].to_numpy(np.int64))
        out = c.loc[keep, ["key", "c_nationkey", "acctbal_cents"]]
        return out.rename(columns={"key": "c_custkey"})

    return partition_map(hop2, ["key"], semi, 16)


@register("decontaminate_semantic", sql="""
    WITH b AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % 97 = 0),
         c AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % 97 <> 0),
         m AS (SELECT c.vec_id,
                      max(list_cosine_similarity(
                          CAST(c.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[]))) AS s
               FROM c CROSS JOIN b GROUP BY c.vec_id)
    SELECT vec_id, round(s, 6) AS max_sim,
           round(s, 6) >= 0.35 AS contaminated
    FROM m""")
def decontaminate_semantic(sf_dir: str):
    """Embedding-space benchmark decontamination (the semantic
    complement of the n-gram ``decontaminate`` pass): flag every
    corpus vector whose cosine similarity to ANY benchmark vector
    (deterministic holdout vec_id % 97 == 0) reaches the near-dup
    threshold. Paraphrased eval contamination survives n-gram checks;
    this catches it.

    Scale shape: the benchmark matrix is small by definition —
    normalized rows are ``ray.put`` ONCE and every batch does one
    BLAS matmul + row-max against it (ann_bruteforce's broadcast
    design); map-only, no shuffle. The decision threshold compares
    the round-6 similarity on both sides (the repo's ANN float
    convention)."""
    from ...stages.ann import _norm_rows, _stack

    # Benchmark matrix gathered DISTRIBUTED: tasks filter to the
    # holdout rows and only those cross to the driver, under a
    # guarded pull (never the whole embeddings table).
    bds = rd.read_parquet(_path(sf_dir, "embeddings"),
                          columns=["vec_id", "embedding"])

    def bench_part(b: pa.Table) -> pa.Table:
        v = b["vec_id"].to_numpy().astype(np.int64)
        return b.filter(pa.array(v % 97 == 0))

    bench = bds.map_batches(bench_part, batch_format="pyarrow") \
        .limit(_BENCH_VEC_MAX + 1) \
        .take_batch(_BENCH_VEC_MAX + 1, batch_format="pyarrow")
    if bench.num_rows > _BENCH_VEC_MAX:
        raise ValueError(
            "decontaminate_semantic: > %d benchmark vectors — too "
            "large to broadcast exactly" % _BENCH_VEC_MAX)
    if bench.num_rows == 0:
        raise ValueError("decontaminate_semantic: empty benchmark")
    bmat = _norm_rows(_stack(bench["embedding"]))
    if bmat.nbytes > (256 << 20):
        raise ValueError("decontaminate_semantic: benchmark matrix too"
                         " large to broadcast; use the LSH tier")
    bref = ray.put(bmat)

    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    class MaxSim:
        def __init__(self):
            self.b = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            keep = (ids % 97) != 0
            if not keep.any():
                return pd.DataFrame({
                    "vec_id": np.empty(0, np.int64),
                    "max_sim": np.empty(0, np.float64),
                    "contaminated": np.empty(0, bool)})
            mat = _norm_rows(_stack(batch["embedding"]))[keep]
            s = np.round((mat @ self.b.T).max(axis=1), 6)
            return pd.DataFrame({"vec_id": ids[keep], "max_sim": s,
                                 "contaminated": s >= 0.35})

    return ds.map_batches(MaxSim, batch_format="pyarrow",
                          concurrency=2, batch_size=4096)


@register("corpus_profile", sql="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(min(length(text)) AS BIGINT) AS min_chars,
           CAST(max(length(text)) AS BIGINT) AS max_chars,
           CAST(sum(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
           CAST(sum(length(text)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_chars
    FROM documents""")
def corpus_profile(sf_dir: str):
    """One-pass dataset profiling (the data card a curation run emits
    before/after each stage): row count, distinct langs/sources, char
    totals and extrema, empty-doc count, mean length.

    Scale shape: each block reduces to ONE partial row (counts, sums,
    extrema, and the block's distinct lang/source sets — bounded
    enumerable vocabularies); the driver folds the tiny partials.
    avg_chars is exact-integer sum / count with ONE final division —
    order-exact in both engines. No shuffle, no materialization."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text", "lang", "source"])

    def partial(b: pa.Table) -> pd.DataFrame:
        ln = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        trimmed = pc.utf8_trim(b["text"], characters=" \t\n\r\f")
        empt = int(pc.sum(pc.cast(pc.equal(trimmed, ""),
                                  pa.int64())).as_py() or 0)
        return pd.DataFrame({
            "n": [len(b)], "total": [int(ln.sum())],
            "mn": [int(ln.min())], "mx": [int(ln.max())],
            "n_empty": [empt],
            "langs": [",".join(sorted(set(
                b["lang"].to_pylist())))],
            "sources": [",".join(sorted(set(
                b["source"].to_pylist())))]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        raise ValueError("corpus_profile: empty input")
    langs: set = set()
    sources: set = set()
    for s in parts["langs"]:
        langs.update(s.split(","))
    for s in parts["sources"]:
        sources.update(s.split(","))
    n = int(parts["n"].sum())
    total = int(parts["total"].sum())
    return pd.DataFrame({
        "n_docs": pd.array([n], "int64"),
        "n_langs": pd.array([len(langs)], "int64"),
        "n_sources": pd.array([len(sources)], "int64"),
        "total_chars": pd.array([total], "int64"),
        "min_chars": pd.array([int(parts["mn"].min())], "int64"),
        "max_chars": pd.array([int(parts["mx"].max())], "int64"),
        "n_empty": pd.array([int(parts["n_empty"].sum())], "int64"),
        "avg_chars": [float(total) / float(n)]})


# PII scrub rules, applied IN ORDER (later patterns see earlier
# replacements). pyarrow.compute and DuckDB both run RE2, so one
# pattern string drives both engines with identical match semantics.
# The name rule is a dictionary rule (real scrubbers run those too) so
# the op has live matches on the synthetic vocab corpus; email/ip are
# the standard C4/Dolma scrub patterns.
_PII_RULES: list[tuple[str, str, str]] = [
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("n_ips", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("n_names", r"\bcustomer\b", "<NAME>"),
]


def _pii_sql() -> str:
    """Oracle: the same RE2 rules as sequential regexp_replace stages;
    per-stage match counts via split-array length (non-overlapping
    left-to-right, exactly RE2 replace semantics)."""
    sql = "WITH s0 AS (SELECT doc_id, text AS t0 FROM documents)"
    counts = []
    for i, (cnt, pat, rep) in enumerate(_PII_RULES):
        counts.append(cnt)
        keep = ", ".join(counts[:-1])
        sql += (
            ", s{i1} AS (SELECT doc_id{keep},"
            " len(regexp_split_to_array(t{i0}, '{pat}')) - 1 AS {cnt},"
            " regexp_replace(t{i0}, '{pat}', '{rep}', 'g') AS t{i1}"
            " FROM s{i0})").format(
                i0=i, i1=i + 1, pat=pat, rep=rep, cnt=cnt,
                keep=(", " + keep) if keep else "")
    total = " + ".join(counts)
    return sql + (
        " SELECT doc_id, t{n} AS clean_text, "
        + ", ".join("CAST(%s AS BIGINT) AS %s" % (c, c)
                    for c in counts)
        + ", CAST({total} AS BIGINT) AS n_redactions FROM s{n}"
    ).format(n=len(_PII_RULES), total=total)


@register("pii_redact", sql=_pii_sql())
def pii_redact(sf_dir: str):
    """PII / dictionary scrubbing (C4, Dolma, CCNet all run this pass):
    sequentially replace emails, IPv4s, and dictionary-name tokens
    with typed placeholders, reporting per-rule match counts.

    Scale shape: pure map-only — zero shuffles, zero driver state.
    Each rule is ONE vectorized RE2 kernel pair per batch
    (``pc.count_substring_regex`` + ``pc.replace_substring_regex``)
    over zero-copy Arrow batches; rules compile once inside the
    kernel. At 100 TB this stage streams at read speed."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch["text"]
        cols: dict = {"doc_id": batch["doc_id"]}
        total = None
        for cnt, pat, rep in _PII_RULES:
            n = pc.cast(pc.count_substring_regex(txt, pattern=pat),
                        pa.int64())
            cols[cnt] = n
            total = n if total is None else pc.add(total, n)
            txt = pc.replace_substring_regex(txt, pattern=pat,
                                             replacement=rep)
        cols["clean_text"] = txt
        cols["n_redactions"] = total
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")


#: C4/Dolma-style token blocklist ("bad words" filter): a document
#: containing ANY blocklisted token is dropped from the training mix.
#: Tokens drawn from the synthetic vocabulary so both outcomes occur.
_BLOCKLIST = ("dup", "skew", "spill")


@register("blocklist_filter", sql="""
    WITH d AS (
      SELECT doc_id, lang,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents)
    SELECT doc_id, lang,
           CAST(len(list_filter(w, x -> list_contains(
               ['{b0}', '{b1}', '{b2}'], x))) AS BIGINT) AS n_blocked,
           len(list_filter(w, x -> list_contains(
               ['{b0}', '{b1}', '{b2}'], x))) = 0 AS kept
    FROM d""".format(b0=_BLOCKLIST[0], b1=_BLOCKLIST[1],
                     b2=_BLOCKLIST[2]))
def blocklist_filter(sf_dir: str):
    """Token-blocklist document filter (the C4 "bad words" pass):
    count blocklisted tokens per document and flag survivors, keeping
    the count as an audit column (the gopher_rules convention).

    Scale shape: stateless map-only — tokens flatten once per batch,
    membership is ONE sorted-array probe over the flattened stream
    (np.searchsorted against the sorted blocklist, the decontaminate
    probe), per-doc counts come from cumsum differences. No shuffle,
    no driver state; a real blocklist (thousands of terms) broadcasts
    once via ray.put the same way."""
    from ...stages.dedup import _tokenize

    bl = np.sort(np.asarray(_BLOCKLIST, dtype=object))
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        toks = _tokenize(b["text"])
        sizes = np.fromiter((len(t) for t in toks), np.int64,
                            len(toks))
        flat = np.asarray([w for t in toks for w in t], dtype=object)
        memb = (_sorted_member(bl, flat).astype(np.int64)
                if len(flat) else np.empty(0, np.int64))
        cs = np.concatenate(([0], np.cumsum(memb)))
        off = np.concatenate(([0], np.cumsum(sizes)))
        nb = (cs[off[1:]] - cs[off[:-1]]).astype(np.int64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "lang": b["lang"].to_numpy(),
            "n_blocked": nb,
            "kept": nb == 0})

    return ds.map_batches(fn, batch_format="pandas")


#: docs kept per language by lang_balanced_sample
_BALANCE_K = 40


@register("lang_balanced_sample", sql="""
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || ':bal'),
                          doc_id) AS rk
      FROM documents)
    WHERE rk <= {k}""".format(k=_BALANCE_K))
def lang_balanced_sample(sf_dir: str):
    """Language-balanced deterministic subset: exactly K documents per
    language, chosen by a seeded md5 permutation — the per-language
    quota step of balancing a multilingual training mix (a hot
    language would otherwise drown the tail languages). Reproducible
    across retries and oracle-exact (the epoch_shuffle hash order).

    Scale shape: per-block partial top-K per language (each block
    shrinks to <= langs x K rows BEFORE the exchange), then one
    lang-hash exchange and a per-partition final top-K + rank — the
    topk_per_group plan with the md5 permutation as the sort key."""
    from ...functions.hashing import md5_id64_flat
    from ...stages.partition import partition_map

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "doc_id"])

    def keyed_topk(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        h_hi, h_lo = md5_id64_flat(ids, ":bal")
        d = pd.DataFrame({"lang": b["lang"].to_numpy(),
                          "doc_id": ids, "h_hi": h_hi, "h_lo": h_lo})
        d = d.sort_values(["h_hi", "h_lo", "doc_id"], kind="mergesort")
        return d.groupby("lang", sort=False).head(_BALANCE_K)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h_hi", "h_lo", "doc_id"], kind="mergesort")
        g = g.groupby("lang", sort=False).head(_BALANCE_K).copy()
        g["rk"] = g.groupby("lang", sort=False).cumcount() \
            .to_numpy(np.int64) + 1
        return g[["lang", "doc_id", "rk"]]

    return partition_map(ds.map_batches(keyed_topk,
                                        batch_format="pandas"),
                         ["lang"], final_topk, 8)
