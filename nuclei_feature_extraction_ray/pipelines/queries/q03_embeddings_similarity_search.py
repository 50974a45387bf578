# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (ANN_K, ANN_QUERY_IDS, COSINE_TAU, _combine_partials, _path, _r6, ann_mod, dedup_mod, np, pa, partition_map, partitioned_apply, pd, ray, rd, register)

#: GPT-2-style pre-tokenizer pattern restricted to explicit ASCII
#: classes so Python re and DuckDB's RE2 agree match-for-match
#: (both use leftmost-first alternation; no \p classes, no \w).
_BPE_PAT = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
            r"| ?[^A-Za-z0-9 \t\n\r\f]+|[ \t\n\r\f]+")


#: bpe_merges: learned merge rules and the vocab-pull guard
_BPE_ROUNDS = 20
_BPE_VOCAB_MAX = 20_000_000


def _bpe_learn(vocab: pd.DataFrame, rounds: int) -> pd.DataFrame:
    """Classic count-weighted BPE merge learning (Sennrich et al.
    2016) over a (token, count) vocabulary: per round, count every
    adjacent symbol pair weighted by token frequency, take the argmax
    (ties -> lexicographically smallest pair), and greedily merge it
    left-to-right in every word. Deterministic — integer counts, total
    tie order, no RNG. Bounded by the VOCAB (not the corpus): this is
    the standard trainer shape, where the corpus-scale work is the
    distributed vocab collapse that precedes it."""
    words = [tuple(t) for t in vocab["token"]]
    freqs = vocab["n"].to_numpy(np.int64)
    out = {"rank": [], "left": [], "right": [], "n": []}
    for r in range(rounds):
        stats: dict = {}
        for w, f in zip(words, freqs):
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                stats[p] = stats.get(p, 0) + int(f)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, rt), n = best
        merged = l + rt
        new_words = []
        for w in words:
            if len(w) < 2:
                new_words.append(w)
                continue
            nw, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == l and w[i + 1] == rt:
                    nw.append(merged)
                    i += 2
                else:
                    nw.append(w[i])
                    i += 1
            new_words.append(tuple(nw))
        words = new_words
        out["rank"].append(r + 1)
        out["left"].append(l)
        out["right"].append(rt)
        out["n"].append(n)
    return pd.DataFrame({
        "rank": np.asarray(out["rank"], np.int64),
        "left": np.asarray(out["left"], object),
        "right": np.asarray(out["right"], object),
        "n": np.asarray(out["n"], np.int64)})


@register("bpe_merges", sql="""
    SELECT "rank", "left", "right", n
    FROM read_parquet('/root/repo/goldens/bpe_merges_sf0_01.parquet')
    ORDER BY "rank" """)
def bpe_merges(sf_dir: str):
    """BPE tokenizer TRAINING: the top merge rules learned from the
    corpus (rank, left, right, weighted pair count) — the workload
    that turns a raw corpus into a subword vocabulary.

    The merge loop is iterative (not SQL-expressible), so the driver
    oracle is a STORED GOLDEN pinned to the driver's correctness scale
    (sf0.01): tools/gen_bpe_golden.py recomputes the merge table
    independently of this engine (DuckDB vocabulary SQL + a plain
    Counter/sorted merge loop) and the oracle reads the resulting
    parquet — the embedding_pca golden pattern.

    Scale plan: phase A is the corpus-scale pass — per-batch (token,
    count) partials, ONE token exchange, and a guarded vocab pull
    (the 20M knob shared with doc_tfidf; real trainers run on exactly
    this count-collapsed table). Phase B (the merge loop) is bounded
    by VOCAB size x rounds, independent of corpus rows — state that
    fits because phase A collapsed 100 TB to a frequency table.
    Verified against an independent reference implementation in
    pytest (exact frame equality) plus determinism."""
    from ...stages.partition import partition_map
    from ...stages.dedup import _tokenize

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def tok_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in _tokenize(b["text"]):
            toks.extend(t)
        if not toks:
            return pd.DataFrame({"token": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        u, c = np.unique(np.asarray(toks, object), return_counts=True)
        return pd.DataFrame({"token": u, "n": c.astype(np.int64)})

    def tok_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", as_index=False).agg(n=("n", "sum"))
        out["n"] = out["n"].astype(np.int64)
        return out

    vocab = partition_map(
        ds.map_batches(tok_partial, batch_format="pandas"),
        ["token"], tok_combine, 16) \
        .limit(_BPE_VOCAB_MAX + 1).to_pandas()
    if len(vocab) > _BPE_VOCAB_MAX:
        raise ValueError("bpe_merges: vocabulary too large to pull; "
                         "apply a min-count cutoff first")
    vocab = vocab.sort_values("token", kind="mergesort") \
        .reset_index(drop=True)
    return _bpe_learn(vocab, _BPE_ROUNDS)


@register("doc_bpe_tokens", sql="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT)
             AS n_bpe_pieces,
           CAST(len(regexp_extract_all(text,
                '[ \\t\\n\\r\\f]+')) AS BIGINT) AS n_ws_runs
    FROM documents""".format(p=_BPE_PAT.replace("'", "''")))
def doc_bpe_tokens(sf_dir: str):
    """BPE-ish token counting (brief: 'token counting (whitespace + a
    BPE-ish regex)'): GPT-2-style pre-tokenizer piece count with an
    exact SQL oracle — compiled once at import, one findall per row."""
    import re as _re
    bpe = _re.compile(_BPE_PAT)
    ws = _re.compile(r"[ \t\n\r\f]+")
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_bpe_pieces": np.fromiter(
                (len(bpe.findall(t)) for t in texts), np.int64,
                count=len(texts)),
            "n_ws_runs": np.fromiter(
                (len(ws.findall(t)) for t in texts), np.int64,
                count=len(texts)),
        })

    return ds.map_batches(fn, batch_format="pandas")


def _normalize_sql() -> str:
    from ...functions.normalize import normalize_sql
    return normalize_sql("documents")


@register("doc_normalize", sql=_normalize_sql())
def doc_normalize(sf_dir: str):
    """Canonical text normalization (NFC + lower + whitespace collapse
    + trim) with a portable md5 fingerprint — the form a webtext
    pipeline dedups on instead of raw bytes (functions/normalize.py)."""
    from ...functions.normalize import normalize_frame
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = normalize_frame(batch["text"])
        out.insert(0, "doc_id", batch["doc_id"].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


def _dedup_normalized_sql() -> str:
    from ...functions.normalize import normalize_expr
    return """
    SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY {n}""".format(n=normalize_expr("text"))


@register("dedup_normalized", sql=_dedup_normalized_sql())
def dedup_normalized(sf_dir: str):
    """Exact dedup over the NORMALIZED text (composition of
    doc_normalize -> stages/dedup.exact_dedup): catches trivially
    re-cased / re-spaced copies raw dedup misses. Only (id, 128-bit
    hash) rows cross the shuffle — the normalized text itself never
    leaves the extract task."""
    from ...functions.normalize import normalize_series
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def add_norm(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "norm": normalize_series(batch["text"]),
        })

    return dedup_mod.exact_dedup(
        ds.map_batches(add_norm, batch_format="pandas"), "norm",
        "doc_id")


def _repetition_sql() -> str:
    from ...functions.repetition import repetition_sql
    return repetition_sql("documents")


@register("doc_repetition", sql=_repetition_sql())
def doc_repetition(sf_dir: str):
    """Gopher-style n-gram repetition features (Rae et al. 2021
    §A1.1): most-frequent-token fraction, top word-2-gram character
    coverage, duplicated word-3-gram character coverage — the
    repetition filters a webtext training pipeline removes spam with.
    Per-batch: one explode to a (doc, token) frame, all counting is
    vectorized pandas groupbys (functions/repetition.py)."""
    from ...functions.repetition import repetition_frame
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = repetition_frame(batch["text"])
        out.insert(0, "doc_id", batch["doc_id"].to_numpy())
        return out

    return ds.map_batches(fn, batch_format="pandas")


@register("doc_sample", sql="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id % 7 = 3""")
def doc_sample(sf_dir: str):
    """Deterministic systematic sampling (SURVEY §2.6 lists sampling
    as absent from the reference): a pure key-modulus predicate — the
    reproducible, retry-idempotent form of sampling a training-data
    pipeline wants (random_shuffle-based sampling is neither). Pushed
    down as a vectorized Arrow filter; no shuffle, no materialize."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 7 == 3))

    return ds.map_batches(fn, batch_format="pyarrow")


@register("quality_rank", sql="""
    SELECT doc_id, n_chars,
           CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                AS BIGINT) AS rnk
    FROM documents""")
def quality_rank(sf_dir: str):
    """Global rank (exact distributed row_number) over a total order —
    the corpus-wide quality ranking used to cut a "top-N%" training
    subset.  Ray Data has no row_number; a global ``ds.sort`` alone
    cannot assign ranks without a driver pass.

    Scale plan: two-phase rank. Phase A aggregates per-key counts
    (pre-aggregated per batch, one tiny exchange) and the driver turns
    the (bounded, guarded) key histogram into cumulative offsets,
    broadcast ONCE.  Phase B co-locates equal keys with the standard
    hash exchange and assigns rank = offset[key] + intra-key cumcount
    (vectorized, partition-local).  At web scale with high-cardinality
    keys, replace the exact histogram with sampled range boundaries —
    the two-phase shape is unchanged."""
    from ...stages.partition import partition_map

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "n_chars"])

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("n_chars", as_index=False).agg(
            n=("doc_id", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        ds.map_batches(hist_partial, batch_format="pandas"),
        ["n_chars"], ["n"])
    hist = hist.sort_values("n_chars", ascending=False,
                            kind="mergesort")
    # offset[key] = rows with a strictly greater key
    offs = np.concatenate(([0], np.cumsum(
        hist["n"].to_numpy(np.int64))[:-1]))
    keys = hist["n_chars"].to_numpy(np.int64)
    order = np.argsort(keys)
    ref = ray.put((keys[order], offs[order]))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        k, o = ray.get(ref)
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True], kind="mergesort")
        base = o[np.searchsorted(k, g["n_chars"].to_numpy(np.int64))]
        intra = g.groupby("n_chars", sort=False).cumcount().to_numpy()
        g["rnk"] = (base + intra + 1).astype(np.int64)
        return g

    return partition_map(ds, ["n_chars"], rank_part, 16)


@register("stratified_sample", sql="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id % 10 < CASE lang WHEN 'en' THEN 3 WHEN 'zh' THEN 6
                        ELSE 10 END""")
def stratified_sample(sf_dir: str):
    """Stratified (per-group-rate) deterministic sampling — the
    language-rebalancing downsample a pre-training mix needs: head
    languages are thinned (en 30%, zh 60%), tail languages kept whole.
    Same pure key-modulus predicate as doc_sample (retry-idempotent,
    no shuffle); the per-group rate is a vectorized lookup, never a
    per-group filter pass."""
    rates = {"en": 3, "zh": 6}
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["lang"].map(rates).fillna(10).to_numpy(np.int64)
        ids = batch["doc_id"].to_numpy(np.int64)
        return batch[ids % 10 < k]

    return ds.map_batches(fn, batch_format="pandas")


@register("lang_quantiles", sql="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars,
           round(quantile_cont(n_chars, 0.25), 6) AS p25,
           round(quantile_cont(n_chars, 0.50), 6) AS p50,
           round(quantile_cont(n_chars, 0.90), 6) AS p90
    FROM documents GROUP BY lang""")
def lang_quantiles(sf_dir: str):
    """Grouped EXACT quantiles (linear interpolation, the
    quantile_cont definition). Shuffle carries only (lang, n_chars) —
    two narrow columns — and each group's values land in one task, so
    this tier is for bounded values-per-group; the sketch tier below
    (lang_quantiles_approx) is the fixed-memory scale path."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "n_chars"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("lang", sort=False)["n_chars"]
        out = gb.agg(n_docs="size", min_chars="min",
                     max_chars="max").reset_index()
        for name, q in (("p25", .25), ("p50", .5), ("p90", .9)):
            out = out.merge(gb.quantile(q).rename(name).reset_index(),
                            on="lang")
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return _r6(out, ["p25", "p50", "p90"])

    return partitioned_apply(ds, "lang", fn, 8)


@register("lang_quantiles_approx")   # sketch -> accuracy-tested, no SQL
def lang_quantiles_approx(sf_dir: str):
    """Histogram-sketch quantiles (functions/sketch.hist_partial):
    per-batch fixed nbins count vectors per lang, combined by addition
    through the bounded driver combine — memory O(langs x nbins)
    regardless of row count. Error <= one bin width."""
    from ...functions.sketch import hist_partial, hist_quantile
    NBINS, LO, HI = 256, 0.0, 4096.0

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in batch.groupby("lang", sort=False):
            h = hist_partial(g["n_chars"].to_numpy(), LO, HI, NBINS)
            nz = np.flatnonzero(h)
            rows.append(pd.DataFrame(
                {"lang": lang, "bin": nz, "n": h[nz]}))
        return pd.concat(rows) if rows else pd.DataFrame(
            {"lang": pd.Series(dtype=object),
             "bin": pd.Series(dtype=np.int64),
             "n": pd.Series(dtype=np.int64)})

    combined = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "bin"], ["n"])
    out = []
    for lang, g in combined.groupby("lang", sort=False):
        h = np.zeros(NBINS, np.int64)
        h[g["bin"].to_numpy()] = g["n"].to_numpy()
        out.append({"lang": lang, "n_docs": np.int64(h.sum()),
                    "p50": hist_quantile(h, LO, HI, 0.5),
                    "p90": hist_quantile(h, LO, HI, 0.9)})
    return pd.DataFrame(out).sort_values("lang").reset_index(drop=True)


@register("custkey_distinct", sql="""
    SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkeys
    FROM orders""")
def custkey_distinct(sf_dir: str):
    """Exact distinct count: per-batch local dedup -> hash exchange of
    unique values only -> per-partition count -> driver sum
    (functions/sketch.distinct_count)."""
    from ...functions.sketch import distinct_count
    ds = rd.read_parquet(_path(sf_dir, "orders"), columns=["o_custkey"])
    return pd.DataFrame(
        {"n_custkeys": np.asarray([distinct_count(ds, "o_custkey")],
                                  np.int64)})


@register("custkey_distinct_approx")  # sketch -> rows-only check
def custkey_distinct_approx(sf_dir: str):
    """HyperLogLog approximate distinct (p=12, stderr ~1.6%):
    shuffle-free — 4 KiB register partials, driver max-merge.
    Accuracy asserted against the exact op in pytest."""
    from ...functions.sketch import approx_distinct
    ds = rd.read_parquet(_path(sf_dir, "orders"), columns=["o_custkey"])
    return pd.DataFrame(
        {"n_custkeys_approx": np.asarray(
            [approx_distinct(ds, "o_custkey")], np.int64)})


_HLL_P, _HLL_M = 12, 4096


def _hll_md5_sql(m: int = _HLL_M) -> str:
    """DuckDB twin of the md5-portable HyperLogLog below. The whole
    sketch is exact-integer until ONE final float expression: rho
    comes from the binary-string length of the low 52 hash bits (no
    float log2 anywhere), the indicator sum folds as 2^(53-rho)
    HUGEINTs (missing buckets contribute 2^53), and the estimator
    (with the standard small-range linear-counting branch) composes
    the same integers in the same order as the engine."""
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}.0))"
    raw = (f"{alpha} * {m}.0 * {m}.0 * 9007199254740992.0"
           " / CAST(s_int AS DOUBLE)")
    return f"""
    WITH h AS (SELECT md5_number_upper(CAST(o_custkey AS VARCHAR))
                      AS h FROM orders),
    b AS (SELECT (h >> 52) AS bucket,
                 (h & ((1::UBIGINT << 52) - 1)) AS w FROM h),
    r AS (SELECT bucket,
                 MAX(CASE WHEN w = 0 THEN CAST(53 AS BIGINT)
                     ELSE CAST(53 - length(bin(w)) AS BIGINT) END)
                 AS rho
          FROM b GROUP BY bucket),
    s AS (SELECT CAST(sum(1::HUGEINT << (53 - rho)) AS HUGEINT)
                 + (CAST({m} AS HUGEINT)
                    - CAST(count(*) AS HUGEINT))
                   * (1::HUGEINT << 53) AS s_int,
                 CAST({m} - count(*) AS BIGINT) AS v_zero,
                 CAST(sum(rho) AS BIGINT) AS rho_sum,
                 CAST(count(*) AS BIGINT) AS n_buckets
          FROM r)
    SELECT CASE WHEN v_zero > 0 AND {raw} <= 2.5 * {m}.0
           THEN {m}.0 * ln({m}.0 / CAST(v_zero AS DOUBLE))
           ELSE {raw} END AS est,
           v_zero, rho_sum, n_buckets FROM s"""


@register("custkey_distinct_hll_md5", sql=_hll_md5_sql())
def custkey_distinct_hll_md5(sf_dir: str):
    """HyperLogLog distinct with the PORTABLE md5 hash — the whole
    probabilistic sketch driver-oracled EXACTLY (the minhash_pairs_md5
    pattern applied to cardinality sketching): register values,
    zero-bucket count, and the final estimate are all bit-equal to the
    DuckDB twin because every step is integer until one shared float
    expression. Scale shape identical to custkey_distinct_approx:
    per-batch register partials (<= 4096 rows), shuffle-free, driver
    max-merge; rho from np.frexp exponents (exact for the 52-bit
    window — no float log2 boundary risk)."""
    m, p = _HLL_M, _HLL_P
    from ...functions.hashing import md5_id64_flat

    def partial(b: pa.Table) -> pa.Table:
        ids = b["o_custkey"].to_numpy(zero_copy_only=False)
        hv = md5_id64_flat(ids, "")[0].byteswap()   # DuckDB
        # md5_number_upper is little-endian of the first 8 digest
        # bytes; md5_id64_flat returns hex order -> byteswap back
        bucket = (hv >> np.uint64(64 - p)).astype(np.int64)
        w = hv & np.uint64((1 << (64 - p)) - 1)
        _, e = np.frexp(w.astype(np.float64))
        rho = np.where(w == 0, 64 - p + 1,
                       64 - p + 1 - e).astype(np.int64)
        df = pd.DataFrame({"bucket": bucket, "rho": rho})             .groupby("bucket", as_index=False)["rho"].max()
        return pa.table({
            "bucket": pa.array(df["bucket"].to_numpy(np.int64)),
            "rho": pa.array(df["rho"].to_numpy(np.int64))})

    parts = rd.read_parquet(_path(sf_dir, "orders"),
                            columns=["o_custkey"])         .map_batches(partial, batch_format="pyarrow")         .limit(1_000_001).to_pandas()
    if len(parts) > 1_000_000:
        raise ValueError("custkey_distinct_hll_md5: register "
                         "partials exceeded the driver bound")
    reg = parts.groupby("bucket")["rho"].max()
    s_int = (sum(1 << (53 - int(r)) for r in reg)
             + (m - len(reg)) * (1 << 53))
    v = m - len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    raw = alpha * float(m) * float(m) * 9007199254740992.0         / float(s_int)
    est = (float(m) * np.log(float(m) / float(v))
           if (v > 0 and raw <= 2.5 * m) else raw)
    return pd.DataFrame({
        "est": np.asarray([est], np.float64),
        "v_zero": np.asarray([v], np.int64),
        "rho_sum": np.asarray([int(reg.sum())], np.int64),
        "n_buckets": np.asarray([len(reg)], np.int64)})


@register("ann_cosine", sql="""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
         s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                        AS sim
               FROM q CROSS JOIN embeddings e
               WHERE e.vec_id != q.vec_id)
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           round(sim, 6) AS score
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rank FROM s)
    WHERE rank <= 5""")
def ann_cosine(sf_dir: str):
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    return ann_mod.ann_bruteforce(ds, "embedding", "vec_id",
                                  ANN_QUERY_IDS, k=ANN_K)


@register("ann_lsh")  # approximate -> rows-only; recall tested in pytest
def ann_lsh(sf_dir: str):
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    return ann_mod.ann_lsh(ds, "embedding", "vec_id", ANN_QUERY_IDS,
                           k=ANN_K)


@register("ann_ivf")  # approximate -> rows-only; recall tested in pytest
def ann_ivf(sf_dir: str):
    """IVF coarse-quantizer ANN (stages/ann.ann_ivf): sampled k-means
    centroids, block-local cell assignment, probe-cell scans only."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    return ann_mod.ann_ivf(ds, "embedding", "vec_id", ANN_QUERY_IDS,
                           k=ANN_K)


@register("embedding_near_dup_lsh")  # approximate tier -> rows-only;
def embedding_near_dup_lsh(sf_dir: str):
    """The SCALE tier of embedding near-dup: random-hyperplane bucket
    candidates + in-bucket exact verify (stages/ann.py) — flops are
    sum-of-bucket-squares instead of corpus-squared. Recall vs the
    exact tier is asserted in pytest; found pairs carry exact
    cosines."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    return ann_mod.embedding_near_dup_lsh(ds, "embedding", "vec_id",
                                          threshold=COSINE_TAU)


@register("embedding_near_dup", sql="""
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.35""")
def embedding_near_dup(sf_dir: str):
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    return ann_mod.embedding_near_dup(ds, "embedding", "vec_id",
                                      threshold=COSINE_TAU)
