# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_COMBINE_MAX_ROWS, _combine_partials, _events, _path, np, partition_map, partitioned_apply, pd, rd, register)

_BASKET_MIN_SUPPORT = 2
_TENC_SMOOTH = 20.0


@register("doc_readability", sql="""
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                 AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                 AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                 AS BIGINT) AS n_syllables
      FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE)
                        / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE)
                       / CAST(greatest(n_words, 1) AS DOUBLE))
               AS flesch
    FROM c ORDER BY doc_id""")
def doc_readability(sf_dir: str):
    """Flesch reading-ease per document with the standard vowel-group
    syllable heuristic — the readability feature quality classifiers
    and curricula bucket on. Stateless row-local map: three compiled
    regex counts per text (words, sentence terminators, vowel
    groups), zero shuffles, and the score composed in the identical
    operation order in both engines (two divisions, then the fused
    subtract) so doubles agree bit-for-bit before the driver's
    round(6)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].astype(str)
        words = t.str.count(r"\S+").to_numpy(np.int64)
        sents = np.maximum(
            t.str.count(r"[.!?]+").to_numpy(np.int64), 1)
        syll = t.str.lower().str.count(
            r"[aeiouy]+").to_numpy(np.int64)
        flesch = (206.835
                  - 1.015 * (words.astype(np.float64)
                             / sents.astype(np.float64))
                  - 84.6 * (syll.astype(np.float64)
                            / np.maximum(words, 1).astype(np.float64)))
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "n_words": words, "n_sentences": sents,
            "n_syllables": syll, "flesch": flesch})

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id",
                           kind="mergesort").reset_index(drop=True)


def _basket_grain(sf_dir: str):
    """Per-batch-distinct (l_orderkey, l_partkey) Dataset — the shared
    scan grain behind the whole basket family (edges, marginals,
    order counts). Batch-local dedup only; global distinctness is
    finished inside whichever key-partition consumes it."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def dedup(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
        }).drop_duplicates(ignore_index=True)

    return ds.map_batches(dedup, batch_format="pandas")


def _basket_edges(sf_dir: str, grain=None):
    """Support-filtered co-order pair Dataset (part_a < part_b,
    n_orders >= _BASKET_MIN_SUPPORT) — the shared edge-building
    pipeline behind basket_pairs, basket_lift and triangle_count.
    TWO bounded hash exchanges; see basket_pairs for the scale
    argument. Pass a (possibly materialized) ``_basket_grain``
    Dataset via ``grain`` to share the lineitem scan with other
    consumers instead of re-reading it."""
    if grain is None:
        grain = _basket_grain(sf_dir)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        c = m.groupby(["l_partkey_x", "l_partkey_y"],
                      as_index=False).agg(n=("l_orderkey", "size"))
        return pd.DataFrame({
            "part_a": c["l_partkey_x"].to_numpy(np.int64),
            "part_b": c["l_partkey_y"].to_numpy(np.int64),
            "n": c["n"].to_numpy(np.int64)})

    def support(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["part_a", "part_b"], as_index=False)["n"].sum()
        t = t[t["n"] >= _BASKET_MIN_SUPPORT]
        return pd.DataFrame({
            "part_a": t["part_a"].to_numpy(np.int64),
            "part_b": t["part_b"].to_numpy(np.int64),
            "n_orders": t["n"].to_numpy(np.int64)})

    per_order = partitioned_apply(grain, "l_orderkey", pairs, 16)
    return partition_map(per_order, ["part_a", "part_b"], support, 16)


def _basket_fused(sf_dir: str):
    """ONE orderkey exchange feeding the whole basket family: returns
    ``(edges_ds, marg_df, n_orders)`` — the support-filtered pair
    edges, the per-part distinct-order marginals (part-dimension
    pandas frame, sorted by l_partkey), and the global distinct-order
    count. After the orderkey exchange every order is whole and
    partition-local, so all three are computable in the SAME
    per-partition pass: pair partials (C(order_size,2) enumeration),
    marginal partials (distinct orders containing each part — additive
    because orders never span partitions), and the distinct-order
    count (additive for the same reason). basket_lift previously paid
    two extra full-grain exchanges for the marginals and the count;
    here they ride the pair exchange as dimension-sized tagged rows.
    The tagged output is materialized once and split by kind with
    zero-copy Arrow filters; only the pair partials take a second
    (pair-keyed) exchange, and the marginal partials one
    dimension-sized partkey exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc

    grain = _basket_grain(sf_dir)

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        c = m.groupby(["l_partkey_x", "l_partkey_y"],
                      as_index=False).agg(n=("l_orderkey", "size"))
        mc = g.groupby("l_partkey", as_index=False).agg(
            n=("l_orderkey", "size"))
        return pd.concat([
            pd.DataFrame({
                "kind": np.zeros(len(c), np.int8),
                "a": c["l_partkey_x"].to_numpy(np.int64),
                "b": c["l_partkey_y"].to_numpy(np.int64),
                "n": c["n"].to_numpy(np.int64)}),
            pd.DataFrame({
                "kind": np.ones(len(mc), np.int8),
                "a": mc["l_partkey"].to_numpy(np.int64),
                "b": np.zeros(len(mc), np.int64),
                "n": mc["n"].to_numpy(np.int64)}),
            pd.DataFrame({
                "kind": np.full(1, 2, np.int8),
                "a": np.zeros(1, np.int64),
                "b": np.zeros(1, np.int64),
                "n": np.array([g["l_orderkey"].nunique()],
                              np.int64)}),
        ], ignore_index=True)

    tagged = partitioned_apply(grain, "l_orderkey", per_order,
                               16).materialize()

    def _only(kind: int, rename: dict[str, str]):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["kind"], kind))
            t = t.drop_columns(
                ["kind"] + [c for c in ("a", "b")
                            if c not in rename])
            return t.rename_columns(
                [rename.get(c, c) for c in t.column_names])
        return f

    def support(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["part_a", "part_b"], as_index=False)["n"].sum()
        t = t[t["n"] >= _BASKET_MIN_SUPPORT]
        return pd.DataFrame({
            "part_a": t["part_a"].to_numpy(np.int64),
            "part_b": t["part_b"].to_numpy(np.int64),
            "n_orders": t["n"].to_numpy(np.int64)})

    edges = partition_map(
        tagged.map_batches(_only(0, {"a": "part_a", "b": "part_b"}),
                           batch_format="pyarrow"),
        ["part_a", "part_b"], support, 16)

    def marg_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_partkey", as_index=False)["n"].sum()
        return out.astype({"l_partkey": np.int64, "n": np.int64})

    marg = partition_map(
        tagged.map_batches(_only(1, {"a": "l_partkey"}),
                           batch_format="pyarrow"),
        ["l_partkey"], marg_sum, 16).to_pandas()
    if len(marg) > 20_000_000:
        raise ValueError(
            "_basket_fused: part dimension too large to broadcast "
            "(%d rows); shard the lift/similarity attach by part-key "
            "join instead" % len(marg))
    marg = marg.sort_values("l_partkey", kind="mergesort",
                            ignore_index=True)

    n_orders = int(tagged.map_batches(
        _only(2, {}), batch_format="pyarrow").to_pandas()["n"].sum())
    return edges, marg, n_orders


@register("basket_pairs", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM d a JOIN d b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b""")
def basket_pairs(sf_dir: str):
    """Market-basket pair mining: part pairs co-ordered in >= 2
    distinct orders — the co-occurrence support census behind
    association rules and complementary-item features. Scale plan:
    TWO bounded hash exchanges. Exchange 1 co-locates each order's
    (distinct) parts; pair enumeration is vectorized per ORDER via a
    C merge of the partition frame with itself on orderkey (order
    sizes are bounded, so the blow-up is C(size,2) per order, never
    quadratic in the partition). Each partition emits per-pair
    partial counts; exchange 2 co-locates pair keys to finish the
    count and apply the support filter — pair cardinality is
    fact-sized, so no driver combine."""
    out = _basket_edges(sf_dir).to_pandas()
    return out.sort_values(["n_orders", "part_a", "part_b"],
                           ascending=[False, True, True],
                           kind="mergesort").reset_index(drop=True)


@register("target_encode", sql="""
    WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n_chars) AS BIGINT) AS s
               FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tn,
                 CAST(sum(s) AS DOUBLE) AS ts FROM g)
    SELECT source, n_docs,
           CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE) AS raw_mean,
           (CAST(s AS DOUBLE) + 20.0 * (ts / tn))
             / (CAST(n_docs AS DOUBLE) + 20.0) AS encoded
    FROM g, t ORDER BY source""")
def target_encode(sf_dir: str):
    """Smoothed target (mean) encoding of a categorical column — the
    classic feature-engineering transform: each category's target
    mean shrunk toward the global mean by a pseudo-count prior, so
    rare categories don't memorize noise. Per-batch (source, n, sum)
    integer partials, one tiny combine, and the smoothing formula
    composed in the identical order in both engines (global mean
    first, then one fused (s + m*gm)/(n + m) per category)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("source", as_index=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum"))
        g["n"] = g["n"].astype(np.int64)
        g["s"] = g["s"].astype(np.int64)
        return g

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["n", "s"])
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    gmean = np.float64(int(s.sum())) / np.float64(int(n.sum()))
    nf = n.astype(np.float64)
    sf_ = s.astype(np.float64)
    out = pd.DataFrame({
        "source": g["source"].astype(object),
        "n_docs": n,
        "raw_mean": sf_ / nf,
        "encoded": (sf_ + _TENC_SMOOTH * gmean) / (nf + _TENC_SMOOTH)})
    return out.sort_values("source",
                           kind="mergesort").reset_index(drop=True)


@register("feature_scale", sql="""
    WITH b AS (SELECT lang, CAST(min(n_chars) AS BIGINT) AS lo,
                      CAST(max(n_chars) AS BIGINT) AS hi
               FROM documents GROUP BY lang)
    SELECT doc_id, d.lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CASE WHEN hi = lo THEN 0.0
                ELSE CAST(n_chars - lo AS DOUBLE)
                     / CAST(hi - lo AS DOUBLE) END AS scaled
    FROM documents d JOIN b USING (lang) ORDER BY doc_id""")
def feature_scale(sf_dir: str):
    """Per-group min-max feature scaling: each document's length
    normalized to [0, 1] within its language — the unit-range
    rescale every tabular feature pipeline applies before mixing
    features of different magnitudes. Two passes, zero shuffles:
    per-batch (lang, min, max) partials collapse to a tiny combine,
    the bounds broadcast back as a dict, and the scaled value is one
    vectorized int-subtract + divide per batch (degenerate
    single-value groups map to 0.0 in both engines)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])

    def bounds(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("lang", as_index=False).agg(
            lo=("n_chars", "min"), hi=("n_chars", "max"))
        return g.astype({"lo": np.int64, "hi": np.int64})

    parts = ds.map_batches(bounds, batch_format="pandas")
    pdf = parts.limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(pdf) > _COMBINE_MAX_ROWS:
        raise ValueError(
            "feature_scale: > %d (lang, min, max) partial rows — "
            "group cardinality too high for a driver combine; use "
            "stages.partition.partition_map" % _COMBINE_MAX_ROWS)
    pdf = pdf.groupby("lang", as_index=False).agg(
        lo=("lo", "min"), hi=("hi", "max"))
    lo = dict(zip(pdf["lang"], pdf["lo"].astype(np.int64)))
    hi = dict(zip(pdf["lang"], pdf["hi"].astype(np.int64)))

    def scale(b: pd.DataFrame) -> pd.DataFrame:
        l = b["lang"].map(lo).to_numpy(np.int64)
        h = b["lang"].map(hi).to_numpy(np.int64)
        x = b["n_chars"].to_numpy(np.int64)
        span = h - l
        scaled = np.where(span == 0, 0.0,
                          (x - l).astype(np.float64)
                          / np.where(span == 0, 1, span)
                          .astype(np.float64))
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "lang": b["lang"].astype(object),
            "n_chars": x, "scaled": scaled})

    out = ds.map_batches(scale, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id",
                           kind="mergesort").reset_index(drop=True)


@register("time_features", sql="""
    SELECT event_id,
           CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(month(ts) AS BIGINT) AS month,
           sin(2 * pi() * CAST(hour(ts) AS DOUBLE) / 24.0) AS hour_sin,
           cos(2 * pi() * CAST(hour(ts) AS DOUBLE) / 24.0) AS hour_cos
    FROM events ORDER BY event_id""")
def time_features(sf_dir: str):
    """Calendar + cyclical time features: ISO day-of-week, hour,
    month, and the sin/cos embedding of hour-of-day that lets linear
    models see 23:00 and 01:00 as neighbors — the standard temporal
    feature block. Stateless vectorized map (datetime64 field
    extraction + a 24-entry trig table), zero shuffles; the trig
    arguments are composed identically (2*pi*h/24) in both engines
    so the doubles agree before the driver's round(6)."""
    ds = _events(sf_dir, columns=["event_id", "ts"])

    hours = np.arange(24, dtype=np.float64)
    hsin = np.sin(2 * np.pi * hours / 24.0)
    hcos = np.cos(2 * np.pi * hours / 24.0)

    def feats(b: pd.DataFrame) -> pd.DataFrame:
        h = b["ts"].dt.hour.to_numpy(np.int64)
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(np.int64),
            "dow": b["ts"].dt.dayofweek.to_numpy(np.int64) + 1,
            "hour": h,
            "month": b["ts"].dt.month.to_numpy(np.int64),
            "hour_sin": hsin[h], "hour_cos": hcos[h]})

    out = ds.map_batches(feats, batch_format="pandas").to_pandas()
    return out.sort_values("event_id",
                           kind="mergesort").reset_index(drop=True)
