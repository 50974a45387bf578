# round-5 session-3 additions, batch 1: Adamic-Adar link prediction
# over the co-order graph, l-diversity privacy census, and a
# hashing-trick (feature hashing) collision census.
from __future__ import annotations

from ...functions.hashing import md5_upper64_flat, tokens_flat
from ._shared import (_combine_partials, _path, np, partition_map, pd,
                      rd, register)
from .q10_feature_engineering_readability import _basket_grain
from ...stages.partition import partitioned_apply

_AA_SUPPORT = 3        # min shared orders for a reported pair
_AA_TOPK = 50          # reported pair count
_LDIV_BUCKET = 512     # sensitive-attribute bucket width (chars)
_LDIV_L = 3            # required distinct sensitive values
_FH_BUCKETS = 512      # hashing-trick table size


@register("adamic_adar", sql="""
    WITH g AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    s AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS sz
          FROM g GROUP BY l_orderkey),
    p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, s.sz
          FROM g a JOIN g b USING (l_orderkey)
               JOIN s USING (l_orderkey)
          WHERE a.l_partkey < b.l_partkey),
    e AS (SELECT part_a, part_b,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CAST(floor(CAST(1e6 AS DOUBLE)
                                     / ln(CAST(sz AS DOUBLE)) + 0.5)
                               AS BIGINT)) AS BIGINT) AS unats
          FROM p GROUP BY part_a, part_b)
    SELECT part_a, part_b, n_orders,
           CAST(unats AS DOUBLE) / CAST(1e6 AS DOUBLE) AS adamic_adar
    FROM e WHERE n_orders >= {sup}
    ORDER BY unats DESC, part_a, part_b LIMIT {k}""".format(
    sup=_AA_SUPPORT, k=_AA_TOPK))
def adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction over the co-order part graph: for
    each part pair the score sums 1/ln(order size) over the orders
    that contain both — the classic common-neighbor index where a
    shared SMALL basket is stronger evidence than a shared huge one.
    Top-50 pairs with support >= 3. Exactness: each shared order
    contributes the integer MICRO-NAT weight floor(1e6/ln(sz)+0.5),
    summed as int64, so the score is independent of both engines'
    float fold order (the source_diversity policy); ranking ties
    break on (part_a, part_b). Scale plan: the shared
    ``_basket_grain`` scan feeds ONE orderkey exchange (orders whole
    per partition -> pair enumeration bounded by C(order size, 2)),
    then one pair-keyed exchange folds (pair, size) partials; each
    partition ships only its local top-k survivors, so the driver
    merges <= partitions x 50 rows."""
    grain = _basket_grain(sf_dir)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        g = g.assign(sz=g.groupby("l_orderkey")["l_partkey"]
                     .transform("size"))
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        c = m.groupby(["l_partkey_x", "l_partkey_y", "sz_x"],
                      as_index=False).agg(n=("l_orderkey", "size"))
        return pd.DataFrame({
            "part_a": c["l_partkey_x"].to_numpy(np.int64),
            "part_b": c["l_partkey_y"].to_numpy(np.int64),
            "sz": c["sz_x"].to_numpy(np.int64),
            "n": c["n"].to_numpy(np.int64)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        w = np.floor(1e6 / np.log(g["sz"].to_numpy(np.float64))
                     + 0.5).astype(np.int64)
        g = g.assign(unats=g["n"].to_numpy(np.int64) * w)
        t = g.groupby(["part_a", "part_b"], as_index=False).agg(
            n_orders=("n", "sum"), unats=("unats", "sum"))
        t = t[t["n_orders"] >= _AA_SUPPORT]
        t = t.sort_values(["unats", "part_a", "part_b"],
                          ascending=[False, True, True],
                          kind="mergesort").head(_AA_TOPK)
        return t

    per_order = partitioned_apply(grain, "l_orderkey", pairs, 16)
    cand = partition_map(per_order, ["part_a", "part_b"],
                         fold, 16).to_pandas()
    top = cand.sort_values(["unats", "part_a", "part_b"],
                           ascending=[False, True, True],
                           kind="mergesort").head(_AA_TOPK)
    return pd.DataFrame({
        "part_a": top["part_a"].to_numpy(np.int64),
        "part_b": top["part_b"].to_numpy(np.int64),
        "n_orders": top["n_orders"].to_numpy(np.int64),
        "adamic_adar": top["unats"].to_numpy(np.float64) / 1e6})


@register("l_diversity", sql="""
    WITH b AS (SELECT lang, source,
                      CAST(n_chars // {w} AS BIGINT) AS sens
               FROM documents)
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT sens) AS BIGINT) AS l_distinct,
           CAST(count(DISTINCT sens) >= {l} AS BOOLEAN) AS meets_l
    FROM b GROUP BY lang, source ORDER BY lang, source""".format(
    w=_LDIV_BUCKET, l=_LDIV_L))
def l_diversity(sf_dir: str):
    """l-diversity census over the k-anonymity quasi-identifier
    groups: for each (lang, source) group, the number of DISTINCT
    sensitive values (document length bucketed to 512 chars) it
    contains — k-anonymity alone leaks the sensitive attribute when a
    group is homogeneous, so release requires l >= 3 distinct values
    per group. Scale plan: per-batch distinct (lang, source, bucket)
    count partials collapse before ONE tiny driver combine (QI grid x
    bounded bucket domain rows); both n_docs (sum of counts) and l
    (distinct buckets) are exact."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "lang": b["lang"].astype(object),
            "source": b["source"].astype(object),
            "sens": b["n_chars"].to_numpy(np.int64) // _LDIV_BUCKET,
        }).groupby(["lang", "source", "sens"], as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["lang", "source", "sens", "n"]]

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "source", "sens"], ["n"])
    out = grid.groupby(["lang", "source"], as_index=False).agg(
        n_docs=("n", "sum"), l_distinct=("sens", "nunique"))
    return pd.DataFrame({
        "lang": out["lang"].astype(object),
        "source": out["source"].astype(object),
        "n_docs": out["n_docs"].to_numpy(np.int64),
        "l_distinct": out["l_distinct"].to_numpy(np.int64),
        "meets_l": out["l_distinct"].to_numpy(np.int64) >= _LDIV_L,
    }).sort_values(["lang", "source"],
                   kind="mergesort").reset_index(drop=True)


@register("feature_hash", sql="""
    WITH t AS (SELECT DISTINCT unnest(string_split_regex(
                 trim(text, E' \\t\\n\\r\\f'),
                 '[ \\t\\n\\r\\f]+')) AS term
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    h AS (SELECT CAST(('0x' || substr(md5(term), 1, 16))::UBIGINT
                      % {m} AS BIGINT) AS bkt FROM t),
    l AS (SELECT bkt, CAST(count(*) AS BIGINT) AS load FROM h
          GROUP BY bkt)
    SELECT load, CAST(count(*) AS BIGINT) AS n_buckets
    FROM l GROUP BY load
    UNION ALL
    SELECT CAST(0 AS BIGINT), CAST({m} - count(*) AS BIGINT)
    FROM l HAVING count(*) < {m}
    ORDER BY load""".format(m=_FH_BUCKETS))
def feature_hash(sf_dir: str):
    """Hashing-trick collision census: every distinct vocabulary term
    hashes (md5 upper-64) into a 512-slot feature table; the output
    is the bucket-load histogram (load -> number of buckets,
    including the empty-bucket row when any slot is unused) — the
    dimensionality/collision trade-off check run before committing to
    a hashed feature space. Scale plan: per-batch distinct terms ship
    into ONE bucket-keyed exchange (bucket = hash % 512, so a
    bucket's terms co-locate and its load is final per partition);
    each partition emits <= 512 (bucket, load) rows and the driver
    histograms a fixed 512-row frame. Vocabulary size never hits the
    driver; stopword-heavy batches still ship only distinct terms."""
    ds = rd.read_parquet(_path(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, _ = tokens_flat(b["text"])
        terms = pd.unique(pd.Series(
            vals.to_numpy(zero_copy_only=False), dtype=object))
        if len(terms) == 0:
            return pd.DataFrame({
                "bkt": pd.Series(dtype=np.int64),
                "term": pd.Series(dtype=object)})
        bkt = (md5_upper64_flat(list(terms))
               % np.uint64(_FH_BUCKETS)).astype(np.int64)
        return pd.DataFrame({"bkt": bkt,
                             "term": pd.Series(terms, dtype=object)})

    def load(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop_duplicates(["bkt", "term"]) \
            .groupby("bkt", as_index=False).size()
        return pd.DataFrame({
            "bkt": t["bkt"].to_numpy(np.int64),
            "load": t["size"].to_numpy(np.int64)})

    loads = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["bkt"], load, 16).to_pandas()
    full = np.zeros(_FH_BUCKETS, np.int64)
    full[loads["bkt"].to_numpy(np.int64)] = \
        loads["load"].to_numpy(np.int64)
    hist = pd.Series(full).value_counts().sort_index()
    return pd.DataFrame({
        "load": hist.index.to_numpy(np.int64),
        "n_buckets": hist.to_numpy(np.int64)})
