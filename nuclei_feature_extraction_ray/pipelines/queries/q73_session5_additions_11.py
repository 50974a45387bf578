# round-5 session-5 additions, batch 11: RM1 relevance-model query
# expansion, hash-seeded replicate standard errors (deterministic
# bootstrap), and the Weiszfeld geometric median of the
# (chars, tokens) point cloud.
from __future__ import annotations

from ...functions.hashing import md5_id64_flat, tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)

_RM1_SEED = "join"
_RM1_K = 10            # feedback depth
_RM1_TOP = 15          # expansion terms returned
_REP_R = 20            # replicate count


@register("rm1_expansion", sql="""
    WITH d AS (SELECT doc_id, trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT doc_id, unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    ln_ AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len
            FROM w GROUP BY doc_id),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM w GROUP BY doc_id, term),
    hits AS (SELECT tf.doc_id,
                    CAST(tf.tf * 1000000 // ln_.len AS BIGINT)
                      AS qscore
             FROM tf JOIN ln_ ON tf.doc_id = ln_.doc_id
             WHERE tf.term = '{seed}'),
    top AS (SELECT doc_id, qscore FROM hits
            ORDER BY qscore DESC, doc_id LIMIT {k}),
    ex AS (SELECT tf.term,
                  CAST(sum(top.qscore
                           * (tf.tf * 1000000 // ln_.len))
                       AS BIGINT) AS weight
           FROM top JOIN tf ON tf.doc_id = top.doc_id
                    JOIN ln_ ON ln_.doc_id = top.doc_id
           WHERE tf.term <> '{seed}'
           GROUP BY tf.term)
    SELECT term, weight,
           CAST(row_number() OVER (ORDER BY weight DESC, term)
                AS BIGINT) AS rnk
    FROM ex ORDER BY weight DESC, term LIMIT {t}""".format(
    seed=_RM1_SEED, k=_RM1_K, t=_RM1_TOP))
def rm1_expansion(sf_dir: str):
    """RM1 RELEVANCE-MODEL query expansion (Lavrenko-Croft
    pseudo-relevance feedback): retrieve the top-{k} documents for
    the seed term '{seed}' by relative frequency, then weight every
    co-occurring term by sum_d score(d) * P(term|d) and return the
    top-{t} expansion terms — the feedback operator a retrieval
    pipeline (bm25_scores/rrf_fusion family) runs to widen recall.
    Both the retrieval score and P(term|d) are EXACT integer floor
    divisions (tf*1e6 // len), so ranking and weights are
    bit-identical with zero float concerns. Scale plan: pass 1 emits
    per-batch local top-{k} seed hits (k x blocks rows merge on the
    driver — the topk combiner shape); pass 2 re-streams only the
    {k} broadcast feedback docs' tokens, a vanishing filter. The
    expansion vocabulary is bounded by {k} doc lengths."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def seed_hits(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        doc = np.repeat(np.arange(len(b), dtype=np.int64), k)
        hit = vals.to_numpy(zero_copy_only=False) == _RM1_SEED
        if not hit.any():
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "qscore": pd.Series(dtype=np.int64)})
        tf = np.bincount(doc[hit], minlength=len(b))
        ids = b["doc_id"].to_numpy(np.int64)
        m = tf > 0
        q = tf[m] * 1000000 // k[m]
        out = pd.DataFrame({"doc_id": ids[m],
                            "qscore": q.astype(np.int64)})
        return out.sort_values(["qscore", "doc_id"],
                               ascending=[False, True],
                               kind="mergesort").head(_RM1_K)

    hits = _combine_partials(
        ds.map_batches(seed_hits, batch_format="pandas"),
        ["doc_id"], ["qscore"])
    top = hits.sort_values(["qscore", "doc_id"],
                           ascending=[False, True],
                           kind="mergesort").head(_RM1_K)
    top_ids = set(top["doc_id"].map(int))
    score_of = {int(r["doc_id"]): int(r["qscore"])
                for _, r in top.iterrows()}

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        m = np.array([int(i) in top_ids for i in ids], bool)
        if not m.any():
            return pd.DataFrame({
                "term": pd.Series(dtype=object),
                "weight": pd.Series(dtype=np.int64)})
        sub = b.loc[m]
        vals, k = tokens_flat(sub["text"])
        doc = np.repeat(np.arange(len(sub), dtype=np.int64), k)
        sids = sub["doc_id"].to_numpy(np.int64)
        t = pd.DataFrame({
            "doc": doc,
            "term": vals.to_numpy(zero_copy_only=False)}) \
            .groupby(["doc", "term"], as_index=False).size()
        lens = k[t["doc"].to_numpy(np.int64)]
        qs = np.array([score_of[int(sids[d])]
                       for d in t["doc"]], np.int64)
        pw = t["size"].to_numpy(np.int64) * 1000000 // lens
        t["weight"] = qs * pw
        t = t[t["term"] != _RM1_SEED]
        g = t.groupby("term", as_index=False)["weight"].sum()
        g["weight"] = g["weight"].astype(np.int64)
        return g

    ex = _combine_partials(
        ds.map_batches(expand, batch_format="pandas"),
        ["term"], ["weight"])
    out = ex.sort_values(["weight", "term"],
                         ascending=[False, True],
                         kind="mergesort").head(_RM1_TOP) \
        .reset_index(drop=True)
    out["weight"] = out["weight"].astype(np.int64)
    out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


@register("hash_replicate_se", sql="""
    WITH o AS (SELECT o_orderkey AS k,
                      CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS x
               FROM orders),
    reps AS (SELECT CAST(unnest(generate_series(0, {rm1}))
                         AS BIGINT) AS r),
    w AS (SELECT reps.r,
                 CAST(('0x' || substr(md5(CAST(o.k AS VARCHAR)
                       || ':rep' || CAST(reps.r AS VARCHAR)),
                       1, 16))::UBIGINT % 3 AS BIGINT) AS wt,
                 o.x
          FROM o CROSS JOIN reps),
    m AS (SELECT r, CAST(sum(wt) AS BIGINT) AS sw,
                 CAST(sum(wt * x) AS HUGEINT) AS swx
          FROM w GROUP BY r),
    q AS (SELECT r,
                 CAST(floor(CAST(swx AS DOUBLE)
                            / CAST(sw AS DOUBLE)
                            * 1000000.0 + 0.5) AS BIGINT) AS mm
          FROM m),
    s AS (SELECT CAST(count(*) AS BIGINT) AS nr,
                 CAST(sum(mm) AS HUGEINT) AS sm,
                 CAST(sum(CAST(mm AS HUGEINT) * mm) AS HUGEINT)
                   AS sm2
          FROM q),
    f AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx FROM o)
    SELECT (SELECT n FROM f) AS n_orders,
           (SELECT nr FROM s) AS n_replicates,
           CAST((SELECT sx FROM f) AS DOUBLE)
             / CAST((SELECT n FROM f) AS DOUBLE) AS mean_cents,
           sqrt((CAST((SELECT sm2 FROM s) AS DOUBLE)
                 - CAST((SELECT sm FROM s) AS DOUBLE)
                   * CAST((SELECT sm FROM s) AS DOUBLE)
                   / CAST((SELECT nr FROM s) AS DOUBLE))
                / CAST((SELECT nr FROM s) - 1 AS DOUBLE))
           / 1000000.0 AS se_cents""".format(rm1=_REP_R - 1))
def hash_replicate_se(sf_dir: str):
    """HASH-SEEDED REPLICATE STANDARD ERROR of mean order value —
    the deterministic bootstrap: {r} resampling replicates where
    order o's weight in replicate r is md5(key:rep r) mod 3 (mean-1
    integer weights, the replayable-randomness policy of
    randomized_response), each replicate mean is ONE exact integer
    division, means quantize to micro units, and the across-
    replicate variance is an exact integer fold — resampling
    uncertainty with zero stored state and zero RNG, reproducible on
    any engine. Scale plan: per-batch (replicate, sum-weight,
    weighted-sum) partials — {r} x blocks tiny rows; every md5 is
    one vectorized kernel per batch per replicate."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = b["o_orderkey"].to_numpy(np.int64)
        x = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        rows = []
        for r in range(_REP_R):
            wt = (md5_id64_flat(keys, ":rep%d" % r)[0]
                  % 3).astype(np.int64)
            rows.append({"r": r, "sw": int(wt.sum()),
                         "swx": int((wt * x).sum()),
                         "n": len(b), "sx": int(x.sum())})
        return pd.DataFrame(rows)

    m = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["r"], ["sw", "swx", "n", "sx"], exact_int=True)
    mm = [int(np.floor(np.float64(int(r["swx"]))
                       / np.float64(int(r["sw"]))
                       * 1000000.0 + 0.5)) for _, r in m.iterrows()]
    nr = len(mm)
    sm = sum(mm)
    sm2 = sum(v * v for v in mm)
    n = int(m["n"].iloc[0])           # same per replicate row
    sx = int(m["sx"].iloc[0])
    se = np.sqrt((np.float64(sm2)
                  - np.float64(sm) * np.float64(sm)
                  / np.float64(nr)) / np.float64(nr - 1)) \
        / 1000000.0
    return pd.DataFrame({
        "n_orders": [np.int64(n)],
        "n_replicates": [np.int64(nr)],
        "mean_cents": [np.float64(sx) / np.float64(n)],
        "se_cents": [np.float64(se)]})


def _gm_iter_sql(mx: str, my: str) -> str:
    """One Weiszfeld update: micro-quantized 1/dist weighted sums
    over the point cloud, with exact-zero-distance points skipped
    (both engines use the same < 1e-9 guard)."""
    return """
        SELECT (CAST(sum(CAST(floor(CAST(x AS DOUBLE)
                 / sqrt((CAST(x AS DOUBLE) - ({mx}))
                        * (CAST(x AS DOUBLE) - ({mx}))
                        + (CAST(y AS DOUBLE) - ({my}))
                          * (CAST(y AS DOUBLE) - ({my})))
                 * 1000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000.0)
               / (CAST(sum(CAST(floor(1.0
                 / sqrt((CAST(x AS DOUBLE) - ({mx}))
                        * (CAST(x AS DOUBLE) - ({mx}))
                        + (CAST(y AS DOUBLE) - ({my}))
                          * (CAST(y AS DOUBLE) - ({my})))
                 * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                  / 1000000.0) AS nx,
               (CAST(sum(CAST(floor(CAST(y AS DOUBLE)
                 / sqrt((CAST(x AS DOUBLE) - ({mx}))
                        * (CAST(x AS DOUBLE) - ({mx}))
                        + (CAST(y AS DOUBLE) - ({my}))
                          * (CAST(y AS DOUBLE) - ({my})))
                 * 1000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000.0)
               / (CAST(sum(CAST(floor(1.0
                 / sqrt((CAST(x AS DOUBLE) - ({mx}))
                        * (CAST(x AS DOUBLE) - ({mx}))
                        + (CAST(y AS DOUBLE) - ({my}))
                          * (CAST(y AS DOUBLE) - ({my})))
                 * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                  / 1000000.0) AS ny
        FROM pts
        WHERE sqrt((CAST(x AS DOUBLE) - ({mx}))
                   * (CAST(x AS DOUBLE) - ({mx}))
                   + (CAST(y AS DOUBLE) - ({my}))
                     * (CAST(y AS DOUBLE) - ({my}))) >= 1e-9
    """.format(mx=mx, my=my)


@register("geometric_median", sql="""
    WITH pts AS (SELECT CAST(n_chars AS BIGINT) AS x,
                        CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f')
                                       = '' THEN 0
                             ELSE len(string_split_regex(
                                 trim(text, E' \\t\\n\\r\\f'),
                                 '[ \\t\\n\\r\\f]+')) END
                             AS BIGINT) AS y
                 FROM documents),
    m0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                    AS mx,
                  CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                    AS my
           FROM pts),
    m1 AS ({i1}),
    m2 AS ({i2})
    SELECT (SELECT n FROM m0) AS n_docs,
           (SELECT mx FROM m0) AS mu0_x,
           (SELECT my FROM m0) AS mu0_y,
           (SELECT nx FROM m1) AS mu1_x,
           (SELECT ny FROM m1) AS mu1_y,
           (SELECT nx FROM m2) AS mu2_x,
           (SELECT ny FROM m2) AS mu2_y""".format(
    i1=_gm_iter_sql("SELECT mx FROM m0", "SELECT my FROM m0"),
    i2=_gm_iter_sql("SELECT nx FROM m1", "SELECT ny FROM m1")))
def geometric_median(sf_dir: str):
    """GEOMETRIC MEDIAN of the (chars, tokens) document point cloud
    via two unrolled WEISZFELD iterations from the centroid — the
    2-D robust center minimizing summed Euclidean distance (the
    multivariate upgrade of huber_location: one outlier cluster of
    giant documents cannot drag it). Each iteration's 1/dist weights
    and weighted coordinates quantize per point (micro weights /
    milli coordinates) before EXACT integer folds, points at the
    current center are skipped by the same 1e-9 guard on both
    engines, and each new center is one shared float division pair.
    Scale plan: map-only 4-cell partials per iteration (three
    full-stream passes total); nothing row-grain leaves the
    workers."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["n_chars", "text"])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        _, k = tokens_flat(b["text"])
        x = b["n_chars"].to_numpy(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sx": np.array([int(x.sum())], np.int64),
            "sy": np.array([int(k.sum())], np.int64)})

    s = _combine_partials(
        ds.map_batches(moments, batch_format="pandas"),
        ["j"], ["n", "sx", "sy"])
    n = int(s["n"].iloc[0])
    mx = np.float64(int(s["sx"].iloc[0])) / np.float64(n)
    my = np.float64(int(s["sy"].iloc[0])) / np.float64(n)

    def iterate(cx: np.float64, cy: np.float64):
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            _, k = tokens_flat(b["text"])
            x = b["n_chars"].to_numpy(np.int64).astype(np.float64)
            y = k.astype(np.float64)
            dist = np.sqrt((x - cx) * (x - cx)
                           + (y - cy) * (y - cy))
            m = dist >= 1e-9
            wx = np.floor(x[m] / dist[m] * 1000.0
                          + 0.5).astype(np.int64)
            wy = np.floor(y[m] / dist[m] * 1000.0
                          + 0.5).astype(np.int64)
            w = np.floor(1.0 / dist[m] * 1000000.0
                         + 0.5).astype(np.int64)
            return pd.DataFrame({
                "j": np.zeros(1, np.int64),
                "swx": np.array([int(wx.sum())], np.int64),
                "swy": np.array([int(wy.sum())], np.int64),
                "sw": np.array([int(w.sum())], np.int64)})

        p = _combine_partials(
            ds.map_batches(partial, batch_format="pandas"),
            ["j"], ["swx", "swy", "sw"], exact_int=True)
        swx, swy = int(p["swx"].iloc[0]), int(p["swy"].iloc[0])
        sw = int(p["sw"].iloc[0])
        return ((np.float64(swx) / 1000.0)
                / (np.float64(sw) / 1000000.0),
                (np.float64(swy) / 1000.0)
                / (np.float64(sw) / 1000000.0))

    m1x, m1y = iterate(mx, my)
    m2x, m2y = iterate(m1x, m1y)
    return pd.DataFrame({
        "n_docs": [np.int64(n)], "mu0_x": [mx], "mu0_y": [my],
        "mu1_x": [np.float64(m1x)], "mu1_y": [np.float64(m1y)],
        "mu2_x": [np.float64(m2x)], "mu2_y": [np.float64(m2y)]})
