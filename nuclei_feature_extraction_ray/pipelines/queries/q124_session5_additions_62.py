# round-5 session-5 additions, batch 62: co-shopping brand overlap
# via customer bitmasks, exact two-changepoint segmentation of the
# daily series, and the query clarity score.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, _read_dim, np, pd,
                      rd, register)
from ...stages.partition import partition_map

_CS_TOP = 5
_CL_SEED = "join"
_CL_K = 10


@register("co_shopping", sql="""
    WITH cb AS (SELECT DISTINCT o.o_custkey AS cust,
                       p.p_brand AS brand
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN part p ON l.l_partkey = p.p_partkey),
    bs AS (SELECT brand, CAST(count(*) AS BIGINT) AS n
           FROM cb GROUP BY brand),
    pair AS (SELECT a.brand AS b1, b.brand AS b2,
                    CAST(count(*) AS BIGINT) AS inter
             FROM cb a JOIN cb b ON a.cust = b.cust
                                AND a.brand < b.brand
             GROUP BY 1, 2),
    sc AS (SELECT pair.b1, pair.b2, pair.inter,
                  CAST(least(x.n, y.n) AS BIGINT) AS mn,
                  CAST(floor(CAST(pair.inter AS DOUBLE)
                       / CAST(least(x.n, y.n) AS DOUBLE)
                       * 1000000.0 + 0.5) AS BIGINT) AS ov_micro
           FROM pair JOIN bs x ON x.brand = pair.b1
                     JOIN bs y ON y.brand = pair.b2)
    SELECT b1 AS brand_a, b2 AS brand_b, inter AS shared_custs,
           CAST(ov_micro AS DOUBLE) / 1000000.0
             AS overlap_coefficient
    FROM sc ORDER BY ov_micro DESC, b1, b2 LIMIT {k}""".format(
    k=_CS_TOP))
def co_shopping(sf_dir: str):
    """CO-SHOPPING BRAND OVERLAP: the {k} brand pairs with the
    highest Szymkiewicz-Simpson overlap of customer bases
    (|A n B| / min(|A|,|B|)) — pairs whose buyers are nearly the same
    people are bundle/placement candidates, the customer-set view
    the co-purchase EDGE graph (same-order baskets) cannot see
    across orders. Per-customer brand sets collapse to BITMASK
    censuses inside one customer exchange (the
    vocab_jaccard_langs plan: brands <= 25 bits, intersections by
    popcount over mask counts — no pair of customers ever
    enumerated); overlap quantizes to micro for an exact ranking.
    Scale plan: the exact tier broadcasts the
    orderkey->custkey map under an explicit row guard (and the
    guarded part dim for brands); above the guard the documented
    path is an orderkey co-partition to attach custkeys before
    the customer exchange. Mask cells are <= 2^brands bounded."""
    part = _read_dim(_path(sf_dir, "part"),
                     ["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(np.int64)
    order_ = np.argsort(pk, kind="stable")
    pk = pk[order_]
    brands = sorted(set(part["p_brand"].to_numpy()[order_]))
    bidx = {b: i for i, b in enumerate(brands)}
    bcode = np.array([bidx[b] for b in
                      part["p_brand"].to_numpy()[order_]],
                     np.int64)

    orders = _read_dim(_path(sf_dir, "orders"),
                       ["o_orderkey", "o_custkey"],
                       max_rows=10_000_000)
    ok = orders["o_orderkey"].to_numpy(np.int64)
    oorder = np.argsort(ok, kind="stable")
    ok = ok[oorder]
    cust = orders["o_custkey"].to_numpy(np.int64)[oorder]

    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lk = b["l_orderkey"].to_numpy(np.int64)
        c = cust[np.searchsorted(ok, lk)]
        bc = bcode[np.searchsorted(
            pk, b["l_partkey"].to_numpy(np.int64))]
        return pd.DataFrame({"cust": c, "bc": bc}) \
            .drop_duplicates()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.drop_duplicates(["cust", "bc"])
        mask = a.groupby("cust")["bc"].apply(
            lambda s: int(np.bitwise_or.reduce(
                (1 << s.to_numpy(np.int64)))))
        mc = mask.value_counts()
        return pd.DataFrame({
            "mask": mc.index.to_numpy(np.int64),
            "c": mc.to_numpy(np.int64)})

    mc = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["cust"], cells, 16),
        ["mask"], ["c"])
    masks = mc["mask"].to_numpy(np.int64)
    cnts = mc["c"].to_numpy(np.int64)
    nb = len(brands)
    sizes = np.zeros(nb, np.int64)
    inter = np.zeros((nb, nb), np.int64)
    for m, c in zip(masks, cnts):
        bits = [i for i in range(nb) if (int(m) >> i) & 1]
        for i in bits:
            sizes[i] += int(c)
            for j in bits:
                if j > i:
                    inter[i, j] += int(c)
    rows = []
    for i in range(nb):
        for j in range(i + 1, nb):
            iv = int(inter[i, j])
            if iv == 0:
                continue
            mn = min(int(sizes[i]), int(sizes[j]))
            ov = int(np.floor(np.float64(iv) / np.float64(mn)
                              * 1000000.0 + 0.5))
            rows.append((ov, brands[i], brands[j], iv))
    rows.sort(key=lambda t: (-t[0], t[1], t[2]))
    top = rows[:_CS_TOP]
    return pd.DataFrame({
        "brand_a": [t[1] for t in top],
        "brand_b": [t[2] for t in top],
        "shared_custs": pd.Series([t[3] for t in top],
                                  dtype=np.int64),
        "overlap_coefficient": [np.float64(t[0]) / 1000000.0
                                for t in top]})


@register("double_changepoint", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t,
                 CAST(sum(v) OVER (ORDER BY day) AS HUGEINT)
                   AS cs,
                 CAST(sum(CAST(v AS HUGEINT) * v)
                      OVER (ORDER BY day) AS HUGEINT) AS cq
          FROM d),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(max(cs) AS HUGEINT) AS ts,
                 CAST(max(cq) AS HUGEINT) AS tq FROM x),
    seg AS (SELECT a.t AS i, b.t AS j,
            CAST(floor(CAST(a.cq AS DOUBLE)
                 - CAST(a.cs AS DOUBLE) * CAST(a.cs AS DOUBLE)
                   / CAST(a.t AS DOUBLE) + 0.5) AS HUGEINT)
            + CAST(floor(CAST(b.cq - a.cq AS DOUBLE)
                 - CAST(b.cs - a.cs AS DOUBLE)
                   * CAST(b.cs - a.cs AS DOUBLE)
                   / CAST(b.t - a.t AS DOUBLE) + 0.5) AS HUGEINT)
            + CAST(floor(CAST((SELECT tq FROM n) - b.cq
                              AS DOUBLE)
                 - CAST((SELECT ts FROM n) - b.cs AS DOUBLE)
                   * CAST((SELECT ts FROM n) - b.cs AS DOUBLE)
                   / CAST((SELECT n FROM n) - b.t AS DOUBLE)
                 + 0.5) AS HUGEINT) AS ssr
            FROM x a JOIN x b ON b.t > a.t
                             AND b.t < (SELECT n FROM n)),
    best AS (SELECT i, j, ssr,
                    row_number() OVER (ORDER BY ssr, i, j) AS r
             FROM seg)
    SELECT (SELECT n FROM n) AS n_days,
           CAST(i AS BIGINT) AS break1_t,
           CAST(j AS BIGINT) AS break2_t,
           CAST(ssr AS DOUBLE) AS total_ssr_unit
    FROM best WHERE r = 1""")
def double_changepoint(sf_dir: str):
    """EXACT TWO-CHANGEPOINT SEGMENTATION of daily revenue into
    three constant-level regimes: minimize the summed
    within-segment SSR over ALL (i < j) break pairs — the
    multi-break upgrade of volume_changepoint's single CUSUM and
    chow_test's fixed midpoint. Each segment's SSR is the closed
    form Q - S^2/len on exact integer prefix sums, quantized to
    whole units half-up, so the 2.9M-candidate argmin compares
    EXACT INTEGERS with (i, j) tie-break — no float can move a
    breakpoint. Scale plan: bounded day-domain combine; the
    O(days^2) scan (prefix-sum O(1) per candidate) is driver work
    — the day domain, not row count, bounds it."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]
    n = len(v)
    cs = [0]
    cq = [0]
    for x in v:
        cs.append(cs[-1] + x)
        cq.append(cq[-1] + x * x)

    def ssr(lo: int, hi: int) -> int:
        # segment (lo, hi]: 1-indexed prefix arrays
        ln = hi - lo
        s = cs[hi] - cs[lo]
        q = cq[hi] - cq[lo]
        return int(np.floor(np.float64(q)
                            - np.float64(s) * np.float64(s)
                            / np.float64(ln) + 0.5))

    csi = np.array(cs, np.int64)
    # cq prefixes exceed int64; carry exact (hi, lo) 32-bit halves
    # so a difference reconstructs with ONE float rounding —
    # identical to the oracle's CAST(exact HUGEINT diff AS DOUBLE).
    cq_hi = np.array([x >> 32 for x in cq], np.int64)
    cq_lo = np.array([x & 0xFFFFFFFF for x in cq], np.int64)
    jidx = np.arange(n)

    def seg_floors(i):
        j = jidx[i + 1:n]
        qd2 = (cq_hi[j] - cq_hi[i]).astype(np.float64) \
            * 4294967296.0 \
            + (cq_lo[j] - cq_lo[i]).astype(np.float64)
        sd2 = (csi[j] - csi[i]).astype(np.float64)
        qd3 = (np.int64(cq_hi[n]) - cq_hi[j]) \
            .astype(np.float64) * 4294967296.0 \
            + (np.int64(cq_lo[n]) - cq_lo[j]) \
            .astype(np.float64)
        sd3 = (csi[n] - csi[j]).astype(np.float64)
        f2 = np.floor(qd2 - sd2 * sd2
                      / (j - i).astype(np.float64) + 0.5)
        f3 = np.floor(qd3 - sd3 * sd3
                      / (n - j).astype(np.float64) + 0.5)
        return j, f2, f3

    # the exact totals exceed int64, so scan in float first and
    # exactly re-evaluate every candidate within double-ulp slack
    # of the float minimum (the floored doubles ARE the oracle's
    # summands; only their 3-way sum needs arbitrary precision)
    min_f = None
    for i in range(1, n - 1):
        s1 = ssr(0, i)
        j, f2, f3 = seg_floors(i)
        m = float(np.min(np.float64(s1) + f2 + f3))
        if min_f is None or m < min_f:
            min_f = m
    best = None
    slack = max(abs(min_f) * 1e-12, 1.0) * 8
    for i in range(1, n - 1):
        s1 = ssr(0, i)
        j, f2, f3 = seg_floors(i)
        totf = np.float64(s1) + f2 + f3
        near = np.nonzero(totf <= min_f + slack)[0]
        for k in near:
            tot = s1 + int(f2[k]) + int(f3[k])
            cand = (tot, i, int(j[k]))
            if best is None or cand < best:
                best = cand
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "break1_t": [np.int64(best[1])],
        "break2_t": [np.int64(best[2])],
        "total_ssr_unit": [np.float64(best[0])]})


@register("clarity_score", sql="""
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
    top AS (SELECT doc_id FROM hits
            ORDER BY qscore DESC, doc_id LIMIT {k}),
    fb AS (SELECT w.term, CAST(count(*) AS BIGINT) AS n
           FROM w JOIN top ON top.doc_id = w.doc_id
           GROUP BY w.term),
    fbt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM fb),
    cp AS (SELECT term, CAST(count(*) AS BIGINT) AS n
           FROM w GROUP BY term),
    cpt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cp),
    kl AS (SELECT CAST(sum(CAST(floor(
               CAST(fb.n AS DOUBLE)
               / CAST((SELECT tot FROM fbt) AS DOUBLE)
               * ln((CAST(fb.n AS DOUBLE)
                     / CAST((SELECT tot FROM fbt) AS DOUBLE))
                    / (CAST(cp.n AS DOUBLE)
                       / CAST((SELECT tot FROM cpt)
                              AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS km
          FROM fb JOIN cp ON cp.term = fb.term)
    SELECT CAST({k} AS BIGINT) AS k_docs,
           (SELECT tot FROM fbt) AS feedback_tokens,
           (SELECT km FROM kl) AS kl_sum_micro,
           CAST((SELECT km FROM kl) AS DOUBLE) / 1000000.0
             AS clarity_score""".format(seed=_CL_SEED, k=_CL_K))
def clarity_score(sf_dir: str):
    """QUERY CLARITY SCORE for the seed term '{seed}': the KL
    divergence of the top-{k} feedback documents' language model
    from the corpus language model — high clarity means the query
    retrieves a coherent topical slice (its results speak a
    sub-language), low clarity predicts poor retrieval BEFORE any
    relevance judgment exists; the query-performance-prediction
    companion of rm1_expansion (same feedback set, the divergence
    instead of the expansion terms). Retrieval scores are exact
    integer floor divisions (the rm1 ranking); both LMs are exact
    count censuses and each KL term quantizes to micro units
    half-up before the fold. Scale plan: rm1's two-pass plan —
    top-{k} merge then a feedback-restricted count pass; the KL
    join is feedback-vocabulary sized."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def seed_hits(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        doc = np.repeat(np.arange(len(b), dtype=np.int64), k)
        hit = vals.to_numpy(zero_copy_only=False) == _CL_SEED
        if not hit.any():
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "qscore": pd.Series(dtype=np.int64)})
        tf = np.bincount(doc[hit], minlength=len(b))
        ids = b["doc_id"].to_numpy(np.int64)
        m = tf > 0
        q = tf[m] * 1000000 // k[m]
        return pd.DataFrame({"doc_id": ids[m],
                             "qscore": q.astype(np.int64)}) \
            .sort_values(["qscore", "doc_id"],
                         ascending=[False, True],
                         kind="mergesort").head(_CL_K)

    hits = _combine_partials(
        ds.map_batches(seed_hits, batch_format="pandas"),
        ["doc_id"], ["qscore"])
    top = set(int(x) for x in hits.sort_values(
        ["qscore", "doc_id"], ascending=[False, True],
        kind="mergesort").head(_CL_K)["doc_id"])

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        toks = vals.to_numpy(zero_copy_only=False)
        doc = np.repeat(b["doc_id"].to_numpy(np.int64), k)
        infb = np.array([int(d_) in top for d_ in doc], bool)
        un_all = pd.Series(toks, dtype=object).value_counts()
        frames = [pd.DataFrame({
            "term": un_all.index.to_numpy(object),
            "cn": un_all.to_numpy(np.int64),
            "fn": np.zeros(len(un_all), np.int64)})]
        if infb.any():
            un_fb = pd.Series(toks[infb],
                              dtype=object).value_counts()
            frames.append(pd.DataFrame({
                "term": un_fb.index.to_numpy(object),
                "cn": np.zeros(len(un_fb), np.int64),
                "fn": un_fb.to_numpy(np.int64)}))
        out = pd.concat(frames, ignore_index=True)
        return out.groupby("term", as_index=False).sum()

    def cell(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("term", as_index=False)[["cn", "fn"]].sum()
        for c in ("cn", "fn"):
            a[c] = a[c].astype(np.int64)
        return a

    cells = _combine_partials(
        partition_map(ds.map_batches(counts, batch_format="pandas"),
                      ["term"], cell, 16),
        ["term"], ["cn", "fn"])
    ctot = int(cells["cn"].sum())
    fsub = cells[cells["fn"] > 0]
    ftot = int(fsub["fn"].sum())
    km = 0
    for _, r in fsub.iterrows():
        fn_, cn = int(r["fn"]), int(r["cn"])
        pf = np.float64(fn_) / np.float64(ftot)
        pc = np.float64(cn) / np.float64(ctot)
        km += int(np.floor(pf * np.log(pf / pc)
                           * 1000000.0 + 0.5))
    return pd.DataFrame({
        "k_docs": [np.int64(_CL_K)],
        "feedback_tokens": [np.int64(ftot)],
        "kl_sum_micro": [np.int64(km)],
        "clarity_score": [np.float64(km) / 1000000.0]})
