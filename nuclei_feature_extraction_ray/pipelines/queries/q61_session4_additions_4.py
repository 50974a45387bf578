# round-5 session-4 additions, batch 4: leave-one-out target
# encoding, Dirichlet-smoothed query-likelihood retrieval scoring,
# and the Cochran-Armitage dose-response trend test.
from __future__ import annotations

import ray

from ._shared import (_combine_partials, _path, np, pd, rd, register)


@register("loo_target_encode", sql="""
    WITH s AS (SELECT o_orderpriority AS pri,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS HUGEINT) AS sc
               FROM orders GROUP BY 1)
    SELECT o.o_orderkey,
           o.o_orderpriority,
           CAST((( s.sc - CAST(floor(o.o_totalprice * 100 + 0.5)
                               AS HUGEINT)) * 2000000 + (s.n - 1))
                // (2 * CAST(s.n - 1 AS HUGEINT)) AS BIGINT)
             AS loo_mean_micro_cents
    FROM orders o JOIN s ON o.o_orderpriority = s.pri
    WHERE s.n > 1
    ORDER BY o.o_orderkey""")
def loo_target_encode(sf_dir: str):
    """LEAVE-ONE-OUT target encoding of order priority against the
    order value: each row is encoded with the mean target of all
    OTHER rows sharing its category, (S_cat - y_row)/(n_cat - 1) —
    the leakage-safe variant of mean target encoding used before
    gradient-boosting training (target_encode's sibling; LOO removes
    the row's own label from its feature). The category sums fold as
    exact integer cents and each row's encoding quantizes to micro
    units in pure integer arithmetic — bit-exact at any scale.
    Scale plan: pass 1 is a bounded per-category (n, sum) combine;
    pass 2 broadcasts the tiny category table and encodes each batch
    vectorized — map-only, no row-grain shuffle."""
    ds = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"pri": b["o_orderpriority"],
                          "n": np.ones(len(b), np.int64),
                          "sc": cents}) \
            .groupby("pri", as_index=False).sum()
        for c in ("n", "sc"):
            g[c] = g[c].astype(np.int64)
        return g

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["pri"], ["n", "sc"], exact_int=True)
    cat = {r["pri"]: (int(r["n"]), int(r["sc"]))
           for _, r in s.iterrows()}
    ref = ray.put(cat)

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(ref)
        pri = b["o_orderpriority"].to_numpy(object)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        ns = np.array([cm[p][0] for p in pri], np.int64)
        ss = np.array([cm[p][1] for p in pri], object)
        keep = ns > 1
        enc = ((ss[keep] - cents[keep].astype(object)) * 2000000
               + (ns[keep] - 1)) // (2 * (ns[keep] - 1).astype(object))
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64)[keep],
            "o_orderpriority": pri[keep],
            "loo_mean_micro_cents": np.array(
                [int(x) for x in enc], np.int64)})

    return ds.map_batches(encode, batch_format="pandas")


_QL_TERMS = ("join", "merge", "query", "scan", "window")
_QL_MU = 300


@register("dirichlet_lm", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    stats AS (SELECT CAST(sum(len(w)) AS BIGINT) AS ctot FROM docs),
    words AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term
              FROM docs),
    cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf
           FROM words WHERE term IN ({terms}) GROUP BY term),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM words WHERE term IN ({terms}) GROUP BY 1, 2),
    grid AS (SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS dl,
                    c.term, c.cf, COALESCE(t.tf, 0) AS tf
             FROM docs d CROSS JOIN cf c
             LEFT JOIN tf t ON t.doc_id = d.doc_id
                           AND t.term = c.term),
    sc AS (SELECT doc_id, term, tf, cf, dl,
                  CAST(floor(ln((CAST(tf AS DOUBLE)
                                  * CAST((SELECT ctot FROM stats)
                                         AS DOUBLE)
                                 + CAST({mu} AS DOUBLE)
                                   * CAST(cf AS DOUBLE))
                                / ((CAST(dl AS DOUBLE)
                                    + CAST({mu} AS DOUBLE))
                                   * CAST((SELECT ctot FROM stats)
                                          AS DOUBLE)))
                             * 1000000.0 + 0.5) AS BIGINT)
                    AS score_micro
           FROM grid)
    SELECT doc_id, term, tf, cf, score_micro,
           CAST(sum(score_micro) OVER (PARTITION BY doc_id)
                AS BIGINT) AS doc_score_micro
    FROM sc ORDER BY doc_id, term""".format(
        terms=", ".join("'%s'" % t for t in _QL_TERMS), mu=_QL_MU))
def dirichlet_lm(sf_dir: str):
    """QUERY-LIKELIHOOD retrieval with DIRICHLET smoothing (Zhai &
    Lafferty '01; mu = 300) — the language-modeling counterpart of
    bm25_scores: score(q,d) = sum_t ln((tf + mu*P(t|C)) / (|d| +
    mu)), with the collection model P(t|C) = cf_t / |C|. Each term's
    log argument is a ratio of EXACT INTEGER products ((tf*|C| +
    mu*cf) / ((dl+mu)*|C|)), the ln composes identically both sides,
    and per-term scores quantize to micro units BEFORE the per-doc
    sum — so document totals are exact integer folds, immune to
    float sum order. Scale plan: pass 1 combines per-query-term
    collection frequencies + the token-count sentinel (O(|query|)
    broadcast); pass 2 is map-only vectorized scoring per batch —
    the bm25_scores two-pass shape with cf instead of df."""
    from ...stages.dedup import _tokenize
    qterms = np.asarray(_QL_TERMS, dtype=object)  # sorted
    mu = _QL_MU
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def cf_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = _tokenize(b["text"])
        cfc = np.zeros(len(qterms), np.int64)
        n_toks = 0
        for t in toks:
            if not t:
                continue
            n_toks += len(t)
            arr = np.asarray(t, dtype=object)
            i = np.clip(np.searchsorted(qterms, arr), 0,
                        len(qterms) - 1)
            hit = qterms[i] == arr
            np.add.at(cfc, i[hit], 1)
        return pd.DataFrame({
            "tid": np.concatenate([np.arange(len(qterms)),
                                   [-1]]).astype(np.int64),
            "v": np.concatenate([cfc, [n_toks]]).astype(np.int64)})

    stats = _combine_partials(
        ds.map_batches(cf_partial, batch_format="pandas"),
        ["tid"], ["v"], exact_int=True).set_index("tid")["v"]
    ctot = int(stats.get(-1, 0))
    cfs = np.asarray([int(stats.get(i, 0))
                      for i in range(len(qterms))], np.int64)
    ref = ray.put((qterms, cfs, ctot))

    class Score:
        def __init__(self):
            self.qterms, self.cfs, self.ctot = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids, dls, tfm = [], [], []
            for doc_id, t in zip(b["doc_id"].to_numpy(np.int64),
                                 _tokenize(b["text"])):
                if not t:
                    continue
                arr = np.asarray(t, dtype=object)
                i = np.clip(np.searchsorted(self.qterms, arr), 0,
                            len(self.qterms) - 1)
                hit = self.qterms[i] == arr
                row = np.zeros(len(self.qterms), np.int64)
                np.add.at(row, i[hit], 1)
                ids.append(doc_id)
                dls.append(len(t))
                tfm.append(row)
            if not ids:
                return pd.DataFrame({
                    "doc_id": pd.Series(dtype=np.int64),
                    "term": pd.Series(dtype=object),
                    "tf": pd.Series(dtype=np.int64),
                    "cf": pd.Series(dtype=np.int64),
                    "score_micro": pd.Series(dtype=np.int64),
                    "doc_score_micro": pd.Series(dtype=np.int64)})
            nq = len(self.qterms)
            ids = np.asarray(ids, np.int64)
            dl = np.asarray(dls, np.int64)
            tf = np.vstack(tfm)                      # docs x terms
            ct = np.float64(self.ctot)
            num = (tf.astype(np.float64) * ct
                   + np.float64(mu) * self.cfs.astype(np.float64))
            den = ((dl.astype(np.float64)[:, None] + np.float64(mu))
                   * ct)
            sm = np.floor(np.log(num / den) * 1000000.0
                          + 0.5).astype(np.int64)
            tot = sm.sum(axis=1)
            return pd.DataFrame({
                "doc_id": np.repeat(ids, nq),
                "term": np.tile(self.qterms, len(ids)),
                "tf": tf.reshape(-1),
                "cf": np.tile(self.cfs, len(ids)),
                "score_micro": sm.reshape(-1),
                "doc_score_micro": np.repeat(tot, nq)})

    return ds.map_batches(Score, batch_format="pandas",
                          concurrency=2)


@register("cochran_armitage", sql="""
    WITH c AS (SELECT (CAST(floor(l_quantity + 0.5) AS BIGINT) - 1)
                      // 10 AS s,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END) AS BIGINT) AS r
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
                 CAST(sum(r) AS HUGEINT) AS rr,
                 CAST(sum(s * r) AS HUGEINT) AS sr,
                 CAST(sum(s * n) AS HUGEINT) AS sn,
                 CAST(sum(s * s * n) AS HUGEINT) AS ssn
          FROM c),
    m AS (SELECT nn, rr,
                 nn * sr - rr * sn AS a,
                 nn * ssn - sn * sn AS b
          FROM t)
    SELECT CAST(nn AS BIGINT) AS n_items,
           CAST(rr AS BIGINT) AS n_returned,
           CAST(a AS BIGINT) AS a_stat,
           CAST(a * a * nn AS DOUBLE)
             / CAST(rr * (nn - rr) * b AS DOUBLE) AS z2
    FROM m""")
def cochran_armitage(sf_dir: str):
    """COCHRAN-ARMITAGE trend test: does the probability that a line
    item is RETURNED trend with its quantity bucket (scores s =
    (qty-1)//10, an ordered dose)? The trend statistic multiplied
    through by N has integer numerator A = N*sum(s_i r_i) -
    R*sum(s_i n_i) and variance denominator R(N-R)(N*sum(s_i^2 n_i)
    - sum(s_i n_i)^2)/N^3, giving Z^2 = A^2 * N / (R(N-R)B) — every
    moment an exact integer fold (python int / HUGEINT), ONE final
    double division, bit-exact. Scale plan: per-batch 5-bucket (n, r)
    cells, one bounded combine; nothing scales with corpus size."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_returnflag"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = ((np.floor(b["l_quantity"].to_numpy(np.float64) + 0.5)
              .astype(np.int64) - 1) // 10)
        ret = (b["l_returnflag"] == "R").to_numpy().astype(np.int64)
        g = pd.DataFrame({"s": s, "n": np.ones(len(b), np.int64),
                          "r": ret}).groupby("s",
                                             as_index=False).sum()
        for c in ("n", "r"):
            g[c] = g[c].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["s"], ["n", "r"], exact_int=True)
    s = [int(v) for v in c["s"]]
    n = [int(v) for v in c["n"]]
    r = [int(v) for v in c["r"]]
    nn, rr = sum(n), sum(r)
    sr = sum(a * b for a, b in zip(s, r))
    sn = sum(a * b for a, b in zip(s, n))
    ssn = sum(a * a * b for a, b in zip(s, n))
    a_stat = nn * sr - rr * sn
    b_stat = nn * ssn - sn * sn
    z2 = np.float64(a_stat * a_stat * nn) \
        / np.float64(rr * (nn - rr) * b_stat)
    return pd.DataFrame({
        "n_items": [np.int64(nn)],
        "n_returned": [np.int64(rr)],
        "a_stat": [np.int64(a_stat)],
        "z2": [z2]})
