# round-5 session-2 additions, batch 8: a complete TRAIN + INFER
# pipeline (multinomial Naive Bayes language classifier in exact
# integer log-space) and the consistent-hashing rebalance census
# (why rings beat mod-sharding when the shard count changes).
from __future__ import annotations

from ._shared import (ORACLE, _combine_partials, _path, np, pa,
                      partition_map, pc, pd, ray, rd, register)
from ...functions.hashing import md5_upper64_flat, tokens_flat

#: nb_lang_classify: Laplace smoothing constant
_NB_ALPHA = 1

#: ring_rebalance: shard counts compared and virtual nodes per shard
_RING_FROM = 64
_RING_TO = 65
_RING_VNODES = 32


def _micro_ln_sql(expr: str) -> str:
    e = "ln(%s)" % expr
    return ("CASE WHEN ({e}) >= 0 THEN "
            "CAST(floor(({e})*1000000.0 + 0.5) AS BIGINT) ELSE "
            "-CAST(floor(-({e})*1000000.0 + 0.5) AS BIGINT) END"
            ).format(e=e)


def _micro_ln(x: np.ndarray) -> np.ndarray:
    lx = np.log(x)
    return np.copysign(np.floor(np.abs(lx) * 1e6 + 0.5),
                       lx).astype(np.int64)


@register("nb_lang_classify", sql="""
    WITH docs AS (
      SELECT doc_id, lang,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    tok AS (SELECT doc_id, lang, unnest(w) AS token FROM docs),
    ct AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    nl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS total
           FROM ct GROUP BY 1),
    vocab AS (SELECT DISTINCT token FROM ct),
    vsz AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
    pri AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd FROM docs
            GROUP BY 1),
    tot AS (SELECT CAST(sum(nd) AS BIGINT) AS n FROM pri),
    term AS (
      SELECT l.lang, vb.token,
             {t} AS lp
      FROM nl l CROSS JOIN vocab vb CROSS JOIN vsz
      LEFT JOIN ct ON ct.lang = l.lang AND ct.token = vb.token),
    dt AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS k
           FROM tok GROUP BY 1, 2),
    sc AS (
      SELECT dt.doc_id, term.lang,
             CAST(sum(dt.k * term.lp) AS BIGINT)
               + any_value({p}) AS score
      FROM dt JOIN term USING (token)
      JOIN pri ON pri.lang = term.lang CROSS JOIN tot
      GROUP BY 1, 2),
    win AS (SELECT doc_id, lang, score, row_number() OVER (
              PARTITION BY doc_id
              ORDER BY score DESC, lang) AS rk
            FROM sc)
    SELECT w.doc_id, w.lang AS nb_lang, w.score AS score_micro,
           CAST(CASE WHEN w.lang = d.lang THEN 1 ELSE 0 END
                AS BIGINT) AS correct
    FROM win w JOIN documents d USING (doc_id)
    WHERE w.rk = 1""".format(
        t=_micro_ln_sql(
            "CAST(coalesce(ct.c, 0) + %d AS DOUBLE)"
            " / CAST(l.total + %d * vsz.v AS DOUBLE)"
            % (_NB_ALPHA, _NB_ALPHA)),
        p=_micro_ln_sql("CAST(pri.nd AS DOUBLE)"
                        " / CAST(tot.n AS DOUBLE)")))
def nb_lang_classify(sf_dir: str):
    """Multinomial NAIVE BAYES language classifier — a complete
    train + infer pipeline in one operator: token counts per language
    (Laplace alpha=1) train the model, every document is scored
    argmax_l [ln P(l) + sum_t k_t * ln P(t|l)], and the winner is
    reported with its truth agreement (the per-doc companion of
    lang_kappa's scalar). EVERY log term is quantized half-away to
    micro-nats, so scores are exact int64 sums and the argmax (ties:
    lexicographically smallest lang) cannot diverge between engines.
    Plan: (lang, token) count partials fold through one
    vocab-bounded combine; the model — |V| x |L| micro-int matrix +
    priors — broadcasts once via ray.put (the classifier analog of
    the DSIR 8 KiB LM broadcast); inference is one vectorized
    searchsorted + matmul per batch, no exchange."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text", "lang"])

    def count_part(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        langs = np.repeat(b["lang"].to_numpy(object), k)
        g = pd.DataFrame({
            "lang": langs,
            "token": vals.to_numpy(zero_copy_only=False),
            "c": np.ones(len(langs), np.int64)}) \
            .groupby(["lang", "token"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        # doc-count partials ride along with a reserved token key
        nz = k > 0
        pri = pd.DataFrame({
            "lang": b["lang"].to_numpy(object)[nz],
            "token": np.full(int(nz.sum()), "\x00docs", object),
            "c": np.ones(int(nz.sum()), np.int64)}) \
            .groupby(["lang", "token"], as_index=False).sum()
        pri["c"] = pri["c"].astype(np.int64)
        return pd.concat([g, pri], ignore_index=True)

    ct = _combine_partials(
        ds.map_batches(count_part, batch_format="pandas"),
        ["lang", "token"], ["c"])
    is_pri = ct["token"] == "\x00docs"
    pri = ct[is_pri].set_index("lang")["c"]
    ct = ct[~is_pri]
    langs = np.asarray(sorted(pri.index), object)
    vocab = np.asarray(sorted(ct["token"].unique()), object)
    V = len(vocab)
    tot_l = ct.groupby("lang")["c"].sum()
    # (V, L) micro-int log-prob matrix with Laplace smoothing
    LP = np.empty((V, len(langs)), np.int64)
    vpos = {t: i for i, t in enumerate(vocab)}
    for j, l in enumerate(langs):
        nl = int(tot_l.get(l, 0))
        col = np.full(V, float(_NB_ALPHA), np.float64)
        sub = ct[ct["lang"] == l]
        idx = np.asarray([vpos[t] for t in sub["token"]], np.int64)
        col[idx] += sub["c"].to_numpy(np.int64)
        LP[:, j] = _micro_ln(col / (nl + _NB_ALPHA * V))
    n_docs = int(pri.sum())
    prior = np.asarray([_micro_ln(np.asarray(
        [pri[l] / n_docs]))[0] for l in langs], np.int64)
    mref = ray.put((vocab, langs, LP, prior))

    class Infer:
        def __init__(self):
            self.vocab, self.langs, self.LP, self.prior = \
                ray.get(mref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            vals, k = tokens_flat(b["text"])
            keep = k > 0
            tok = vals.to_numpy(zero_copy_only=False)
            row = np.repeat(np.arange(len(k)), k)
            ti = np.searchsorted(self.vocab, tok)
            nr = len(b)
            scores = np.zeros((nr, len(self.langs)), np.int64)
            np.add.at(scores, row, self.LP[ti])
            scores += self.prior[None, :]
            best = np.argmax(scores, axis=1)   # first max = smallest
            out = pd.DataFrame({
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "nb_lang": self.langs[best],
                "score_micro": scores[np.arange(nr), best]
                    .astype(np.int64),
                "correct": (self.langs[best]
                            == b["lang"].to_numpy(object))
                    .astype(np.int64)})
            return out[keep]

    return ds.map_batches(Infer, batch_format="pandas",
                          concurrency=2)


@register("ring_rebalance", sql="""
    WITH shards AS (SELECT unnest(range(0, {s2})) AS shard),
    vn AS (SELECT unnest(range(0, {v})) AS vnode),
    ring AS (
      SELECT shard, ('0x' || substr(md5(CAST(shard AS VARCHAR) || '#'
                     || CAST(vnode AS VARCHAR)), 1, 16))::UBIGINT
               AS h
      FROM shards CROSS JOIN vn),
    d AS (SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                 1, 16))::UBIGINT AS hd
          FROM documents),
    a64 AS (
      SELECT d.doc_id,
             coalesce(arg_min(r.shard, r.h)
                        FILTER (r.h > d.hd),
                      arg_min(r.shard, r.h)) AS s
      FROM d CROSS JOIN ring r WHERE r.shard < {s1}
      GROUP BY d.doc_id, d.hd),
    a65 AS (
      SELECT d.doc_id,
             coalesce(arg_min(r.shard, r.h)
                        FILTER (r.h > d.hd),
                      arg_min(r.shard, r.h)) AS s
      FROM d CROSS JOIN ring r
      GROUP BY d.doc_id, d.hd)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN a64.s <> a65.s THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_ring,
           CAST(sum(CASE WHEN d.hd % {s1} <> d.hd % {s2}
                    THEN 1 ELSE 0 END) AS BIGINT) AS moved_mod
    FROM d JOIN a64 USING (doc_id) JOIN a65 USING (doc_id)""".format(
        s1=_RING_FROM, s2=_RING_TO, v=_RING_VNODES))
def ring_rebalance(sf_dir: str):
    """CONSISTENT-HASHING rebalance census: how many documents move
    when the shard count grows 64 -> 65 under (a) a vnode hash ring
    (Karger et al.) vs (b) plain mod-sharding — the measurement that
    justifies rings for any resizable partitioned store (ring moves
    ~n/65; mod reshuffles almost everything). The ring (65 shards x
    32 vnodes of md5 points, shared prefix with the 64-shard ring)
    is built once on the driver — KILOBYTES — and broadcast; each
    batch assigns docs with two searchsorted lookups (strictly-
    greater successor, wrap to the ring minimum) plus two mods, all
    on the same md5-64 values the oracle replays. Map-only, one
    3-int combine."""
    n1, n2, v = _RING_FROM, _RING_TO, _RING_VNODES
    labels = []
    keys = []
    for s in range(n2):
        for vn in range(v):
            labels.append(s)
            keys.append("%d#%d" % (s, vn))
    h = md5_upper64_flat(keys)
    lab = np.asarray(labels, np.int64)

    def ring_of(max_shard: int):
        m = lab < max_shard
        hh, ll = h[m], lab[m]
        order = np.argsort(hh, kind="stable")
        return hh[order], ll[order]

    r64_h, r64_s = ring_of(n1)
    r65_h, r65_s = ring_of(n2)
    rref = ray.put((r64_h, r64_s, r65_h, r65_s))

    class Assign:
        def __init__(self):
            (self.h64, self.s64, self.h65, self.s65) = ray.get(rref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b["doc_id"].to_numpy(np.int64)
            hd = md5_upper64_flat(
                pa.array([str(i) for i in ids], pa.string()))
            i64 = np.searchsorted(self.h64, hd, side="right")
            i64[i64 == len(self.h64)] = 0
            i65 = np.searchsorted(self.h65, hd, side="right")
            i65[i65 == len(self.h65)] = 0
            moved_ring = (self.s64[i64] != self.s65[i65])
            moved_mod = (hd % np.uint64(n1)) != (hd % np.uint64(n2))
            return pd.DataFrame({
                "k": np.zeros(1, np.int64),
                "n_docs": np.asarray([len(ids)], np.int64),
                "moved_ring": np.asarray([int(moved_ring.sum())],
                                         np.int64),
                "moved_mod": np.asarray([int(moved_mod.sum())],
                                        np.int64)})

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id"])
    out = _combine_partials(
        ds.map_batches(Assign, batch_format="pandas",
                       concurrency=2),
        ["k"], ["n_docs", "moved_ring", "moved_mod"])
    return pd.DataFrame({
        "n_docs": [np.int64(out["n_docs"].iloc[0])],
        "moved_ring": [np.int64(out["moved_ring"].iloc[0])],
        "moved_mod": [np.int64(out["moved_mod"].iloc[0])]})
