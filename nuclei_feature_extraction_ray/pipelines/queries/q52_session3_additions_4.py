# round-5 session-3 additions, batch 4: Heaps'-law vocabulary-growth
# fit, window co-occurrence PMI (skip-gram collocations), and a
# classifier calibration (reliability-diagram) census.
from __future__ import annotations

from ...functions.hashing import md5_upper64_flat, tokens_flat
from ._shared import (_combine_partials, _path, _r6, np, partition_map,
                      pd, rd, register)
from .q00_documents_per_row import PMI_K, PMI_MIN_COUNT
from .q05_pages_flagship import (_QC_BIAS, _QC_BUCKETS, _QC_MIX,
                                 _QC_MOD)

_WPMI_WIN = 2          # co-occurrence window (positions 1..2 apart)
_CAL_BINS = 10


@register("heaps_fit", sql="""
    WITH d AS (SELECT doc_id, trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT doc_id, unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
                 CAST(count(DISTINCT term) AS BIGINT) AS n_typ
          FROM w GROUP BY doc_id),
    l AS (SELECT ln(CAST(n_tok AS DOUBLE)) AS x,
                 ln(CAST(n_typ AS DOUBLE)) AS y FROM s),
    ag AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
                  sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy
           FROM l)
    SELECT CAST(n AS BIGINT) AS n_docs,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS heaps_beta,
           exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
               / n) AS heaps_k
    FROM ag""")
def heaps_fit(sf_dir: str):
    """Heaps'-law fit: regress each document's log vocabulary size
    (distinct tokens) on its log length, giving V ~ k * N^beta — the
    vocabulary-growth exponent a tokenizer-budget plan extrapolates
    from before committing to a vocab size (beta ~ 0.7-0.8 for
    natural text; lower smells templated/duplicated). Scale plan:
    map-only — each batch computes per-doc (ln N, ln V) via one
    grouped-nunique pass and emits a SINGLE 5-number OLS sufficient-
    stat row (n, sx, sy, sxx, sxy); the driver folds blocks-many
    rows. The closed form is shared verbatim with the oracle;
    round-6 absorbs fold-order ulps in the sums."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        nz = k > 0
        if not nz.any():
            return pd.DataFrame({"n": [0], "sx": [0.0], "sy": [0.0],
                                 "sxx": [0.0], "sxy": [0.0]})
        doc = np.repeat(np.arange(len(k)), k)
        typ = pd.DataFrame({
            "doc": doc,
            "tok": vals.to_numpy(zero_copy_only=False)}) \
            .groupby("doc")["tok"].nunique()
        n_typ = np.zeros(len(k), np.int64)
        n_typ[typ.index.to_numpy()] = typ.to_numpy(np.int64)
        x = np.log(k[nz].astype(np.float64))
        y = np.log(n_typ[nz].astype(np.float64))
        return pd.DataFrame({
            "n": [np.int64(nz.sum())], "sx": [float(np.sum(x))],
            "sy": [float(np.sum(y))], "sxx": [float(np.sum(x * x))],
            "sxy": [float(np.sum(x * y))]})

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n = float(p["n"].sum())
    sx, sy = float(p["sx"].sum()), float(p["sy"].sum())
    sxx, sxy = float(p["sxx"].sum()), float(p["sxy"].sum())
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k_ = float(np.exp((sy - beta * sx) / n))
    return pd.DataFrame({"n_docs": np.asarray([n], np.int64),
                         "heaps_beta": np.asarray([beta], np.float64),
                         "heaps_k": np.asarray([k_], np.float64)})


@register("window_pmi", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    words AS (SELECT doc_id, unnest(w) AS tok,
                     generate_subscripts(w, 1) AS pos FROM docs),
    ucnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
             FROM words GROUP BY tok),
    nu AS (SELECT count(*) AS n FROM words),
    pr AS (SELECT least(a.tok, b.tok) AS w1,
                  greatest(a.tok, b.tok) AS w2
           FROM words a JOIN words b
             ON a.doc_id = b.doc_id
                AND b.pos > a.pos AND b.pos <= a.pos + {win}),
    np_ AS (SELECT count(*) AS n FROM pr),
    pcnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
             FROM pr GROUP BY w1, w2 HAVING count(*) >= {m}),
    scored AS (
      SELECT w1, w2, c_xy, u1.c AS c_x, u2.c AS c_y,
             round(ln((CAST(c_xy AS DOUBLE) * CAST(nu.n AS DOUBLE)
                       * CAST(nu.n AS DOUBLE))
                      / (CAST(np_.n AS DOUBLE) * CAST(u1.c AS DOUBLE)
                         * CAST(u2.c AS DOUBLE))), 6) AS pmi
      FROM pcnt JOIN ucnt u1 ON u1.tok = w1
                JOIN ucnt u2 ON u2.tok = w2
      CROSS JOIN nu CROSS JOIN np_)
    SELECT w1, w2, c_xy, c_x, c_y, pmi
    FROM scored ORDER BY pmi DESC, w1, w2 LIMIT {k}""".format(
    win=_WPMI_WIN, m=PMI_MIN_COUNT, k=PMI_K))
def window_pmi(sf_dir: str):
    """Skip-gram collocations: top-K UNORDERED token pairs that
    co-occur within a +/-2-position window, ranked by PMI with a
    min-count floor — the word2vec-style context statistic
    (bigram_pmi is the adjacent-only tier; the window form catches
    'new ... york'-like skips). Scale plan: phase A is one map pass
    emitting unigram-count partials plus a per-batch window-pair
    total (tagged rows, one guarded combine; above the guard the
    vocab flows through the lm_score term-keyed exchange); phase B
    enumerates pairs by flat-array offset arithmetic, exchanges
    (w1, w2)-keyed count partials, and each partition ships only its
    min-count survivors' local top-K, so the driver merges
    partitions x K rows."""
    ds = rd.read_parquet(_path(sf_dir, "documents"), columns=["text"])

    def pair_arrays(b: pd.DataFrame):
        vals, k = tokens_flat(b["text"])
        tok = vals.to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(k)), k)
        w1s, w2s = [], []
        for d in range(1, _WPMI_WIN + 1):
            if len(tok) <= d:
                continue
            m = doc[d:] == doc[:-d]
            a, b2 = tok[:-d][m], tok[d:][m]
            w1s.append(np.minimum(a, b2))
            w2s.append(np.maximum(a, b2))
        if not w1s:
            return tok, np.empty(0, object), np.empty(0, object)
        return tok, np.concatenate(w1s), np.concatenate(w2s)

    def partial_a(b: pd.DataFrame) -> pd.DataFrame:
        tok, w1, _ = pair_arrays(b)
        un = pd.Series(tok, dtype=object).value_counts()
        return pd.DataFrame({
            "kind": np.concatenate([np.zeros(len(un), np.int64),
                                    np.ones(1, np.int64)]),
            "tok": np.concatenate([un.index.to_numpy(object),
                                   np.asarray([""], object)]),
            "n": np.concatenate([un.to_numpy(np.int64),
                                 np.asarray([len(w1)], np.int64)])})

    cnt = _combine_partials(
        ds.map_batches(partial_a, batch_format="pandas"),
        ["kind", "tok"], ["n"])
    ucnt = cnt[cnt["kind"] == 0][["tok", "n"]]
    nu = float(ucnt["n"].sum())
    npair = float(cnt.loc[cnt["kind"] == 1, "n"].sum())
    u1 = ucnt.rename(columns={"tok": "w1", "n": "c_x"})
    u2 = ucnt.rename(columns={"tok": "w2", "n": "c_y"})

    def partial_b(b: pd.DataFrame) -> pd.DataFrame:
        _, w1, w2 = pair_arrays(b)
        g = pd.DataFrame({"w1": w1, "w2": w2}) \
            .groupby(["w1", "w2"], as_index=False).size()
        return pd.DataFrame({"w1": g["w1"].to_numpy(object),
                             "w2": g["w2"].to_numpy(object),
                             "c_xy": g["size"].to_numpy(np.int64)})

    def local_top(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["w1", "w2"], as_index=False)["c_xy"].sum()
        t = t[t["c_xy"] >= PMI_MIN_COUNT]
        if t.empty:
            return pd.DataFrame({
                "w1": pd.Series(dtype=object),
                "w2": pd.Series(dtype=object),
                "c_xy": pd.Series(dtype=np.int64),
                "c_x": pd.Series(dtype=np.int64),
                "c_y": pd.Series(dtype=np.int64),
                "pmi": pd.Series(dtype=np.float64)})
        t = t.merge(u1, on="w1").merge(u2, on="w2")
        t["pmi"] = np.log(
            t["c_xy"].to_numpy(np.float64) * nu * nu
            / (npair * t["c_x"].to_numpy(np.float64)
               * t["c_y"].to_numpy(np.float64)))
        t = _r6(t, ["pmi"])
        t = t.sort_values(["pmi", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="mergesort").head(PMI_K)
        t["c_xy"] = t["c_xy"].astype(np.int64)
        t["c_x"] = t["c_x"].astype(np.int64)
        t["c_y"] = t["c_y"].astype(np.int64)
        return t

    cand = partition_map(
        ds.map_batches(partial_b, batch_format="pandas"),
        ["w1", "w2"], local_top, 16).to_pandas()
    top = cand.sort_values(["pmi", "w1", "w2"],
                           ascending=[False, True, True],
                           kind="mergesort").head(PMI_K)
    return top[["w1", "w2", "c_xy", "c_x", "c_y", "pmi"]] \
        .reset_index(drop=True)


@register("calibration_bins", sql="""
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
      FROM w GROUP BY doc_id),
    pr AS (
      SELECT d.doc_id, d.lang,
             round(1.0 / (1.0 + exp(-(CAST(coalesce(a.score_micro, 0)
                   AS DOUBLE) / greatest(coalesce(a.n_tokens, 0), 1)
                   / 1000000.0))), 6) AS prob
      FROM (SELECT doc_id, lang FROM documents) d
      LEFT JOIN agg a USING (doc_id)),
    b AS (SELECT least(CAST(floor(prob * 10.0) AS BIGINT), 9) AS bin,
                 prob,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM pr)
    SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
           sum(prob) / CAST(count(*) AS DOUBLE) AS mean_prob,
           CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS frac_en
    FROM b GROUP BY bin ORDER BY bin""".format(
    nb=_QC_BUCKETS, mix=_QC_MIX, bias=_QC_BIAS, md=_QC_MOD,
    half=(_QC_MOD - 1) // 2))
def calibration_bins(sf_dir: str):
    """Calibration (reliability-diagram) census for the hashed linear
    quality classifier: predicted keep-probabilities bucketed into 10
    equal-width bins, each reporting mean predicted probability vs
    the empirical rate of the proxy label (lang = 'en') — the check
    that decides whether classifier scores can be used as sampling
    weights or need Platt/isotonic recalibration. Reuses
    quality_classifier's exact integer micro-logit scoring (same md5
    bucket weights, same round-6 sigmoid), so binning is
    deterministic cross-engine. Scale plan: map-only scoring with
    per-batch (bin, count, prob-sum, positives) partials into one
    10-row combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "lang", "text"])
    half = (_QC_MOD - 1) // 2

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, lens = tokens_flat(b["text"])
        flat = vals.to_pylist()
        score = np.zeros(len(lens), np.int64)
        if flat:
            hv = md5_upper64_flat(flat)
            bk = (hv % _QC_BUCKETS).astype(np.int64)
            wt = (bk * _QC_MIX + _QC_BIAS) % _QC_MOD - half
            nz = lens > 0
            off = np.zeros(len(lens), np.int64)
            off[1:] = np.cumsum(lens)[:-1]
            score[nz] = np.add.reduceat(wt, off[nz])
        prob = 1.0 / (1.0 + np.exp(
            -(score / np.maximum(lens, 1) / 1e6)))
        prob = _r6(pd.DataFrame({"prob": prob}), ["prob"])["prob"] \
            .to_numpy(np.float64)
        bins = np.minimum(np.floor(prob * 10.0).astype(np.int64),
                          _CAL_BINS - 1)
        g = pd.DataFrame({
            "bin": bins,
            "n_docs": np.ones(len(bins), np.int64),
            "sum_prob": prob,
            "n_pos": (b["lang"].to_numpy(object) == "en")
            .astype(np.int64)}) \
            .groupby("bin", as_index=False).sum()
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["n_pos"] = g["n_pos"].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["bin"], ["n_docs", "sum_prob", "n_pos"])
    out = out.sort_values("bin", kind="mergesort") \
        .reset_index(drop=True)
    return pd.DataFrame({
        "bin": out["bin"].to_numpy(np.int64),
        "n_docs": out["n_docs"].to_numpy(np.int64),
        "mean_prob": out["sum_prob"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64),
        "frac_en": out["n_pos"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64)})
