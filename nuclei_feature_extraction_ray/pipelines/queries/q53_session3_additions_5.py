# round-5 session-3 additions, batch 5: Wilson-interval flagged-rate
# census, Good-Turing frequency-of-frequencies, and Church-Gale term
# burstiness (cf/df).
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from .q06_pages_flagship_2 import _BLOCKLIST

_WILSON_Z = 1.96
_GT_MAX_R = 10
_BURST_MIN_DF = 5
_BURST_K = 50


@register("wilson_ci", sql="""
    WITH d AS (SELECT source,
                      CASE WHEN len(list_filter(
                             string_split_regex(
                               trim(text, E' \\t\\n\\r\\f'),
                               '[ \\t\\n\\r\\f]+'),
                             x -> list_contains(
                               ['{b0}', '{b1}', '{b2}'], x))) > 0
                           THEN 1 ELSE 0 END AS flagged
               FROM documents),
    a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(flagged) AS BIGINT) AS n_flagged
          FROM d GROUP BY source),
    p AS (SELECT source, n, n_flagged,
                 CAST(n_flagged AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
                 CAST(n AS DOUBLE) AS nd FROM a)
    SELECT source, n, n_flagged, ph AS p_hat,
           (ph + {z} * {z} / (2.0 * nd)
            - {z} * sqrt(ph * (1.0 - ph) / nd
                         + {z} * {z} / (4.0 * nd * nd)))
             / (1.0 + {z} * {z} / nd) AS wilson_lo,
           (ph + {z} * {z} / (2.0 * nd)
            + {z} * sqrt(ph * (1.0 - ph) / nd
                         + {z} * {z} / (4.0 * nd * nd)))
             / (1.0 + {z} * {z} / nd) AS wilson_hi
    FROM p ORDER BY source""".format(
    b0=_BLOCKLIST[0], b1=_BLOCKLIST[1], b2=_BLOCKLIST[2], z=_WILSON_Z))
def wilson_ci(sf_dir: str):
    """Wilson score interval (z = 1.96) on each source's blocklisted-
    document rate: the binomial confidence band a moderation dashboard
    puts around small observed rates (unlike the Wald interval it
    never leaves [0, 1] and behaves at n_flagged = 0) — here the
    flag is 'contains any blocklist token' (blocklist_filter's C4
    pass). Scale plan: map-only flagging (per-doc any() over one
    np.isin probe of the flat token stream) with per-source (n,
    n_flagged) partials into one sources-sized combine; the interval
    is a closed-form double expression shared verbatim with the
    oracle (round-6 absorbs libm sqrt ulps)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "text"])
    block = np.asarray(sorted(_BLOCKLIST), object)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        tok = vals.to_numpy(zero_copy_only=False)
        hit = np.isin(tok, block).astype(np.int64)
        nhit = np.zeros(len(k), np.int64)
        nz = k > 0
        off = np.zeros(len(k), np.int64)
        off[1:] = np.cumsum(k)[:-1]
        if len(tok):
            nhit[nz] = np.add.reduceat(hit, off[nz])
        g = pd.DataFrame({"source": b["source"].astype(object),
                          "n": np.ones(len(k), np.int64),
                          "n_flagged": (nhit > 0).astype(np.int64)}) \
            .groupby("source", as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        g["n_flagged"] = g["n_flagged"].astype(np.int64)
        return g

    a = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["n", "n_flagged"])
    a = a.sort_values("source", kind="mergesort").reset_index(drop=True)
    nd = a["n"].to_numpy(np.float64)
    ph = a["n_flagged"].to_numpy(np.float64) / nd
    z = _WILSON_Z
    half = z * np.sqrt(ph * (1.0 - ph) / nd + z * z / (4.0 * nd * nd))
    den = 1.0 + z * z / nd
    return pd.DataFrame({
        "source": a["source"].astype(object),
        "n": a["n"].to_numpy(np.int64),
        "n_flagged": a["n_flagged"].to_numpy(np.int64),
        "p_hat": ph,
        "wilson_lo": (ph + z * z / (2.0 * nd) - half) / den,
        "wilson_hi": (ph + z * z / (2.0 * nd) + half) / den})


@register("good_turing", sql="""
    WITH w AS (SELECT unnest(string_split_regex(
                 trim(text, E' \\t\\n\\r\\f'),
                 '[ \\t\\n\\r\\f]+')) AS term
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS r
          FROM w GROUP BY term),
    ff AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
           FROM c GROUP BY r)
    SELECT a.r, a.n_r,
           CASE WHEN b.n_r IS NULL THEN NULL
                ELSE CAST((a.r + 1) * b.n_r AS DOUBLE)
                     / CAST(a.n_r AS DOUBLE) END AS r_star
    FROM ff a LEFT JOIN ff b ON b.r = a.r + 1
    ORDER BY a.r LIMIT {mx}""".format(mx=_GT_MAX_R))
def good_turing(sf_dir: str):
    """Good-Turing frequency-of-frequencies: for the 10 SMALLEST
    observed term counts r (where smoothing matters), the number of
    vocabulary types seen exactly r times and
    the smoothed count r* = (r+1) * N_{r+1} / N_r — the
    unseen-mass estimator behind Katz smoothing, and the rare-type
    census a dedup/quality pass reads to judge how much of the
    vocabulary is singleton noise. Exact integers with ONE division
    (NULL where N_{r+1} is empty, matching the oracle's LEFT JOIN).
    Scale plan: per-batch term-count partials through the guarded
    vocabulary combine (term-keyed exchange above the guard, the
    lm_score tier); the frequency histogram and the shifted join are
    driver-side on <= max-count rows."""
    ds = rd.read_parquet(_path(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, _ = tokens_flat(b["text"])
        un = pd.Series(vals.to_numpy(zero_copy_only=False),
                       dtype=object).value_counts()
        return pd.DataFrame({"term": un.index.to_numpy(object),
                             "n": un.to_numpy(np.int64)})

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["term"], ["n"])
    ff = c["n"].value_counts().sort_index()
    r = ff.index.to_numpy(np.int64)
    n_r = ff.to_numpy(np.int64)
    nxt = pd.Series(n_r, index=r).reindex(r + 1).to_numpy(np.float64)
    r_star = np.where(np.isnan(nxt), np.nan,
                      (r + 1).astype(np.float64) * nxt
                      / n_r.astype(np.float64))
    keep = np.arange(len(r)) < _GT_MAX_R   # r is sorted ascending
    return pd.DataFrame({"r": r[keep], "n_r": n_r[keep],
                         "r_star": r_star[keep]})


@register("term_burstiness", sql="""
    WITH d AS (SELECT doc_id, trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT doc_id, unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS cf,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM w GROUP BY term)
    SELECT term, cf, df,
           CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness
    FROM c WHERE df >= {m}
    ORDER BY burstiness DESC, term LIMIT {k}""".format(
    m=_BURST_MIN_DF, k=_BURST_K))
def term_burstiness(sf_dir: str):
    """Church-Gale term burstiness: top-50 terms by collection
    frequency over document frequency (cf/df, df >= 5) — a term that
    appears 40 times across 5 documents is topical/bursty while one
    spread thin across the corpus is functional; the statistic that
    separates content words from glue before keyword extraction or
    stopword induction. cf/df is ONE exact int/int division, so the
    ranking is engine-identical (ties break on term). Scale plan:
    per-batch (term, cf, df) partials — df is additive because
    documents never span batches — through the guarded vocabulary
    combine; filter, divide, and top-k on the combined table."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        tok = vals.to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(k)), k)
        g = pd.DataFrame({"term": tok, "doc": doc})
        cf = g.groupby("term", as_index=False).agg(
            cf=("doc", "size"), df=("doc", "nunique"))
        return pd.DataFrame({"term": cf["term"].to_numpy(object),
                             "cf": cf["cf"].to_numpy(np.int64),
                             "df": cf["df"].to_numpy(np.int64)})

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["term"], ["cf", "df"])
    c = c[c["df"] >= _BURST_MIN_DF].copy()
    c["burstiness"] = c["cf"].to_numpy(np.float64) \
        / c["df"].to_numpy(np.float64)
    c = c.sort_values(["burstiness", "term"],
                      ascending=[False, True],
                      kind="mergesort").head(_BURST_K)
    return pd.DataFrame({
        "term": c["term"].to_numpy(object),
        "cf": c["cf"].to_numpy(np.int64),
        "df": c["df"].to_numpy(np.int64),
        "burstiness": c["burstiness"].to_numpy(np.float64)}) \
        .reset_index(drop=True)
