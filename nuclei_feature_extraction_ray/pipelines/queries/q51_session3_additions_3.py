# round-5 session-3 additions, batch 3: differential-privacy noisy
# release with deterministic seeded Laplace noise, Stupid-Backoff
# bigram language-model scoring, and simple-exponential-smoothing
# one-step forecasts.
from __future__ import annotations

from ...functions.hashing import md5_upper64_flat, tokens_flat
from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)

_DP_EPS = 0.1          # Laplace scale b = 1/eps = 10
_SB_ALPHA = 0.4        # Stupid Backoff discount
_SES_A = 0.3           # SES smoothing factor


@register("dp_noisy_counts", sql="""
    WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY lang, source),
    u AS (SELECT lang, source, n,
                 CAST(('0x' || substr(md5(lang || '|' || source),
                                      1, 12))::UBIGINT AS DOUBLE)
                   / 281474976710656.0 AS u
          FROM c)
    SELECT lang, source,
           CAST(n AS DOUBLE)
             + CASE WHEN u >= 0.5
                    THEN -{b} * ln(1.0 - 2.0 * (u - 0.5))
                    ELSE {b} * ln(1.0 - 2.0 * (0.5 - u)) END
             AS noisy_count
    FROM u ORDER BY lang, source""".format(b=1.0 / _DP_EPS))
def dp_noisy_counts(sf_dir: str):
    """Differential-privacy style noisy count release: each (lang,
    source) cell's count is published with Laplace(1/eps) noise drawn
    by inverse-CDF from a DETERMINISTIC uniform — the md5 of the cell
    key (top 48 bits / 2^48) — so the release is reproducible across
    engines and runs (the seeded-noise pattern used to make privacy
    pipelines testable; a production release would swap in a real
    RNG). Scale plan: per-batch cell-count partials collapse to one
    grid-sized combine; the noise transform is one vectorized
    expression. Both engines share the exact same double pipeline
    (48-bit int -> divide -> ln -> multiply), differing only in libm
    ulps absorbed by round-6."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "source"], as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["lang", "source", "n"]]

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "source"], ["n"])
    keys = (grid["lang"].astype(str) + "|"
            + grid["source"].astype(str)).tolist()
    u = (md5_upper64_flat(keys) >> np.uint64(16)).astype(np.float64) \
        / 281474976710656.0
    b_scale = 1.0 / _DP_EPS
    noise = np.where(
        u >= 0.5,
        -b_scale * np.log(1.0 - 2.0 * (u - 0.5)),
        b_scale * np.log(1.0 - 2.0 * (0.5 - u)))
    out = pd.DataFrame({
        "lang": grid["lang"].astype(object),
        "source": grid["source"].astype(object),
        "noisy_count": grid["n"].to_numpy(np.float64) + noise})
    return out.sort_values(["lang", "source"],
                           kind="mergesort").reset_index(drop=True)


@register("bigram_backoff", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    p AS (SELECT doc_id, unnest(w) AS term,
                 unnest(generate_series(1, len(w))) AS pos
          FROM docs),
    uni AS (SELECT term, CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY term),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
    bi AS (SELECT a.term AS w1, b.term AS w2,
                  CAST(count(*) AS BIGINT) AS n
           FROM p a JOIN p b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
           GROUP BY w1, w2),
    sc AS (SELECT a.doc_id,
                  CASE WHEN bi.n IS NOT NULL
                       THEN ln(CAST(bi.n AS DOUBLE)
                               / CAST(u1.n AS DOUBLE))
                       ELSE ln({a} * CAST(u2.n AS DOUBLE)
                               / CAST(tot.n AS DOUBLE)) END AS lp
           FROM p a JOIN p b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                JOIN uni u1 ON u1.term = a.term
                JOIN uni u2 ON u2.term = b.term
                LEFT JOIN bi ON bi.w1 = a.term AND bi.w2 = b.term
                CROSS JOIN tot)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           sum(lp) / CAST(count(*) AS DOUBLE) AS mean_logp
    FROM sc GROUP BY doc_id ORDER BY doc_id""".format(a=_SB_ALPHA))
def bigram_backoff(sf_dir: str):
    """Stupid Backoff bigram scoring (Brants et al. 2007): each
    document's mean log score under the corpus's own bigram LM —
    S(w2|w1) = n(w1 w2)/n(w1) when the bigram was seen, else
    0.4 * n(w2)/N — the cheap web-scale LM used to rank fluency
    before a neural perplexity pass (lm_score is the unigram tier;
    this adds the conditional-context shape). Scale plan: pass 1
    folds per-batch unigram AND bigram count partials (driver combine
    guarded at 1M rows — above it the same partials flow through a
    term-keyed exchange, the lm_score vocabulary-tier pattern); pass
    2 is map-only — pair enumeration is offset arithmetic on the
    flat token array and both lookups are vectorized merges, so
    documents never leave their batch."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def pair_frame(b: pd.DataFrame):
        vals, k = tokens_flat(b["text"])
        tok = vals.to_numpy(zero_copy_only=False)
        doc = np.repeat(b["doc_id"].to_numpy(np.int64), k)
        if len(tok) < 2:
            return None
        m = doc[1:] == doc[:-1]
        return (pd.DataFrame({"doc_id": doc[:-1][m],
                              "w1": tok[:-1][m],
                              "w2": tok[1:][m]}),
                pd.Series(tok, dtype=object))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pf = pair_frame(b)
        if pf is None:
            return pd.DataFrame({
                "kind": pd.Series(dtype=np.int64),
                "w1": pd.Series(dtype=object),
                "w2": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64)})
        pairs, toks = pf
        bi = pairs.groupby(["w1", "w2"], as_index=False).size()
        un = toks.value_counts()
        return pd.DataFrame({
            "kind": np.concatenate([
                np.zeros(len(un), np.int64),
                np.ones(len(bi), np.int64)]),
            "w1": np.concatenate([un.index.to_numpy(object),
                                  bi["w1"].to_numpy(object)]),
            "w2": np.concatenate([np.full(len(un), "", object),
                                  bi["w2"].to_numpy(object)]),
            "n": np.concatenate([un.to_numpy(np.int64),
                                 bi["size"].to_numpy(np.int64)])})

    counts = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["kind", "w1", "w2"], ["n"])
    uni = counts[counts["kind"] == 0][["w1", "n"]] \
        .rename(columns={"n": "nu"})
    bi = counts[counts["kind"] == 1][["w1", "w2", "n"]] \
        .rename(columns={"n": "nb"})
    total = float(uni["nu"].sum())

    def score(b: pd.DataFrame) -> pd.DataFrame:
        pf = pair_frame(b)
        if pf is None:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype=np.int64),
                "n_bigrams": pd.Series(dtype=np.int64),
                "mean_logp": pd.Series(dtype=np.float64)})
        pairs, _ = pf
        m = pairs.merge(uni.rename(columns={"nu": "n1"}), on="w1",
                        how="left")
        m = m.merge(uni.rename(columns={"w1": "w2", "nu": "n2"}),
                    on="w2", how="left")
        m = m.merge(bi, on=["w1", "w2"], how="left")
        seen = m["nb"].notna().to_numpy()
        lp = np.where(
            seen,
            np.log(m["nb"].to_numpy(np.float64)
                   / m["n1"].to_numpy(np.float64)),
            np.log(_SB_ALPHA * m["n2"].to_numpy(np.float64) / total))
        g = pd.DataFrame({"doc_id": m["doc_id"],
                          "n_bigrams": np.ones(len(m), np.int64),
                          "lp": lp}) \
            .groupby("doc_id", as_index=False).sum()
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_bigrams": g["n_bigrams"].to_numpy(np.int64),
            "mean_logp": g["lp"].to_numpy(np.float64)
            / g["n_bigrams"].to_numpy(np.float64)})

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id",
                           kind="mergesort").reset_index(drop=True)


@register("ses_forecast", sql="""
    WITH d AS (SELECT event_type,
                      CAST(date_trunc('day', ts) AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY event_type, day),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT t.event_type,
                     CAST(unnest(generate_series(b.d0, b.d1,
                                                 INTERVAL 1 DAY))
                          AS DATE) AS day
              FROM types t CROSS JOIN bounds b),
    x AS (SELECT s.event_type,
                 row_number() OVER (PARTITION BY s.event_type
                                    ORDER BY s.day) AS t,
                 CAST(COALESCE(d.n, 0) AS DOUBLE) AS v
          FROM spine s LEFT JOIN d USING (event_type, day)),
    nn AS (SELECT event_type, CAST(max(t) AS BIGINT) AS tmax
           FROM x GROUP BY event_type)
    SELECT x.event_type,
           CAST(nn.tmax AS BIGINT) AS n_days,
           sum(CASE WHEN x.t = 1
                    THEN pow(1.0 - {a}, CAST(nn.tmax - 1 AS DOUBLE))
                         * x.v
                    ELSE {a} * pow(1.0 - {a},
                                   CAST(nn.tmax - x.t AS DOUBLE))
                         * x.v END) AS ses_forecast
    FROM x JOIN nn USING (event_type)
    GROUP BY x.event_type, nn.tmax
    ORDER BY x.event_type""".format(a=_SES_A))
def ses_forecast(sf_dir: str):
    """Simple exponential smoothing (alpha = 0.3) over each event
    type's zero-filled daily count series, reported as the one-step-
    ahead forecast s_T — the closed form s_T = sum over t of
    alpha*(1-alpha)^(T-t)*y_t (with the t=1 term keeping the full
    (1-alpha)^(T-1) weight as the s_1 = y_1 seed). The recursive
    definition is deliberately unrolled into an order-free weighted
    sum so a distributed engine can fold it without sequential state.
    Scale plan: per-batch (type, day) partials collapse to one
    calendar-bounded combine; the weighted fold runs on the tiny
    types x days frame. Weights share the identical pow expression in
    both engines; round-6 absorbs libm ulps."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        g = pd.DataFrame({"event_type": b["event_type"]
                          .astype(object), "day": day}) \
            .groupby(["event_type", "day"], as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["event_type", "day", "n"]]

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "day"], ["n"])
    d0, d1 = int(d["day"].min()), int(d["day"].max())
    tmax = d1 - d0 + 1
    types, fc = [], []
    for et, g in d.groupby("event_type"):
        v = np.zeros(tmax, np.float64)
        v[g["day"].to_numpy(np.int64) - d0] = \
            g["n"].to_numpy(np.float64)
        t = np.arange(1, tmax + 1, dtype=np.float64)
        w = _SES_A * np.power(1.0 - _SES_A, np.float64(tmax) - t)
        w[0] = np.power(1.0 - _SES_A, np.float64(tmax - 1))
        types.append(et)
        fc.append(float(np.sum(w * v)))
    return pd.DataFrame({
        "event_type": pd.Series(types, dtype=object),
        "n_days": np.full(len(types), tmax, np.int64),
        "ses_forecast": np.asarray(fc, np.float64)})
