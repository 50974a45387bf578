# round-5 session-5 additions, batch 70: the Cox-Stuart paired-halves
# trend test, the Chao-Shen coverage-adjusted corpus entropy, and
# Cliff's ordinal-dominance delta between arms.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map
from ...functions.hashing import tokens_flat


@register("cox_stuart", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
    p AS (SELECT a.v AS v1, b.v AS v2
          FROM x a JOIN x b
            ON b.t = a.t + ((SELECT n FROM s) + 1) // 2
          WHERE a.t <= (SELECT n FROM s) // 2),
    c AS (SELECT CAST(sum(CASE WHEN v2 > v1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS pos,
                 CAST(sum(CASE WHEN v2 < v1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS neg
          FROM p)
    SELECT pos AS n_up, neg AS n_down,
           (CAST(pos AS DOUBLE) - CAST(neg AS DOUBLE))
           / sqrt(CAST(pos + neg AS DOUBLE)) AS cox_stuart_z
    FROM c""")
def cox_stuart(sf_dir: str):
    """COX-STUART TREND TEST on daily revenue: pair day i of the
    first half with day i + ceil(n/2) of the second half, count
    rises versus falls (exact ties dropped), z = (pos - neg) /
    sqrt(pos + neg) — the distribution-free MONOTONE-TREND test
    that complements runs_test (randomness) and turning_points
    (smoothness): it asks specifically 'is the second half above
    the first, pointwise?'. All comparisons are exact integer
    cent comparisons; only the final z is float. Scale plan:
    bounded day-domain combine; pairing is O(days) driver work."""
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
        ["day"], ["v"], exact_int=True).sort_values("day")
    v = [int(x) for x in d["v"]]
    n = len(v)
    c = (n + 1) // 2
    pos = neg = 0
    for i in range(n // 2):
        if v[i + c] > v[i]:
            pos += 1
        elif v[i + c] < v[i]:
            neg += 1
    return pd.DataFrame({
        "n_up": [np.int64(pos)], "n_down": [np.int64(neg)],
        "cox_stuart_z": [(np.float64(pos) - np.float64(neg))
                         / np.sqrt(np.float64(pos + neg))]})


@register("chao_shen_entropy", sql="""
    WITH d AS (SELECT trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c
           FROM w GROUP BY term),
    h AS (SELECT c, CAST(count(*) AS BIGINT) AS m
          FROM tc GROUP BY c),
    t AS (SELECT CAST(sum(c * m) AS BIGINT) AS n,
                 CAST(sum(m) AS BIGINT) AS vocab,
                 CAST(COALESCE(sum(m) FILTER (c = 1), 0)
                      AS BIGINT) AS f1
          FROM h),
    q AS (SELECT h.m,
                 CAST(floor(
                   -(((1.0 - CAST((SELECT f1 FROM t) AS DOUBLE)
                             / CAST((SELECT n FROM t) AS DOUBLE))
                      * (CAST(h.c AS DOUBLE)
                         / CAST((SELECT n FROM t) AS DOUBLE)))
                     * ln((1.0 - CAST((SELECT f1 FROM t)
                                       AS DOUBLE)
                               / CAST((SELECT n FROM t)
                                       AS DOUBLE))
                          * (CAST(h.c AS DOUBLE)
                             / CAST((SELECT n FROM t)
                                     AS DOUBLE))))
                   / (1.0 - exp(CAST((SELECT n FROM t) AS DOUBLE)
                        * ln(1.0
                             - (1.0 - CAST((SELECT f1 FROM t)
                                            AS DOUBLE)
                                   / CAST((SELECT n FROM t)
                                           AS DOUBLE))
                               * (CAST(h.c AS DOUBLE)
                                  / CAST((SELECT n FROM t)
                                          AS DOUBLE)))))
                   * 1000000000.0 + 0.5) AS BIGINT) AS tq
          FROM h)
    SELECT (SELECT n FROM t) AS n_tokens,
           (SELECT vocab FROM t) AS vocab,
           (SELECT f1 FROM t) AS singletons,
           1.0 - CAST((SELECT f1 FROM t) AS DOUBLE)
               / CAST((SELECT n FROM t) AS DOUBLE) AS coverage,
           CAST(CAST(sum(CAST(m AS HUGEINT) * tq) AS HUGEINT)
                AS DOUBLE) / 1000000000.0 AS chao_shen_entropy
    FROM q""")
def chao_shen_entropy(sf_dir: str):
    """CHAO-SHEN COVERAGE-ADJUSTED ENTROPY of the corpus token
    distribution: Good-Turing coverage C = 1 - f1/N shrinks each
    plug-in probability, and the Horvitz-Thompson correction
    1/(1-(1-Cp)^N) reweights for tokens the sample may have
    missed — the estimator that fixes the plug-in entropy's
    severe negative bias on heavy-tailed vocabularies (doc_entropy
    and column_entropy are plug-in; chao1_richness corrects
    RICHNESS, this corrects ENTROPY). The frequency-of-frequency
    histogram folds exactly; each distinct count contributes ONE
    shared-float term quantized to nano ints, multiplied by its
    exact multiplicity, summed exactly. Scale plan: yule_k's
    term-keyed exchange into a bounded count histogram; the term
    table is O(distinct counts) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        g = pd.DataFrame({
            "term": vals.to_numpy(zero_copy_only=False),
            "c": np.ones(int(k.sum()), np.int64)}) \
            .groupby("term", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    def census(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("term", as_index=False)["c"].sum()
        out = pd.DataFrame({
            "c": a["c"].to_numpy(np.int64),
            "m": np.ones(len(a), np.int64)}) \
            .groupby("c", as_index=False).sum()
        out["m"] = out["m"].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["term"], census, 16),
        ["c"], ["m"], exact_int=True)
    cs = [int(x) for x in h["c"]]
    ms = [int(x) for x in h["m"]]
    n = sum(c * m for c, m in zip(cs, ms))
    vocab = sum(ms)
    f1 = sum(m for c, m in zip(cs, ms) if c == 1)
    cov = 1.0 - np.float64(f1) / np.float64(n)
    acc = 0
    for c, m in zip(cs, ms):
        pa = (1.0 - np.float64(f1) / np.float64(n)) \
            * (np.float64(c) / np.float64(n))
        term = -(pa * np.log(pa)) \
            / (1.0 - np.exp(np.float64(n) * np.log(1.0 - pa)))
        acc += m * int(np.floor(term * 1000000000.0 + 0.5))
    return pd.DataFrame({
        "n_tokens": [np.int64(n)], "vocab": [np.int64(vocab)],
        "singletons": [np.int64(f1)],
        "coverage": [np.float64(cov)],
        "chao_shen_entropy": [np.float64(acc) / 1000000000.0]})


@register("cliffs_delta", sql="""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 2 AS BIGINT) AS arm,
                      CAST(count(*) FILTER (
                          event_type = 'purchase') AS BIGINT)
                        AS pc
               FROM events GROUP BY user_id),
    h AS (SELECT arm, pc, CAST(count(*) AS BIGINT) AS c
          FROM u GROUP BY arm, pc),
    cr AS (SELECT CAST(sum(CASE WHEN a.pc > b.pc
                           THEN CAST(a.c AS HUGEINT) * b.c
                           ELSE 0 END) AS HUGEINT) AS gt,
                  CAST(sum(CASE WHEN a.pc < b.pc
                           THEN CAST(a.c AS HUGEINT) * b.c
                           ELSE 0 END) AS HUGEINT) AS lt
           FROM h a JOIN h b ON a.arm = 1 AND b.arm = 0),
    t AS (SELECT CAST(sum(c) FILTER (arm = 1) AS BIGINT) AS n1,
                 CAST(sum(c) FILTER (arm = 0) AS BIGINT) AS n0
          FROM h)
    SELECT (SELECT n1 FROM t) AS n_treatment,
           (SELECT n0 FROM t) AS n_control,
           (CAST((SELECT gt FROM cr) AS DOUBLE)
            - CAST((SELECT lt FROM cr) AS DOUBLE))
           / (CAST((SELECT n1 FROM t) AS DOUBLE)
              * CAST((SELECT n0 FROM t) AS DOUBLE))
             AS cliffs_delta""")
def cliffs_delta(sf_dir: str):
    """CLIFF'S DELTA between arms on per-user purchase counts:
    P(treatment > control) - P(treatment < control) over all
    cross pairs — the ordinal effect size that stays meaningful
    under the heavy ties and skew that make Cohen's d lie
    (brunner_munzel TESTS stochastic dominance; delta is the
    EFFECT SIZE practitioners report next to it). Computed
    entirely from the two bounded purchase-count histograms:
    dominance mass is an exact big-int cross product, one final
    division. Scale plan: per-user counts through one user
    exchange into bounded arm histograms; the cross product is
    O(domain^2) driver work."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "pc": (b["event_type"].to_numpy(object)
                   == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False)["pc"].sum()
        arm = (a["user_id"].to_numpy(np.int64) % 2) \
            .astype(np.int64)
        out = pd.DataFrame({"arm": arm,
                            "pc": a["pc"].to_numpy(np.int64),
                            "c": np.ones(len(a), np.int64)}) \
            .groupby(["arm", "pc"], as_index=False).sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["arm", "pc"], ["c"])
    h0 = {int(r["pc"]): int(r["c"]) for _, r in
          h[h["arm"] == 0].iterrows()}
    h1 = {int(r["pc"]): int(r["c"]) for _, r in
          h[h["arm"] == 1].iterrows()}
    gt = sum(c1 * c0 for p1, c1 in h1.items()
             for p0, c0 in h0.items() if p1 > p0)
    lt = sum(c1 * c0 for p1, c1 in h1.items()
             for p0, c0 in h0.items() if p1 < p0)
    n1 = sum(h1.values())
    n0 = sum(h0.values())
    return pd.DataFrame({
        "n_treatment": [np.int64(n1)],
        "n_control": [np.int64(n0)],
        "cliffs_delta": [(np.float64(gt) - np.float64(lt))
                         / (np.float64(n1) * np.float64(n0))]})
