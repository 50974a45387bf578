# round-5 session-5 additions, batch 13: Kruskal-Wallis k-group rank
# test with tie correction, the differentially-private exponential
# mechanism via the seeded Gumbel-max trick, and partial correlation
# from exact integer moments.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)

_DP_EPS = 1.0


@register("kruskal_wallis", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    hst AS (SELECT v, CAST(count(*) AS BIGINT) AS c
            FROM d GROUP BY v),
    rk AS (SELECT v, c,
                  CAST(2 * (sum(c) OVER (ORDER BY v) - c) + c + 1
                       AS BIGINT) AS mr2
           FROM hst),
    j AS (SELECT ((d.day + 3) % 7) + 1 AS dow, rk.mr2
          FROM d JOIN rk ON d.v = rk.v),
    g AS (SELECT dow, CAST(count(*) AS BIGINT) AS ng,
                 CAST(sum(mr2) AS BIGINT) AS r2
          FROM j GROUP BY dow),
    t AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k FROM g),
    tr AS (SELECT CAST(sum(c * c * c - c) AS BIGINT) AS ts
           FROM hst),
    tq AS (SELECT CAST(sum(CAST(floor(
                 CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
                 / (4.0 * CAST(ng AS DOUBLE)) * 1000000.0 + 0.5)
                 AS BIGINT)) AS BIGINT) AS q FROM g),
    h AS (SELECT 12.0 / (CAST((SELECT n FROM t) AS DOUBLE)
                         * (CAST((SELECT n FROM t) AS DOUBLE)
                            + 1.0))
                 * (CAST((SELECT q FROM tq) AS DOUBLE) / 1000000.0)
                 - 3.0 * (CAST((SELECT n FROM t) AS DOUBLE) + 1.0)
                   AS hv)
    SELECT (SELECT n FROM t) AS n_days,
           (SELECT k FROM t) AS k_groups,
           (SELECT ts FROM tr) AS tie_sum,
           (SELECT hv FROM h) AS h_stat,
           (SELECT hv FROM h)
           / (1.0 - CAST((SELECT ts FROM tr) AS DOUBLE)
              / CAST((SELECT n FROM t) * (SELECT n FROM t)
                     * (SELECT n FROM t) - (SELECT n FROM t)
                     AS DOUBLE)) AS h_corrected""")
def kruskal_wallis(sf_dir: str):
    """KRUSKAL-WALLIS H test: do the seven weekday daily-revenue
    distributions share a location, WITHOUT assuming normality — the
    k-group rank upgrade of mann_whitney and the nonparametric
    sibling of dow_anova. Midranks are kept in EXACT 2-scaled
    integers (2C + c + 1) so ties never touch a float; per-group
    rank sums and the tie-correction sum(t^3 - t) are exact integer
    folds; the quadratic term quantizes per group half-up before the
    fold, and H and its tie-corrected form are shared float
    expressions. The weekday group key is pure integer arithmetic
    on the epoch day ((day+3)%7+1 = ISO dow). Scale plan: per-batch
    (day, cents) partials through the bounded day-domain combine;
    ranking is O(days) on the driver."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True)
    day = d["day"].to_numpy(np.int64)
    v = np.array([int(x) for x in d["v"]], np.int64)
    n = len(v)
    vs, inv, cnt = np.unique(v, return_inverse=True,
                             return_counts=True)
    cumb = np.cumsum(cnt) - cnt
    mr2 = 2 * cumb + cnt + 1                 # 2-scaled midranks
    row_mr2 = mr2[inv]
    dow = ((day + 3) % 7) + 1
    g = pd.DataFrame({"dow": dow, "ng": 1, "r2": row_mr2}) \
        .groupby("dow", as_index=False).sum()
    k = len(g)
    ts = int((cnt.astype(object) ** 3 - cnt.astype(object)).sum())
    q = 0
    for _, r in g.iterrows():
        r2f = np.float64(int(r["r2"]))
        q += int(np.floor(r2f * r2f
                          / (4.0 * np.float64(int(r["ng"])))
                          * 1000000.0 + 0.5))
    fn_ = np.float64(n)
    h = 12.0 / (fn_ * (fn_ + 1.0)) * (np.float64(q) / 1000000.0) \
        - 3.0 * (fn_ + 1.0)
    hc = h / (1.0 - np.float64(ts) / np.float64(n ** 3 - n))
    return pd.DataFrame({
        "n_days": [np.int64(n)], "k_groups": [np.int64(k)],
        "tie_sum": [np.int64(ts)], "h_stat": [np.float64(h)],
        "h_corrected": [np.float64(hc)]})


@register("dp_exponential_pick", sql="""
    WITH u AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY source),
    s AS (SELECT source, n_docs,
                 CAST(floor((({e} / 2.0) * CAST(n_docs AS DOUBLE)
                      + (-ln(-ln(CAST(('0x' || substr(md5(source
                            || ':dp'), 1, 16))::UBIGINT AS DOUBLE)
                         / 18446744073709551616.0))))
                      * 1000000.0 + 0.5) AS BIGINT) AS noisy_micro
          FROM u),
    r AS (SELECT *, CAST(row_number() OVER (ORDER BY noisy_micro
                         DESC, source) AS BIGINT) AS rnk
          FROM s)
    SELECT source, n_docs, noisy_micro, rnk,
           CAST(CASE WHEN rnk = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS picked
    FROM r ORDER BY source""".format(e=_DP_EPS))
def dp_exponential_pick(sf_dir: str):
    """DP EXPONENTIAL MECHANISM selecting the largest source under
    eps=1 differential privacy, via the GUMBEL-MAX TRICK: noisy
    score = (eps/2)*utility + Gumbel noise, argmax — with the Gumbel
    draw -ln(-ln(u)) seeded from a portable md5 uniform (the
    dp_noisy_counts replayable-randomness policy), so the private
    selection is bit-reproducible on any engine. Scores quantize to
    micro units and the argmax is an EXACT integer comparison with
    lexicographic tie-break — no float boundary can change the
    winner. The selection counterpart of dp_noisy_counts' additive
    noise: release WHICH category wins, not the counts. Scale plan:
    per-source count partials (bounded grid); the noisy argmax is
    driver-side on sources rows."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"source": b["source"].to_numpy(object),
                          "n_docs": np.ones(len(b), np.int64)}) \
            .groupby("source", as_index=False).sum()
        g["n_docs"] = g["n_docs"].astype(np.int64)
        return g

    u = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["n_docs"])
    from ...functions.hashing import md5_hex_flat
    hexes = md5_hex_flat([s + ":dp" for s in u["source"]])
    hi = np.array([int(h[:16], 16) for h in hexes], np.uint64)
    unif = hi.astype(np.float64) / 18446744073709551616.0
    gum = -np.log(-np.log(unif))
    nd = u["n_docs"].to_numpy(np.int64)
    noisy = np.floor(((_DP_EPS / 2.0) * nd.astype(np.float64)
                      + gum) * 1000000.0 + 0.5).astype(np.int64)
    out = pd.DataFrame({"source": u["source"], "n_docs": nd,
                        "noisy_micro": noisy}).sort_values(
        ["noisy_micro", "source"], ascending=[False, True],
        kind="mergesort").reset_index(drop=True)
    out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["picked"] = (out["rnk"] == 1).astype(np.int64)
    return out.sort_values("source",
                           kind="mergesort").reset_index(drop=True)


@register("partial_corr", sql="""
    WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS y,
                      CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                        AS x1,
                      CAST(floor(l_tax * 100 + 0.5) AS BIGINT)
                        AS x2
               FROM lineitem),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x1) AS HUGEINT) AS s1,
                 CAST(sum(x2) AS HUGEINT) AS s2,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(x1 * x1) AS HUGEINT) AS s11,
                 CAST(sum(x2 * x2) AS HUGEINT) AS s22,
                 CAST(sum(x1 * y) AS HUGEINT) AS s1y,
                 CAST(sum(x2 * y) AS HUGEINT) AS s2y,
                 CAST(sum(x1 * x2) AS HUGEINT) AS s12
          FROM r),
    c AS (SELECT n,
                 CAST(n * s1y - s1 * sy AS DOUBLE)
                 / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
                   AS r_y1,
                 CAST(n * s2y - s2 * sy AS DOUBLE)
                 / sqrt(CAST(n * s22 - s2 * s2 AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
                   AS r_y2,
                 CAST(n * s12 - s1 * s2 AS DOUBLE)
                 / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
                        * CAST(n * s22 - s2 * s2 AS DOUBLE))
                   AS r_12
          FROM m)
    SELECT CAST(n AS BIGINT) AS n_rows, r_y1, r_y2, r_12,
           (r_y1 - r_y2 * r_12)
           / sqrt((1.0 - r_y2 * r_y2) * (1.0 - r_12 * r_12))
             AS partial_r
    FROM c""")
def partial_corr(sf_dir: str):
    """PARTIAL CORRELATION of quantity with discount CONTROLLING
    for tax: r_y1.2 = (r_y1 - r_y2*r_12) / sqrt((1-r_y2^2)
    (1-r_12^2)) — does the discount-quantity relationship survive
    once the confounder is partialled out? The causal-adjustment
    companion of discount_quantity_corr and multi_ols. All three
    pairwise correlations are built from EXACT integer moments
    (HUGEINT / python int) with one shared float expression each,
    and the partial is one more shared expression on those — no
    float accumulates anywhere. Scale plan: 10-cell moment partials
    per batch (python-int second moments), map-only, O(blocks)
    driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_discount",
                                  "l_tax"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_quantity"].to_numpy(np.int64).astype(object)
        x1 = np.floor(b["l_discount"].to_numpy(np.float64) * 100
                      + 0.5).astype(np.int64).astype(object)
        x2 = np.floor(b["l_tax"].to_numpy(np.float64) * 100
                      + 0.5).astype(np.int64).astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sy": [int(y.sum())], "s1": [int(x1.sum())],
            "s2": [int(x2.sum())], "syy": [int((y * y).sum())],
            "s11": [int((x1 * x1).sum())],
            "s22": [int((x2 * x2).sum())],
            "s1y": [int((x1 * y).sum())],
            "s2y": [int((x2 * y).sum())],
            "s12": [int((x1 * x2).sum())]})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "sy", "s1", "s2", "syy", "s11", "s22",
                "s1y", "s2y", "s12"], exact_int=True)
    n = int(s["n"].iloc[0])
    sy, s1, s2 = (int(s[c].iloc[0]) for c in ("sy", "s1", "s2"))
    syy, s11, s22 = (int(s[c].iloc[0])
                     for c in ("syy", "s11", "s22"))
    s1y, s2y, s12 = (int(s[c].iloc[0])
                     for c in ("s1y", "s2y", "s12"))
    ry1 = np.float64(n * s1y - s1 * sy) \
        / np.sqrt(np.float64(n * s11 - s1 * s1)
                  * np.float64(n * syy - sy * sy))
    ry2 = np.float64(n * s2y - s2 * sy) \
        / np.sqrt(np.float64(n * s22 - s2 * s2)
                  * np.float64(n * syy - sy * sy))
    r12 = np.float64(n * s12 - s1 * s2) \
        / np.sqrt(np.float64(n * s11 - s1 * s1)
                  * np.float64(n * s22 - s2 * s2))
    pr = (ry1 - ry2 * r12) \
        / np.sqrt((1.0 - ry2 * ry2) * (1.0 - r12 * r12))
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "r_y1": [np.float64(ry1)],
        "r_y2": [np.float64(ry2)], "r_12": [np.float64(r12)],
        "partial_r": [np.float64(pr)]})
