# round-5 session-5 additions, batch 15: Breusch-Pagan
# heteroskedasticity test on the two-regressor OLS residuals, the
# Hill tail-index estimator on top order statistics, and Colley
# ratings via three unrolled Jacobi iterations.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)

_HILL_K = 100


@register("breusch_pagan", sql="""
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
                 CAST(sum(x1 * x1) AS HUGEINT) AS s11,
                 CAST(sum(x2 * x2) AS HUGEINT) AS s22,
                 CAST(sum(x1 * x2) AS HUGEINT) AS s12,
                 CAST(sum(x1 * y) AS HUGEINT) AS s1y,
                 CAST(sum(x2 * y) AS HUGEINT) AS s2y
          FROM r),
    c AS (SELECT n, sy, s1, s2, s11, s22, s12,
                 CAST((n * s1y - s1 * sy) * (n * s22 - s2 * s2)
                      - (n * s2y - s2 * sy) * (n * s12 - s1 * s2)
                      AS DOUBLE)
                 / CAST((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                        - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)
                        AS DOUBLE) AS b1,
                 CAST((n * s2y - s2 * sy) * (n * s11 - s1 * s1)
                      - (n * s1y - s1 * sy) * (n * s12 - s1 * s2)
                      AS DOUBLE)
                 / CAST((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                        - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)
                        AS DOUBLE) AS b2
          FROM m),
    ic AS (SELECT b1, b2,
                  (CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE)
                   - b2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE)
                    AS b0,
                  n, s1, s2, s11, s22, s12
           FROM c),
    e AS (SELECT x1, x2,
                 CAST(floor((CAST(y AS DOUBLE)
                      - (SELECT b0 FROM ic)
                      - (SELECT b1 FROM ic) * CAST(x1 AS DOUBLE)
                      - (SELECT b2 FROM ic) * CAST(x2 AS DOUBLE))
                      * (CAST(y AS DOUBLE)
                         - (SELECT b0 FROM ic)
                         - (SELECT b1 FROM ic) * CAST(x1 AS DOUBLE)
                         - (SELECT b2 FROM ic)
                           * CAST(x2 AS DOUBLE))
                      * 1000.0 + 0.5) AS BIGINT) AS q
          FROM r),
    a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(q) AS HUGEINT) AS sq,
                 CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT)
                   AS sqq,
                 CAST(sum(x1 * q) AS HUGEINT) AS s1q,
                 CAST(sum(x2 * q) AS HUGEINT) AS s2q
          FROM e),
    z AS (SELECT a.n, a.sq, a.sqq, a.s1q, a.s2q,
                 ic.s1, ic.s2, ic.s11, ic.s22, ic.s12
          FROM a CROSS JOIN ic),
    f AS (SELECT n,
                 CAST((n * s1q - s1 * sq) * (n * s22 - s2 * s2)
                      - (n * s2q - s2 * sq) * (n * s12 - s1 * s2)
                      AS DOUBLE)
                 / CAST((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                        - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)
                        AS DOUBLE) AS g1,
                 CAST((n * s2q - s2 * sq) * (n * s11 - s1 * s1)
                      - (n * s1q - s1 * sq) * (n * s12 - s1 * s2)
                      AS DOUBLE)
                 / CAST((n * s11 - s1 * s1) * (n * s22 - s2 * s2)
                        - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)
                        AS DOUBLE) AS g2,
                 CAST(n * s1q - s1 * sq AS DOUBLE) AS c1q,
                 CAST(n * s2q - s2 * sq AS DOUBLE) AS c2q,
                 CAST(n * sqq - sq * sq AS DOUBLE) AS cqq
          FROM z)
    SELECT CAST(n AS BIGINT) AS n_rows,
           (g1 * c1q + g2 * c2q) / cqq AS aux_r2,
           CAST(n AS DOUBLE) * ((g1 * c1q + g2 * c2q) / cqq)
             AS bp_lm
    FROM f""")
def breusch_pagan(sf_dir: str):
    """BREUSCH-PAGAN heteroskedasticity test on the multi_ols fit
    (quantity ~ discount + tax): squared residuals, quantized
    per row to milli units with the shared half-up formula (the
    residuals themselves are identical doubles — built from
    Cramer-exact coefficients), are regressed back on the
    regressors; LM = n * R^2_aux flags variance that moves with the
    features — the diagnostics operator that tells you whether
    multi_ols' standard errors can be trusted. The auxiliary R^2
    uses the SAME exact-integer centered-moment machinery (the
    quantized e^2 enters as just another integer column). Scale
    plan: two map-only moment passes (the coefficient pass and the
    residual pass), each folding a fixed cell count; no row-grain
    exchange."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_discount",
                                  "l_tax"])

    def pass1(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_quantity"].to_numpy(np.int64).astype(object)
        x1 = np.floor(b["l_discount"].to_numpy(np.float64) * 100
                      + 0.5).astype(np.int64).astype(object)
        x2 = np.floor(b["l_tax"].to_numpy(np.float64) * 100
                      + 0.5).astype(np.int64).astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sy": [int(y.sum())], "s1": [int(x1.sum())],
            "s2": [int(x2.sum())],
            "s11": [int((x1 * x1).sum())],
            "s22": [int((x2 * x2).sum())],
            "s12": [int((x1 * x2).sum())],
            "s1y": [int((x1 * y).sum())],
            "s2y": [int((x2 * y).sum())]})

    s = _combine_partials(
        ds.map_batches(pass1, batch_format="pandas"),
        ["j"], ["n", "sy", "s1", "s2", "s11", "s22", "s12",
                "s1y", "s2y"], exact_int=True)
    n = int(s["n"].iloc[0])
    sy, s1, s2 = (int(s[c].iloc[0]) for c in ("sy", "s1", "s2"))
    s11, s22, s12 = (int(s[c].iloc[0])
                     for c in ("s11", "s22", "s12"))
    s1y, s2y = int(s["s1y"].iloc[0]), int(s["s2y"].iloc[0])
    det = (n * s11 - s1 * s1) * (n * s22 - s2 * s2) \
        - (n * s12 - s1 * s2) * (n * s12 - s1 * s2)
    b1 = np.float64((n * s1y - s1 * sy) * (n * s22 - s2 * s2)
                    - (n * s2y - s2 * sy) * (n * s12 - s1 * s2)) \
        / np.float64(det)
    b2 = np.float64((n * s2y - s2 * sy) * (n * s11 - s1 * s1)
                    - (n * s1y - s1 * sy) * (n * s12 - s1 * s2)) \
        / np.float64(det)
    b0 = (np.float64(sy) - b1 * np.float64(s1)
          - b2 * np.float64(s2)) / np.float64(n)

    def pass2(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_quantity"].to_numpy(np.int64).astype(np.float64)
        x1i = np.floor(b["l_discount"].to_numpy(np.float64) * 100
                       + 0.5).astype(np.int64)
        x2i = np.floor(b["l_tax"].to_numpy(np.float64) * 100
                       + 0.5).astype(np.int64)
        e = y - b0 - b1 * x1i.astype(np.float64) \
            - b2 * x2i.astype(np.float64)
        q = np.floor(e * e * 1000.0 + 0.5).astype(np.int64) \
            .astype(object)
        x1 = x1i.astype(object)
        x2 = x2i.astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sq": [int(q.sum())], "sqq": [int((q * q).sum())],
            "s1q": [int((x1 * q).sum())],
            "s2q": [int((x2 * q).sum())]})

    a = _combine_partials(
        ds.map_batches(pass2, batch_format="pandas"),
        ["j"], ["n", "sq", "sqq", "s1q", "s2q"], exact_int=True)
    sq = int(a["sq"].iloc[0])
    sqq = int(a["sqq"].iloc[0])
    s1q, s2q = int(a["s1q"].iloc[0]), int(a["s2q"].iloc[0])
    g1 = np.float64((n * s1q - s1 * sq) * (n * s22 - s2 * s2)
                    - (n * s2q - s2 * sq) * (n * s12 - s1 * s2)) \
        / np.float64(det)
    g2 = np.float64((n * s2q - s2 * sq) * (n * s11 - s1 * s1)
                    - (n * s1q - s1 * sq) * (n * s12 - s1 * s2)) \
        / np.float64(det)
    c1q = np.float64(n * s1q - s1 * sq)
    c2q = np.float64(n * s2q - s2 * sq)
    cqq = np.float64(n * sqq - sq * sq)
    r2 = (g1 * c1q + g2 * c2q) / cqq
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "aux_r2": [np.float64(r2)],
        "bp_lm": [np.float64(n) * r2]})


@register("hill_estimator", sql="""
    WITH v AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS x,
                      o_orderkey AS k
               FROM orders),
    top AS (SELECT x, row_number() OVER (ORDER BY x DESC, k)
                     AS i
            FROM v),
    sel AS (SELECT x, i FROM top WHERE i <= {k} + 1),
    xk AS (SELECT x AS xmin FROM sel WHERE i = {k} + 1),
    s AS (SELECT CAST(sum(CASE WHEN i <= {k} THEN
                 CAST(floor(ln(CAST(x AS DOUBLE)
                      / CAST((SELECT xmin FROM xk) AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS lsum
          FROM sel)
    SELECT CAST({k} AS BIGINT) AS k_top,
           (SELECT xmin FROM xk) AS threshold_cents,
           (SELECT lsum FROM s) AS log_sum_micro,
           CAST({k} AS DOUBLE)
           / (CAST((SELECT lsum FROM s) AS DOUBLE) / 1000000.0)
             AS hill_alpha""".format(k=_HILL_K))
def hill_estimator(sf_dir: str):
    """HILL TAIL-INDEX estimator on the top {k} order values:
    alpha = k / sum ln(x_(i)/x_(k+1)) over the k largest order
    totals — the canonical heavy-tail exponent that says whether
    revenue (or document length, or token counts) has a power-law
    tail that invalidates mean-based capacity planning (the
    threshold-exceedance complement of gumbel_block_maxima's block
    approach, kin to zipf_fit). Each log ratio of exact integer
    cents quantizes to micro units half-up before the integer fold;
    alpha is one shared float expression. Scale plan: per-batch
    local top-(k+1) partials merge on the driver (the topk combiner
    shape — k x blocks rows); nothing row-grain is shuffled."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])
    k = _HILL_K

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        d = pd.DataFrame({
            "x": x, "k": b["o_orderkey"].to_numpy(np.int64)})
        return d.sort_values(["x", "k"], ascending=[False, True],
                             kind="mergesort").head(k + 1)

    parts = ds.map_batches(local_top, batch_format="pandas") \
        .limit(1_000_001).to_pandas()
    if len(parts) > 1_000_000:
        raise ValueError("hill_estimator: top-k partials exceeded "
                         "the driver bound")
    top = parts.sort_values(["x", "k"], ascending=[False, True],
                            kind="mergesort").head(k + 1)
    xs = top["x"].to_numpy(np.int64)
    xmin = int(xs[k])
    lsum = int(np.floor(
        np.log(xs[:k].astype(np.float64) / np.float64(xmin))
        * 1000000.0 + 0.5).astype(np.int64).sum())
    return pd.DataFrame({
        "k_top": [np.int64(k)],
        "threshold_cents": [np.int64(xmin)],
        "log_sum_micro": [np.int64(lsum)],
        "hill_alpha": [np.float64(k)
                       / (np.float64(lsum) / 1000000.0)]})
