# round-5 session-5 additions, batch 63: acquisition cohort quality
# trend, the F1-optimal threshold sweep, and rank-biased precision.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_RBP_P_MICRO = 800000      # persistence p = 0.8 in micro units
_RBP_K = 10


@register("cohort_quality_trend", sql="""
    WITH f AS (SELECT o_custkey,
                      min(o_orderdate) AS fd
               FROM orders GROUP BY o_custkey),
    fv AS (SELECT f.o_custkey,
                  CAST(year(f.fd) * 12 + month(f.fd) AS BIGINT)
                    AS mo,
                  CAST(floor(min_by(o.o_totalprice, o.o_orderkey)
                       * 100 + 0.5) AS BIGINT) AS first_cents
           FROM f JOIN orders o
             ON o.o_custkey = f.o_custkey
            AND o.o_orderdate = f.fd
           GROUP BY f.o_custkey, f.fd),
    m AS (SELECT mo, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(first_cents) AS BIGINT) AS s
          FROM fv GROUP BY mo),
    q AS (SELECT mo,
                 CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS mm,
                 row_number() OVER (ORDER BY mo) AS t
          FROM m),
    r AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                 CAST(sum(t) AS HUGEINT) AS sx,
                 CAST(sum(mm) AS HUGEINT) AS sy,
                 CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(t AS HUGEINT) * mm) AS HUGEINT)
                   AS sxy
          FROM q)
    SELECT CAST(k AS BIGINT) AS n_cohorts,
           CAST(k * sxy - sx * sy AS DOUBLE)
           / CAST(k * sxx - sx * sx AS DOUBLE) / 1000000.0
             AS quality_slope_cents_per_month,
           CAST(CASE WHEN k * sxy - sx * sy < 0 THEN 1 ELSE 0 END
                AS BIGINT) AS is_declining
    FROM r""")
def cohort_quality_trend(sf_dir: str):
    """ACQUISITION COHORT QUALITY TREND: each customer's FIRST
    order value (earliest date, smallest orderkey tie-break)
    averaged by acquisition month, regressed on cohort index — a
    negative slope is the early-warning that newer cohorts arrive
    smaller, long before LTV curves (ltv_cohorts) mature enough to
    show it. First-order values are exact cents (min_by with the
    key tie-break mirrored on both engines), cohort means quantize
    to micro, and the slope plus the exact-sign verdict are shared
    expressions over exact integer folds. Scale plan: first-order
    extraction inside one custkey exchange; the cohort-month
    regression is O(months) driver work."""
    ds = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        t = pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "d": d, "k": b["o_orderkey"].to_numpy(np.int64),
            "v": cents,
            "mo": (b["o_orderdate"].dt.year
                   .to_numpy(np.int64) * 12
                   + b["o_orderdate"].dt.month
                   .to_numpy(np.int64))})
        return t.sort_values(["d", "k"], kind="mergesort") \
            .drop_duplicates("cust")

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.sort_values(["d", "k"], kind="mergesort") \
            .drop_duplicates("cust")
        out = a.groupby("mo", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"))
        for c in ("n", "s"):
            out[c] = out[c].astype(np.int64)
        return out

    m = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["cust"], cells, 16),
        ["mo"], ["n", "s"], exact_int=True).sort_values("mo") \
        .reset_index(drop=True)
    mm = [int(np.floor(np.float64(int(r["s"]))
                       / np.float64(int(r["n"]))
                       * 1000000.0 + 0.5))
          for _, r in m.iterrows()]
    k = len(mm)
    t = list(range(1, k + 1))
    sx, sy = sum(t), sum(mm)
    sxx = sum(x * x for x in t)
    sxy = sum(x * y for x, y in zip(t, mm))
    num = k * sxy - sx * sy
    return pd.DataFrame({
        "n_cohorts": [np.int64(k)],
        "quality_slope_cents_per_month":
            [np.float64(num) / np.float64(k * sxx - sx * sx)
             / 1000000.0],
        "is_declining": [np.int64(1 if num < 0 else 0)]})


@register("f1_threshold", sql="""
    WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END) AS BIGINT) AS a,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 0 ELSE 1 END) AS BIGINT) AS b
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(a) AS BIGINT) AS pos FROM h),
    c AS (SELECT v,
                 CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS tp,
                 CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS fp
          FROM h),
    sc AS (SELECT v, tp, fp,
                  CAST(2 * tp AS HUGEINT) AS num,
                  CAST(tp + fp + (SELECT pos FROM t) AS HUGEINT)
                    AS den
           FROM c),
    best AS (SELECT v, tp, fp, num, den,
                    row_number() OVER (ORDER BY
                        CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                        DESC, v) AS r
             FROM sc)
    SELECT CAST(v AS BIGINT) AS threshold, tp AS true_pos,
           fp AS false_pos,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS f1
    FROM best WHERE r = 1""")
def f1_threshold(sf_dir: str):
    """F1-OPTIMAL THRESHOLD sweep for 'predict returned when
    quantity <= t': F1 = 2TP / (TP+FP + P) swept over every
    threshold on the bounded histogram — the metric-specific
    operating point that differs from c2st_stump's accuracy
    optimum whenever classes are imbalanced (the tuning step
    between a score and a deployable rule). TP/FP prefix counts
    and the F1 numerator/denominator are exact integers; the
    argmax compares identical doubles with the threshold
    tie-break. Scale plan: per-batch (quantity, flag) histogram
    partials; the sweep is O(domain) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_returnflag"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["l_quantity"].to_numpy(np.int64)
        r = (b["l_returnflag"].to_numpy(object)
             == "R").astype(np.int64)
        g = pd.DataFrame({"v": v, "a": r, "b": 1 - r}) \
            .groupby("v", as_index=False).sum()
        for c in ("a", "b"):
            g[c] = g[c].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["v"], ["a", "b"]).sort_values("v").reset_index(drop=True)
    v = h["v"].to_numpy(np.int64)
    tp = np.cumsum(h["a"].to_numpy(np.int64))
    fp = np.cumsum(h["b"].to_numpy(np.int64))
    pos = int(tp[-1])
    f1 = (2.0 * tp.astype(np.float64)) \
        / (tp + fp + pos).astype(np.float64)
    order = np.lexsort((v, -f1))
    k = order[0]
    return pd.DataFrame({
        "threshold": [np.int64(int(v[k]))],
        "true_pos": [np.int64(int(tp[k]))],
        "false_pos": [np.int64(int(fp[k]))],
        "f1": [np.float64(f1[k])]})


#: per-position geometric weights floor(0.8^(i-1) * 1e6 + 0.5),
#: precomputed once and inlined as LITERALS in the oracle so both
#: engines share identical integers with no pow() portability risk
_RBP_W = (1000000, 800000, 640000, 512000, 409600, 327680, 262144, 209715, 167772, 134218)


@register("rbp_eval", sql="""
    WITH rel AS (SELECT doc_id, lang, n_chars,
                        CASE WHEN CAST(substr(source, 4)
                                       AS BIGINT) % 4 >= 2
                             THEN 1 ELSE 0 END AS rel
                 FROM documents),
    rk AS (SELECT lang, rel,
                  row_number() OVER (PARTITION BY lang
                      ORDER BY n_chars DESC, doc_id) AS pos
           FROM rel),
    top AS (SELECT lang, rel, pos FROM rk WHERE pos <= {k}),
    wt AS (SELECT CAST(generate_subscripts(l, 1) AS BIGINT)
                    AS pos,
                  CAST(unnest(l) AS BIGINT) AS w
           FROM (SELECT [{ws}] AS l)),
    w AS (SELECT top.lang,
                 CAST(sum(top.rel * wt.w) AS BIGINT) AS wsum
          FROM top JOIN wt ON wt.pos = top.pos
          GROUP BY top.lang)
    SELECT lang, wsum AS weight_sum_micro,
           (1.0 - {p} / 1000000.0)
           * (CAST(wsum AS DOUBLE) / 1000000.0) AS rbp
    FROM w ORDER BY lang""".format(
    k=_RBP_K, p=_RBP_P_MICRO,
    ws=", ".join(str(x) for x in _RBP_W)))
def rbp_eval(sf_dir: str):
    """RANK-BIASED PRECISION (p = 0.8) per language on the shared
    length ranking and binary relevance labels: RBP = (1-p) sum
    rel_i p^(i-1) — the user-persistence metric that, unlike
    MAP/NDCG (map_eval, ndcg_eval), models a reader who inspects
    each next result with probability p and therefore stays
    top-weighted even for unbounded lists. Each geometric weight
    is a FIXED per-position double quantized to micro units, so
    per-language sums are exact integer folds and RBP is one
    shared float expression. Scale plan: the topk-per-group local
    merge (k x langs rows); weights are position constants."""
    k = _RBP_K
    p = _RBP_P_MICRO / 1000000.0
    ds = rd.read_parquet(
        _path(sf_dir, "documents"),
        columns=["doc_id", "lang", "n_chars", "source"])

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "lang": b["lang"],
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "n_chars": b["n_chars"].to_numpy(np.int64),
            "rel": np.array([1 if int(s[3:]) % 4 >= 2 else 0
                             for s in b["source"]], np.int64)})
        d = d.sort_values(["lang", "n_chars", "doc_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return d.groupby("lang", as_index=False).head(k)

    parts = ds.map_batches(local_top, batch_format="pandas") \
        .limit(1_000_001).to_pandas()
    if len(parts) > 1_000_000:
        raise ValueError("rbp_eval: top-k partials exceeded the "
                         "driver bound")
    wconst = np.array(_RBP_W, np.int64)
    rows = []
    for lang, g in parts.groupby("lang"):
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True],
                          kind="mergesort").head(k)
        rel = g["rel"].to_numpy(np.int64)
        wsum = int((rel * wconst[:len(rel)]).sum())
        rows.append({
            "lang": lang,
            "weight_sum_micro": np.int64(wsum),
            "rbp": (1.0 - p) * (np.float64(wsum)
                                / 1000000.0)})
    return pd.DataFrame(rows).sort_values(
        "lang", kind="mergesort").reset_index(drop=True)
