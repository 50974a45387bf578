# round-5 session-5 additions, batch 28: the energy-distance
# two-sample statistic over the bounded quantity domain, the Wald
# instrumental-variable estimator, and a group fairness audit of
# the length heuristic.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)

_FA_CHARS = 300
_FA_TOKS = 55
_FA_DIST = 25
_FA_GAP = 0.05


@register("energy_distance", sql="""
    WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END) AS BIGINT) AS a,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 0 ELSE 1 END) AS BIGINT) AS b
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(a) AS HUGEINT) AS n,
                 CAST(sum(b) AS HUGEINT) AS m FROM h),
    p AS (SELECT CAST(sum(x.a * y.b * abs(x.v - y.v)) AS HUGEINT)
                   AS sxy,
                 CAST(sum(x.a * y.a * abs(x.v - y.v)) AS HUGEINT)
                   AS sxx,
                 CAST(sum(x.b * y.b * abs(x.v - y.v)) AS HUGEINT)
                   AS syy
          FROM h x JOIN h y ON TRUE)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_returned,
           CAST((SELECT m FROM t) AS BIGINT) AS n_kept,
           2.0 * CAST((SELECT sxy FROM p) AS DOUBLE)
             / (CAST((SELECT n FROM t) AS DOUBLE)
                * CAST((SELECT m FROM t) AS DOUBLE))
           - CAST((SELECT sxx FROM p) AS DOUBLE)
             / (CAST((SELECT n FROM t) AS DOUBLE)
                * CAST((SELECT n FROM t) AS DOUBLE))
           - CAST((SELECT syy FROM p) AS DOUBLE)
             / (CAST((SELECT m FROM t) AS DOUBLE)
                * CAST((SELECT m FROM t) AS DOUBLE))
             AS energy_distance""")
def energy_distance(sf_dir: str):
    """ENERGY DISTANCE between returned and kept quantity
    distributions: 2E|X-Y| - E|X-X'| - E|Y-Y'| (V-statistic form,
    documented) — the metric-based two-sample statistic with power
    against ANY distributional difference, completing the ks_2samp
    (supremum) / cramer_von_mises (quadratic EDF) family. Every
    expectation reduces to EXACT integer convolutions of the two
    bounded-domain histograms (sum h(a)h(b)|a-b|, ~50x50 cells), so
    the statistic is three exact-int ratios in one shared float
    expression. Scale plan: per-batch (quantity, flag) histogram
    partials; the O(domain^2) convolution is driver arithmetic —
    the value domain, not row count, bounds everything."""
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
        ["v"], ["a", "b"])
    v = h["v"].to_numpy(np.int64)
    a = h["a"].to_numpy(np.int64).astype(object)
    b = h["b"].to_numpy(np.int64).astype(object)
    n = int(a.sum())
    m = int(b.sum())
    dm = np.abs(v[:, None] - v[None, :]).astype(object)
    sxy = int((a[:, None] * b[None, :] * dm).sum())
    sxx = int((a[:, None] * a[None, :] * dm).sum())
    syy = int((b[:, None] * b[None, :] * dm).sum())
    e = 2.0 * np.float64(sxy) / (np.float64(n) * np.float64(m)) \
        - np.float64(sxx) / (np.float64(n) * np.float64(n)) \
        - np.float64(syy) / (np.float64(m) * np.float64(m))
    return pd.DataFrame({
        "n_returned": [np.int64(n)], "n_kept": [np.int64(m)],
        "energy_distance": [np.float64(e)]})


@register("iv_wald", sql="""
    WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                      CAST(floor(l_extendedprice * 100 + 0.5)
                           AS BIGINT) AS y,
                      CAST(CASE WHEN l_discount > 0
                           THEN 1 ELSE 0 END AS BIGINT) AS z
               FROM lineitem),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(z) AS HUGEINT) AS sz,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(z * x) AS HUGEINT) AS szx,
                 CAST(sum(z * y) AS HUGEINT) AS szy
          FROM r)
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(sz AS BIGINT) AS n_instrumented,
           CAST(n * szx - sz * sx AS DOUBLE)
             / CAST(n * sz - sz * sz AS DOUBLE)
             AS first_stage_slope,
           CAST(n * szy - sz * sy AS DOUBLE)
             / CAST(n * szx - sz * sx AS DOUBLE) AS iv_wald
    FROM m""")
def iv_wald(sf_dir: str):
    """WALD INSTRUMENTAL-VARIABLE estimator: the discount indicator
    instruments quantity's effect on line revenue — IV =
    cov(z,y)/cov(z,x), with the first-stage slope
    cov(z,x)/var(z) reported as the instrument-strength check (the
    weak-instrument gate) — the 2SLS primitive in its simplest
    binary-instrument form, completing the causal family
    (diff_in_diff needs panels, rdd_estimate a cutoff; IV needs an
    exogenous shifter). Every covariance is the exact-integer
    centered expansion (n*Sab - Sa*Sb) and both ratios are shared
    float divisions. Scale plan: map-only 6-cell moment partials,
    O(blocks) driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].to_numpy(np.int64).astype(object)
        y = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64).astype(object)
        z = (b["l_discount"].to_numpy(np.float64)
             > 0).astype(np.int64).astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sz": [int(z.sum())], "sx": [int(x.sum())],
            "sy": [int(y.sum())], "szx": [int((z * x).sum())],
            "szy": [int((z * y).sum())]})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "sz", "sx", "sy", "szx", "szy"],
        exact_int=True)
    n = int(s["n"].iloc[0])
    sz, sx, sy = (int(s[c].iloc[0]) for c in ("sz", "sx", "sy"))
    szx, szy = int(s["szx"].iloc[0]), int(s["szy"].iloc[0])
    return pd.DataFrame({
        "n_rows": [np.int64(n)],
        "n_instrumented": [np.int64(sz)],
        "first_stage_slope": [np.float64(n * szx - sz * sx)
                              / np.float64(n * sz - sz * sz)],
        "iv_wald": [np.float64(n * szy - sz * sy)
                    / np.float64(n * szx - sz * sx)]})


@register("fairness_audit", sql="""
    WITH lab AS (SELECT lang,
        CASE WHEN n_chars >= {ch} THEN 1 ELSE 0 END AS p,
        CASE WHEN (CASE WHEN n_chars >= {ch} THEN 1 ELSE 0 END)
                  + (CASE WHEN CAST(CASE WHEN trim(text,
                         E' \\t\\n\\r\\f') = '' THEN 0
                       ELSE len(string_split_regex(trim(text,
                         E' \\t\\n\\r\\f'), '[ \\t\\n\\r\\f]+'))
                       END AS BIGINT) >= {tk}
                     THEN 1 ELSE 0 END)
                  + (CASE WHEN CAST(CASE WHEN trim(text,
                         E' \\t\\n\\r\\f') = '' THEN 0
                       ELSE len(list_distinct(string_split_regex(
                         trim(text, E' \\t\\n\\r\\f'),
                         '[ \\t\\n\\r\\f]+'))) END
                       AS BIGINT) >= {ds} THEN 1 ELSE 0 END)
                  >= 2 THEN 1 ELSE 0 END AS y
        FROM documents),
    g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(p) AS BIGINT) AS np_,
                 CAST(sum(y) AS BIGINT) AS ny,
                 CAST(sum(p * y) AS BIGINT) AS tp,
                 CAST(sum(p * (1 - y)) AS BIGINT) AS fp
          FROM lab GROUP BY lang),
    t AS (SELECT CAST(sum(np_) AS BIGINT) AS tnp,
                 CAST(sum(n) AS BIGINT) AS tn FROM g)
    SELECT lang, n AS n_docs,
           CAST(np_ AS DOUBLE) / CAST(n AS DOUBLE) AS sel_rate,
           CAST(tp AS DOUBLE) / CAST(ny AS DOUBLE) AS tpr,
           CAST(fp AS DOUBLE) / CAST(n - ny AS DOUBLE) AS fpr,
           CAST(CASE WHEN abs(CAST(np_ AS DOUBLE)
                              / CAST(n AS DOUBLE)
                              - CAST((SELECT tnp FROM t) AS DOUBLE)
                                / CAST((SELECT tn FROM t)
                                       AS DOUBLE)) > {gp}
                     THEN 1 ELSE 0 END AS BIGINT) AS parity_flag
    FROM g ORDER BY lang""".format(ch=_FA_CHARS, tk=_FA_TOKS,
                                   ds=_FA_DIST, gp=_FA_GAP))
def fairness_audit(sf_dir: str):
    """GROUP FAIRNESS AUDIT of the char-length classifier by
    language: per-group selection rate (demographic parity), TPR
    and FPR against the majority-vote working truth (equalized
    odds), with a parity flag when a group's selection rate strays
    more than 5 points from the corpus rate — the responsible-AI
    audit every production filter (quality_classifier /
    gopher_rules) owes its languages before deployment. All
    confusion cells are exact integer folds; rates and the flag's
    boundary comparison are identical shared float expressions on
    both engines. Scale plan: map-only per-lang confusion partials
    into a bounded grid; the audit math is driver-side."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "n_chars", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        doc = np.repeat(np.arange(len(b), dtype=np.int64), k)
        dis = pd.DataFrame(
            {"doc": doc,
             "term": vals.to_numpy(zero_copy_only=False)}) \
            .drop_duplicates().groupby("doc").size() \
            .reindex(np.arange(len(b)), fill_value=0) \
            .to_numpy(np.int64)
        a = (b["n_chars"].to_numpy(np.int64)
             >= _FA_CHARS).astype(np.int64)
        t = (k >= _FA_TOKS).astype(np.int64)
        c = (dis >= _FA_DIST).astype(np.int64)
        y = ((a + t + c) >= 2).astype(np.int64)
        g = pd.DataFrame({
            "lang": b["lang"].to_numpy(object),
            "n": np.ones(len(b), np.int64), "np_": a, "ny": y,
            "tp": a * y, "fp": a * (1 - y)}) \
            .groupby("lang", as_index=False).sum()
        for col in ("n", "np_", "ny", "tp", "fp"):
            g[col] = g[col].astype(np.int64)
        return g

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang"], ["n", "np_", "ny", "tp", "fp"]).sort_values(
        "lang", kind="mergesort").reset_index(drop=True)
    tnp = int(g["np_"].sum())
    tn = int(g["n"].sum())
    grate = np.float64(tnp) / np.float64(tn)
    n = g["n"].to_numpy(np.int64).astype(np.float64)
    npp = g["np_"].to_numpy(np.int64).astype(np.float64)
    ny = g["ny"].to_numpy(np.int64).astype(np.float64)
    tp = g["tp"].to_numpy(np.int64).astype(np.float64)
    fp = g["fp"].to_numpy(np.int64).astype(np.float64)
    sel = npp / n
    return pd.DataFrame({
        "lang": g["lang"], "n_docs": g["n"].astype(np.int64),
        "sel_rate": sel, "tpr": tp / ny, "fpr": fp / (n - ny),
        "parity_flag": (np.abs(sel - grate)
                        > _FA_GAP).astype(np.int64)})
