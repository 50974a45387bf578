# round-5 session-5 additions, batch 57: the one-step trend
# forecast with a full prediction interval, split-half ranking
# stability via exact Kendall concordance, and the Sobel mediation
# test.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)

_RS_TOP = 200
_PI_Z = 1.959963984540054


@register("trend_forecast_pi", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS sy,
                 CAST(sum(t) AS HUGEINT) AS sx,
                 CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(t AS HUGEINT) * v) AS HUGEINT)
                   AS sxy,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                   AS syy
          FROM x),
    c AS (SELECT CAST(n AS DOUBLE) AS fn,
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
                 (CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                   AS a,
                 CAST((n * syy - sy * sy) * (n * sxx - sx * sx)
                      - (n * sxy - sx * sy)
                        * (n * sxy - sx * sy) AS DOUBLE)
                 / CAST(n * (n * sxx - sx * sx) AS DOUBLE)
                 / (CAST(n AS DOUBLE) - 2.0) AS s2,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xb,
                 CAST(n * sxx - sx * sx AS DOUBLE)
                 / CAST(n AS DOUBLE) AS sxc
          FROM m),
    f AS (SELECT fn, a + b * (fn + 1.0) AS yhat,
                 sqrt(s2 * (1.0 + 1.0 / fn
                      + ((fn + 1.0) - xb) * ((fn + 1.0) - xb)
                        / sxc)) AS se
          FROM c)
    SELECT CAST(fn AS BIGINT) AS n_days, yhat AS forecast_cents,
           yhat - {z} * se AS pi_lower,
           yhat + {z} * se AS pi_upper
    FROM f""".format(z=_PI_Z))
def trend_forecast_pi(sf_dir: str):
    """ONE-STEP TREND FORECAST with a FULL prediction interval:
    the OLS line extrapolated to day n+1, bracketed by
    t*s*sqrt(1 + 1/n + (x*-xbar)^2/Sxx) — the interval that
    includes irreducible day noise, not just parameter
    uncertainty, making it the honest companion to
    conformal_interval's distribution-free band and the missing
    piece of holt/ses point forecasts. All moments are exact
    integer folds; slope, intercept, s^2 (the exact SSR closed
    form) and both bounds are shared float expressions. Scale
    plan: bounded day-domain combine; O(1) driver arithmetic."""
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
        ["day"], ["v"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]
    n = len(v)
    t = list(range(1, n + 1))
    sy = sum(v)
    sx = sum(t)
    sxx = sum(x * x for x in t)
    sxy = sum(a_ * b_ for a_, b_ in zip(t, v))
    syy = sum(x * x for x in v)
    fn_ = np.float64(n)
    dd = n * sxx - sx * sx
    bb = n * sxy - sx * sy
    b = np.float64(bb) / np.float64(dd)
    a = (np.float64(sy) - b * np.float64(sx)) / fn_
    s2 = np.float64((n * syy - sy * sy) * dd - bb * bb) \
        / np.float64(n * dd) / (fn_ - 2.0)
    xb = np.float64(sx) / fn_
    sxc = np.float64(dd) / fn_
    xstar = fn_ + 1.0
    yhat = a + b * xstar
    se = np.sqrt(s2 * (1.0 + 1.0 / fn_
                       + (xstar - xb) * (xstar - xb) / sxc))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "forecast_cents": [np.float64(yhat)],
        "pi_lower": [yhat - _PI_Z * se],
        "pi_upper": [yhat + _PI_Z * se]})


@register("rank_stability", sql="""
    WITH li AS (SELECT l_partkey AS pk, l_orderkey AS ok,
                       CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS r
                FROM lineitem),
    m AS (SELECT pk,
                 CAST(sum(CASE WHEN ok % 2 = 0 THEN r ELSE 0 END)
                      AS BIGINT) AS re,
                 CAST(sum(CASE WHEN ok % 2 = 1 THEN r ELSE 0 END)
                      AS BIGINT) AS ro,
                 CAST(sum(r) AS BIGINT) AS rt
          FROM li GROUP BY pk),
    top AS (SELECT pk, re, ro FROM (
              SELECT pk, re, ro,
                     row_number() OVER (ORDER BY rt DESC, pk)
                       AS i
              FROM m)
            WHERE i <= {k}),
    r1 AS (SELECT pk, row_number() OVER (ORDER BY re DESC, pk)
                     AS ra
           FROM top),
    r2 AS (SELECT pk, row_number() OVER (ORDER BY ro DESC, pk)
                     AS rb
           FROM top),
    j AS (SELECT r1.pk, r1.ra, r2.rb FROM r1
          JOIN r2 ON r2.pk = r1.pk),
    p AS (SELECT CAST(sum(CASE WHEN (a.ra - b.ra)
                                    * (a.rb - b.rb) > 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS conc,
                 CAST(count(*) AS BIGINT) AS pairs
          FROM j a JOIN j b ON a.pk < b.pk)
    SELECT CAST({k} AS BIGINT) AS n_parts,
           (SELECT conc FROM p) AS concordant_pairs,
           (SELECT pairs FROM p) AS total_pairs,
           2.0 * CAST(2 * (SELECT conc FROM p)
                      - (SELECT pairs FROM p) AS DOUBLE)
             / (2.0 * CAST((SELECT pairs FROM p) AS DOUBLE))
             AS kendall_tau""".format(k=_RS_TOP))
def rank_stability(sf_dir: str):
    """SPLIT-HALF RANKING STABILITY of the revenue top-{k} parts:
    rank the same parts by even-order revenue and by odd-order
    revenue and measure Kendall tau between the two rankings —
    tau near 1 says the leaderboard is signal, near 0 says
    sampling noise reshuffles it (the ranking counterpart of
    split_half_reliability's metric check; the caveat every
    'top sellers' report needs). Half-revenues and ranks are
    exact integers; concordance is an exact pair census (both
    rankings are permutations, so no ties) and tau is one shared
    expression. Scale plan: per-part half-cells fold through
    part-keyed partials; the top-{k} concordance census is
    O(k^2) driver work (merge-sort inversions at larger k)."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_orderkey", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        r = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64)
        even = (b["l_orderkey"].to_numpy(np.int64) % 2 == 0)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "re": np.where(even, r, 0),
            "ro": np.where(even, 0, r), "rt": r}) \
            .groupby("pk", as_index=False).sum()
        for c in ("re", "ro", "rt"):
            g[c] = g[c].astype(np.int64)
        return g

    m = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["pk"], ["re", "ro", "rt"], exact_int=True)
    m = m.assign(rt_int=m["rt"].map(int)).sort_values(
        ["rt_int", "pk"], ascending=[False, True],
        kind="mergesort").head(_RS_TOP)
    pk = m["pk"].to_numpy(np.int64)
    re = np.array([int(x) for x in m["re"]], object)
    ro = np.array([int(x) for x in m["ro"]], object)

    def ranks(vals) -> np.ndarray:
        order = sorted(range(len(pk)),
                       key=lambda i: (-int(vals[i]), int(pk[i])))
        r = np.empty(len(pk), np.int64)
        for pos, i in enumerate(order, start=1):
            r[i] = pos
        return r

    ra = ranks(re)
    rb = ranks(ro)
    conc = 0
    pairs = 0
    for i in range(len(pk)):
        for j in range(i + 1, len(pk)):
            pairs += 1
            if (int(ra[i]) - int(ra[j])) \
                    * (int(rb[i]) - int(rb[j])) > 0:
                conc += 1
    tau = 2.0 * np.float64(2 * conc - pairs) \
        / (2.0 * np.float64(pairs))
    return pd.DataFrame({
        "n_parts": [np.int64(_RS_TOP)],
        "concordant_pairs": [np.int64(conc)],
        "total_pairs": [np.int64(pairs)],
        "kendall_tau": [np.float64(tau)]})


@register("sobel_mediation", sql="""
    WITH r AS (SELECT CAST(floor(l_discount * 100 + 0.5)
                           AS BIGINT) AS d,
                      CAST(l_quantity AS BIGINT) AS q,
                      CAST(floor(l_extendedprice * 100 + 0.5)
                           AS BIGINT) AS y
               FROM lineitem),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(d) AS HUGEINT) AS sd_,
                 CAST(sum(q) AS HUGEINT) AS sq,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(d * d) AS HUGEINT) AS sdd,
                 CAST(sum(q * q) AS HUGEINT) AS sqq,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(d * q) AS HUGEINT) AS sdq,
                 CAST(sum(d * y) AS HUGEINT) AS sdy,
                 CAST(sum(q * y) AS HUGEINT) AS sqy
          FROM r),
    c AS (SELECT CAST(n AS DOUBLE) AS fn,
                 CAST(n * sdd - sd_ * sd_ AS DOUBLE) AS cdd,
                 CAST(n * sqq - sq * sq AS DOUBLE) AS cqq,
                 CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
                 CAST(n * sdq - sd_ * sq AS DOUBLE) AS cdq,
                 CAST(n * sdy - sd_ * sy AS DOUBLE) AS cdy,
                 CAST(n * sqy - sq * sy AS DOUBLE) AS cqy
          FROM m),
    f AS (SELECT fn,
                 cdq / cdd AS a,
                 ((cqq / fn) - (cdq / cdd) * (cdq / fn))
                 / (fn - 2.0) / (cdd / fn) AS se_a2,
                 (cqy * cdd - cdy * cdq)
                 / (cqq * cdd - cdq * cdq) AS b,
                 ((cyy
                   - ((cqy * cdd - cdy * cdq)
                      / (cqq * cdd - cdq * cdq)) * cqy
                   - ((cdy * cqq - cqy * cdq)
                      / (cqq * cdd - cdq * cdq)) * cdy) / fn)
                 / (fn - 3.0)
                 * (cdd / (cqq * cdd - cdq * cdq)) * fn AS se_b2
          FROM c)
    SELECT CAST(fn AS BIGINT) AS n_rows, a AS path_a, b AS path_b,
           a * b AS indirect_effect,
           a * b / sqrt(b * b * se_a2 + a * a * se_b2)
             AS sobel_z
    FROM f""")
def sobel_mediation(sf_dir: str):
    """SOBEL MEDIATION TEST for discount -> quantity -> revenue:
    path a (discount's effect on the mediator quantity), path b
    (quantity's effect on revenue holding discount), the indirect
    effect a*b and its Sobel z = ab / sqrt(b^2 se_a^2 + a^2
    se_b^2) — the classic mediation decomposition that says how
    much of a discount's revenue effect flows THROUGH volume
    (iv_wald asks a different causal question with the same
    variables). All ten moments are exact big-integer folds; both
    slopes, both OLS standard errors (closed forms on centered
    moments) and z are shared float expressions. Scale plan: one
    10-cell moment pass, map-only, O(blocks) driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_discount", "l_quantity",
                                  "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = np.floor(b["l_discount"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64).astype(object)
        q = b["l_quantity"].to_numpy(np.int64).astype(object)
        y = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64).astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sd_": [int(d.sum())], "sq": [int(q.sum())],
            "sy": [int(y.sum())], "sdd": [int((d * d).sum())],
            "sqq": [int((q * q).sum())],
            "syy": [int((y * y).sum())],
            "sdq": [int((d * q).sum())],
            "sdy": [int((d * y).sum())],
            "sqy": [int((q * y).sum())]})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "sd_", "sq", "sy", "sdd", "sqq", "syy",
                "sdq", "sdy", "sqy"], exact_int=True)
    n = int(s["n"].iloc[0])
    sd_, sq, sy = (int(s[c].iloc[0]) for c in ("sd_", "sq", "sy"))
    sdd, sqq, syy = (int(s[c].iloc[0])
                     for c in ("sdd", "sqq", "syy"))
    sdq, sdy, sqy = (int(s[c].iloc[0])
                     for c in ("sdq", "sdy", "sqy"))
    fn_ = np.float64(n)
    cdd = np.float64(n * sdd - sd_ * sd_)
    cqq = np.float64(n * sqq - sq * sq)
    cyy = np.float64(n * syy - sy * sy)
    cdq = np.float64(n * sdq - sd_ * sq)
    cdy = np.float64(n * sdy - sd_ * sy)
    cqy = np.float64(n * sqy - sq * sy)
    a = cdq / cdd
    se_a2 = ((cqq / fn_) - (cdq / cdd) * (cdq / fn_)) \
        / (fn_ - 2.0) / (cdd / fn_)
    det = cqq * cdd - cdq * cdq
    b = (cqy * cdd - cdy * cdq) / det
    b2 = (cdy * cqq - cqy * cdq) / det
    se_b2 = ((cyy - b * cqy - b2 * cdy) / fn_) / (fn_ - 3.0) \
        * (cdd / det) * fn_
    z = a * b / np.sqrt(b * b * se_a2 + a * a * se_b2)
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "path_a": [np.float64(a)],
        "path_b": [np.float64(b)],
        "indirect_effect": [np.float64(a * b)],
        "sobel_z": [np.float64(z)]})
