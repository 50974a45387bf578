# round-5 session-5 additions, batch 65: Cohen's h effect size for
# the arm rates, the weekend incidence-rate ratio with its log CI,
# and James-Stein shrunken per-language slopes.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_CH_TH = 14
_IRR_Z = 1.959963984540054


@register("cohens_h", sql="""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 2 AS BIGINT) AS arm,
                      CAST(CASE WHEN count(*) FILTER (
                           event_type = 'purchase') >= {th}
                           THEN 1 ELSE 0 END AS BIGINT) AS conv
               FROM events GROUP BY user_id),
    s AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(conv) AS BIGINT) AS c
          FROM u GROUP BY arm),
    f AS (SELECT
        (SELECT CAST(c AS DOUBLE) / CAST(n AS DOUBLE) FROM s
         WHERE arm = 0) AS p0,
        (SELECT CAST(c AS DOUBLE) / CAST(n AS DOUBLE) FROM s
         WHERE arm = 1) AS p1)
    SELECT p0 AS rate_control, p1 AS rate_treatment,
           2.0 * asin(sqrt(p1)) - 2.0 * asin(sqrt(p0))
             AS cohens_h,
           CAST(CASE WHEN abs(2.0 * asin(sqrt(p1))
                              - 2.0 * asin(sqrt(p0))) < 0.2
                     THEN 1 ELSE 0 END AS BIGINT) AS is_small
    FROM f""".format(th=_CH_TH))
def cohens_h(sf_dir: str):
    """COHEN'S H effect size for the arm heavy-purchaser rates:
    h = 2 arcsin(sqrt(p1)) - 2 arcsin(sqrt(p0)) — the
    variance-stabilized difference whose |h| < 0.2 'small' rule
    gives the PRACTICAL-significance reading that p-values
    (ab_test) and CIs (newcombe_diff_ci) don't; the effect-size
    convention power_sample_size implicitly assumes. Counts fold
    exactly through the user grain; h and the smallness flag are
    shared float expressions (both engines share the same libm
    asin/sqrt pipeline under round-6). Scale plan: per-user
    conversion through one user exchange; h is driver
    arithmetic."""
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
        conv = (a["pc"].to_numpy(np.int64)
                >= _CH_TH).astype(np.int64)
        out = pd.DataFrame({"arm": arm,
                            "n": np.ones(len(a), np.int64),
                            "c": conv}) \
            .groupby("arm", as_index=False).sum()
        for col in ("n", "c"):
            out[col] = out[col].astype(np.int64)
        return out

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["arm"], ["n", "c"])
    st = {int(r["arm"]): (int(r["n"]), int(r["c"]))
          for _, r in s.iterrows()}
    p0 = np.float64(st[0][1]) / np.float64(st[0][0])
    p1 = np.float64(st[1][1]) / np.float64(st[1][0])
    h = 2.0 * np.arcsin(np.sqrt(p1)) \
        - 2.0 * np.arcsin(np.sqrt(p0))
    return pd.DataFrame({
        "rate_control": [p0], "rate_treatment": [p1],
        "cohens_h": [np.float64(h)],
        "is_small": [np.int64(1 if np.abs(h) < 0.2 else 0)]})


@register("irr_weekend", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    g AS (SELECT CASE WHEN ((day + 3) % 7) + 1 >= 6 THEN 1
                      ELSE 0 END AS we,
                 CAST(sum(n) AS BIGINT) AS ev,
                 CAST(count(*) AS BIGINT) AS days
          FROM d GROUP BY 1),
    f AS (SELECT
        (SELECT ev FROM g WHERE we = 1) AS a,
        (SELECT days FROM g WHERE we = 1) AS ta,
        (SELECT ev FROM g WHERE we = 0) AS b,
        (SELECT days FROM g WHERE we = 0) AS tb)
    SELECT a AS weekend_events, ta AS weekend_days,
           b AS weekday_events, tb AS weekday_days,
           (CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
           / (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)) AS irr,
           exp(ln((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
                  / (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)))
               - {z} * sqrt(1.0 / CAST(a AS DOUBLE)
                            + 1.0 / CAST(b AS DOUBLE)))
             AS irr_lcl,
           exp(ln((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
                  / (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)))
               + {z} * sqrt(1.0 / CAST(a AS DOUBLE)
                            + 1.0 / CAST(b AS DOUBLE)))
             AS irr_ucl
    FROM f""".format(z=_IRR_Z))
def irr_weekend(sf_dir: str):
    """WEEKEND INCIDENCE-RATE RATIO: events per weekend day over
    events per weekday, with the Poisson log-scale 95% CI
    exp(ln IRR -+ z sqrt(1/a + 1/b)) — the epidemiology rate-ratio
    machinery (person-time denominators, not proportions) applied
    to traffic: 'is weekend load per day genuinely different?'
    with an interval, where dow_index gives only point factors.
    The weekend key is the integer (day+3)%7+1 >= 6 test; counts
    and day censuses are exact; IRR and both bounds are shared
    float expressions. Scale plan: bounded day-domain combine;
    O(1) driver arithmetic."""
    ds = _events(sf_dir, ["ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        g = pd.DataFrame({"day": day,
                          "n": np.ones(len(b), np.int64)}) \
            .groupby("day", as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["n"], exact_int=True)
    day = d["day"].to_numpy(np.int64)
    n = np.array([int(x) for x in d["n"]], np.int64)
    we = (((day + 3) % 7) + 1) >= 6
    a, ta = int(n[we].sum()), int(we.sum())
    b, tb = int(n[~we].sum()), int((~we).sum())
    irr = (np.float64(a) / np.float64(ta)) \
        / (np.float64(b) / np.float64(tb))
    half = _IRR_Z * np.sqrt(1.0 / np.float64(a)
                            + 1.0 / np.float64(b))
    return pd.DataFrame({
        "weekend_events": [np.int64(a)],
        "weekend_days": [np.int64(ta)],
        "weekday_events": [np.int64(b)],
        "weekday_days": [np.int64(tb)],
        "irr": [np.float64(irr)],
        "irr_lcl": [np.exp(np.log(irr) - half)],
        "irr_ucl": [np.exp(np.log(irr) + half)]})


@register("js_slopes", sql="""
    WITH r AS (SELECT lang,
                      CAST(n_chars AS BIGINT) AS y,
                      CAST(CAST(substr(source, 4) AS BIGINT) % 4
                           AS BIGINT) AS x
               FROM documents),
    m AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM r GROUP BY lang),
    sl AS (SELECT lang,
                  CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)
                       * 1000000.0 + 0.5) AS BIGINT) AS bm
           FROM m),
    t AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(bm) AS HUGEINT) AS sb,
                 CAST(sum(CAST(bm AS HUGEINT) * bm) AS HUGEINT)
                   AS sb2
          FROM sl),
    sh AS (SELECT greatest(0.0, 1.0
                  - CAST((SELECT k FROM t) - 3 AS DOUBLE)
                    * ((CAST((SELECT sb2 FROM t) AS DOUBLE)
                        - CAST((SELECT sb FROM t) AS DOUBLE)
                          * CAST((SELECT sb FROM t) AS DOUBLE)
                          / CAST((SELECT k FROM t) AS DOUBLE))
                       / CAST((SELECT k FROM t) AS DOUBLE))
                    / (CAST((SELECT sb2 FROM t) AS DOUBLE)
                       - CAST((SELECT sb FROM t) AS DOUBLE)
                         * CAST((SELECT sb FROM t) AS DOUBLE)
                         / CAST((SELECT k FROM t) AS DOUBLE)))
                    AS shrink)
    SELECT sl.lang,
           CAST(sl.bm AS DOUBLE) / 1000000.0 AS raw_slope,
           (SELECT shrink FROM sh) AS shrink_factor,
           (CAST((SELECT sb FROM t) AS DOUBLE)
            / CAST((SELECT k FROM t) AS DOUBLE)
            + (SELECT shrink FROM sh)
              * (CAST(sl.bm AS DOUBLE)
                 - CAST((SELECT sb FROM t) AS DOUBLE)
                   / CAST((SELECT k FROM t) AS DOUBLE)))
           / 1000000.0 AS js_slope
    FROM sl ORDER BY sl.lang""")
def js_slopes(sf_dir: str):
    """JAMES-STEIN SHRUNKEN PER-LANGUAGE SLOPES: each language's
    OLS slope of document length on the source grade, shrunk
    toward the cross-language mean slope with the positive-part
    factor (between-slope variance as the documented plug-in
    scale) — the random-slopes-lite multilevel move that stops a
    small language's noisy slope from driving decisions
    (james_stein for MEANS; this is the regression-coefficient
    version). Per-language slopes come from exact integer moments
    and quantize to micro; the shrinkage algebra runs on those
    exact ints with shared float expressions. Scale plan:
    per-language 5-cell moment partials, map-only; shrinkage is
    O(languages) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "n_chars", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = np.array([int(s[3:]) % 4 for s in b["source"]],
                     np.int64).astype(object)
        y = b["n_chars"].to_numpy(np.int64).astype(object)
        rows = []
        for lang in np.unique(b["lang"].to_numpy(object)):
            m = b["lang"].to_numpy(object) == lang
            rows.append({
                "lang": lang, "n": int(m.sum()),
                "sx": int(x[m].sum()), "sy": int(y[m].sum()),
                "sxx": int((x[m] * x[m]).sum()),
                "sxy": int((x[m] * y[m]).sum())})
        return pd.DataFrame(rows)

    m = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang"], ["n", "sx", "sy", "sxx", "sxy"],
        exact_int=True)
    bm = {}
    for _, r in m.iterrows():
        n = int(r["n"])
        sx, sy = int(r["sx"]), int(r["sy"])
        sxx, sxy = int(r["sxx"]), int(r["sxy"])
        bm[r["lang"]] = int(np.floor(
            np.float64(n * sxy - sx * sy)
            / np.float64(n * sxx - sx * sx)
            * 1000000.0 + 0.5))
    k = len(bm)
    sb = sum(bm.values())
    sb2 = sum(v * v for v in bm.values())
    var_b = (np.float64(sb2)
             - np.float64(sb) * np.float64(sb) / np.float64(k)) \
        / np.float64(k)
    ss = np.float64(sb2) \
        - np.float64(sb) * np.float64(sb) / np.float64(k)
    shrink = max(np.float64(0.0),
                 1.0 - np.float64(k - 3) * var_b / ss)
    gbar = np.float64(sb) / np.float64(k)
    rows = []
    for lang in sorted(bm):
        rows.append({
            "lang": lang,
            "raw_slope": np.float64(bm[lang]) / 1000000.0,
            "shrink_factor": np.float64(shrink),
            "js_slope": (gbar + shrink * (np.float64(bm[lang])
                                          - gbar)) / 1000000.0})
    return pd.DataFrame(rows)
