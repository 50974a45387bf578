# round-5 session-3 additions, batch 9: delta-method standard error
# of a clustered ratio metric, Nelson-Aalen cumulative hazard on the
# customer-churn durations, and Mantel-Haenszel pooled odds ratio
# across weekday strata.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map
from .q34_session2_additions_7 import _KM_CENSOR_DAYS


@register("ratio_delta_se", sql="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS y
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY user_id),
    s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM u)
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(sx AS BIGINT) AS sum_clicks,
           CAST(sy AS BIGINT) AS sum_purchase_cents,
           CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)
             AS ratio_cents_per_click,
           sqrt((CAST(n * syy - sy * sy AS DOUBLE)
                   / CAST(n * (n - 1) AS DOUBLE)
                 - 2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                   * (CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE))
                 + (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                   * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                   * (CAST(n * sxx - sx * sx AS DOUBLE)
                      / CAST(n * (n - 1) AS DOUBLE)))
                / CAST(n AS DOUBLE))
             / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS se_delta
    FROM s""")
def ratio_delta_se(sf_dir: str):
    """DELTA-METHOD standard error of a clustered ratio metric —
    purchase cents per click with the USER as the randomization unit,
    the standard fix for 'sessions per user vary so a per-event t-test
    is wrong' in experiment analysis (Deng et al., WSDM'18 shape).
    Per user x=clicks, y=purchase cents collapse through one user
    exchange; each partition emits exact integer moment partials
    (n, Sx, Sy, Sxx, Syy, Sxy) and the driver folds them as python
    ints (no overflow), then evaluates
    se = sqrt((varY - 2r*cov + r^2 varX)/n) / meanX with r = Sy/Sx in
    the IDENTICAL double expression order as the oracle, so floats
    agree bit-for-bit. Scale plan: moments are per-partition scalars —
    nothing user-grain ever reaches the driver; per-partition int64
    dot products hold to ~1e5 users x 1e6 cents per partition, and the
    cross-partition fold is arbitrary-precision."""
    ds = _events(sf_dir, ["user_id", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"].isin(("click", "purchase"))]
        is_click = (b["event_type"] == "click").to_numpy()
        cents = np.floor(b["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "user": b["user_id"].to_numpy(np.int64),
            "x": is_click.astype(np.int64),
            "y": np.where(is_click, 0, cents),
        }).groupby("user", as_index=False).sum()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas")

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user", as_index=False)[["x", "y"]].sum()
        x = a["x"].to_numpy(np.int64)
        y = a["y"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": np.zeros(1, np.int64),
            "n": np.array([len(a)], np.int64),
            "sx": np.array([x.sum()], np.int64),
            "sy": np.array([y.sum()], np.int64),
            "sxx": np.array([np.dot(x, x)], np.int64),
            "syy": np.array([np.dot(y, y)], np.int64),
            "sxy": np.array([np.dot(x, y)], np.int64)})

    s = _combine_partials(
        partition_map(parts, ["user"], moments, 16),
        ["k"], ["n", "sx", "sy", "sxx", "syy", "sxy"],
        exact_int=True)
    n = int(s["n"].iloc[0])
    sx, sy = int(s["sx"].iloc[0]), int(s["sy"].iloc[0])
    sxx, syy = int(s["sxx"].iloc[0]), int(s["syy"].iloc[0])
    sxy = int(s["sxy"].iloc[0])
    r = np.float64(sy) / np.float64(sx)
    var_y = np.float64(n * syy - sy * sy) / np.float64(n * (n - 1))
    cov = np.float64(n * sxy - sx * sy) / np.float64(n * (n - 1))
    var_x = np.float64(n * sxx - sx * sx) / np.float64(n * (n - 1))
    inner = var_y - 2.0 * r * cov + r * r * var_x
    se = np.sqrt(inner / np.float64(n)) \
        / (np.float64(sx) / np.float64(n))
    return pd.DataFrame({
        "n_users": [np.int64(n)], "sum_clicks": [np.int64(sx)],
        "sum_purchase_cents": [np.int64(sy)],
        "ratio_cents_per_click": [r], "se_delta": [se]})


@register("nelson_aalen", sql="""
    WITH span AS (SELECT max(o_orderdate) AS mx FROM orders),
    c AS (
      SELECT o_custkey,
             CAST(date_diff('day', min(o_orderdate),
                            max(o_orderdate)) AS BIGINT) AS dur,
             CAST(CASE WHEN date_diff('day', max(o_orderdate),
                         (SELECT mx FROM span)) > {cd}
                  THEN 1 ELSE 0 END AS BIGINT) AS ev
      FROM orders GROUP BY 1),
    h AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
                 CAST(sum(ev) AS BIGINT) AS d
          FROM c GROUP BY 1),
    r AS (SELECT dur, d,
                 CAST(sum(n_all) OVER (ORDER BY dur DESC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
          FROM h),
    t AS (SELECT dur, n_risk, d,
                 CAST(floor(CAST(d AS DOUBLE) * 1000000.0
                            / CAST(n_risk AS DOUBLE) + 0.5)
                      AS BIGINT) AS term
          FROM r WHERE d > 0)
    SELECT dur AS duration_days, n_risk, d AS d_events,
           CAST(sum(term) OVER (ORDER BY dur
                ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS hazard_cum_micro
    FROM t ORDER BY dur""".format(cd=_KM_CENSOR_DAYS))
def nelson_aalen(sf_dir: str):
    """NELSON-AALEN cumulative hazard H(t) = sum_{t_i <= t} d_i/n_i
    over the same right-censored customer-lifetime data as
    kaplan_meier (shared _KM_CENSOR_DAYS rule, so the two curves are
    directly comparable: KM reports cumulative log-survival,
    Nelson-Aalen the cumulative hazard that -log S(t) approximates).
    Each step's d/n quantizes to exact micro units with the SAME
    double expression (d*1e6/n + 0.5 floored) in both engines, and the
    curve is an int64 prefix sum — bit-exact. Plan: identical to
    kaplan_meier — per-customer (first,last) partials through one
    customer exchange emitting duration histograms; the at-risk suffix
    sum and prefix-sum hazard run on the driver's bounded day-domain
    series."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    mx_all = int(ds.map_batches(
        lambda b: pd.DataFrame({
            "mx": [b["o_orderdate"].to_numpy("datetime64[D]")
                   .astype(np.int64).max()]}),
        batch_format="pandas").to_pandas()["mx"].max())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        return pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "mn": d, "mx": d}) \
            .groupby("cust", as_index=False).agg(
                mn=("mn", "min"), mx=("mx", "max"))

    parts = ds.map_batches(partial, batch_format="pandas")

    def hist_part(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("cust", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"))
        dur = (a["mx"] - a["mn"]).to_numpy(np.int64)
        ev = ((mx_all - a["mx"].to_numpy(np.int64))
              > _KM_CENSOR_DAYS).astype(np.int64)
        out = pd.DataFrame({
            "dur": dur, "n_all": np.ones(len(a), np.int64),
            "ev": ev}).groupby("dur", as_index=False).sum()
        for c in ("n_all", "ev"):
            out[c] = out[c].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(parts, ["cust"], hist_part, 16),
        ["dur"], ["n_all", "ev"])
    h = h.sort_values("dur", kind="mergesort").reset_index(drop=True)
    n_all = h["n_all"].to_numpy(np.int64)
    d = h["ev"].to_numpy(np.int64)
    n_risk = np.cumsum(n_all[::-1])[::-1]
    keep = d > 0
    dur_k = h["dur"].to_numpy(np.int64)[keep]
    nr, dk = n_risk[keep], d[keep]
    term = np.floor(dk.astype(np.float64) * 1000000.0
                    / nr.astype(np.float64) + 0.5).astype(np.int64)
    return pd.DataFrame({
        "duration_days": dur_k, "n_risk": nr, "d_events": dk,
        "hazard_cum_micro": np.cumsum(term).astype(np.int64)})


@register("mantel_haenszel", sql="""
    WITH e AS (SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT)
                        AS stratum,
                      CASE WHEN user_id % 2 = 0
                           THEN 1 ELSE 0 END AS exposed,
                      CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END AS outcome
               FROM events),
    t AS (SELECT stratum,
                 CAST(sum(exposed * outcome) AS BIGINT) AS a,
                 CAST(sum(exposed * (1 - outcome)) AS BIGINT) AS b,
                 CAST(sum((1 - exposed) * outcome) AS BIGINT) AS c,
                 CAST(sum((1 - exposed) * (1 - outcome)) AS BIGINT)
                   AS d,
                 CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY stratum),
    m AS (SELECT stratum, a, b, c, d, n,
                 (CAST(a AS HUGEINT) * d * 2000000 + n)
                   // (2 * CAST(n AS HUGEINT)) AS ad_micro,
                 (CAST(b AS HUGEINT) * c * 2000000 + n)
                   // (2 * CAST(n AS HUGEINT)) AS bc_micro
          FROM t)
    SELECT stratum, a, b, c, d, n,
           CAST(ad_micro AS BIGINT) AS ad_over_n_micro,
           CAST(bc_micro AS BIGINT) AS bc_over_n_micro,
           CAST(sum(ad_micro) OVER () AS DOUBLE)
             / CAST(sum(bc_micro) OVER () AS DOUBLE) AS or_mh
    FROM m ORDER BY stratum""")
def mantel_haenszel(sf_dir: str):
    """MANTEL-HAENSZEL pooled odds ratio across weekday strata:
    exposure = even user_id (the deterministic hash-bucket arm),
    outcome = purchase event, stratified by ISO day-of-week so a
    weekday/weekend traffic mix can't confound the pooled estimate —
    the classic stratified 2x2 pooling OR_MH = sum(a_k d_k/n_k) /
    sum(b_k c_k/n_k). Each stratum's a*d/n and b*c/n quantize to
    exact micro units in PURE INTEGER arithmetic ((a*d*2e6 + n) //
    (2n), half-up — no float division anywhere), so the per-stratum
    columns and the pooled ratio (one final double division of two
    int sums) are bit-exact across engines. Plan: per-batch
    (stratum, exposed, outcome) count partials — at most 28 cells per
    batch — collapse on the driver; nothing scales with corpus size.
    HUGEINT/python-int products keep a*d*2e6 exact at any count."""
    ds = _events(sf_dir, ["ts", "user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "stratum": b["ts"].dt.dayofweek.to_numpy(np.int64) + 1,
            "exposed": (b["user_id"].to_numpy(np.int64) % 2 == 0)
            .astype(np.int64),
            "outcome": (b["event_type"] == "purchase")
            .to_numpy().astype(np.int64),
            "cnt": np.ones(len(b), np.int64)}) \
            .groupby(["stratum", "exposed", "outcome"],
                     as_index=False).sum()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["stratum", "exposed", "outcome"], ["cnt"])

    rows = []
    for stratum, g in p.groupby("stratum"):
        cell = {(int(e), int(o)): int(c) for e, o, c in
                zip(g["exposed"], g["outcome"], g["cnt"])}
        a = cell.get((1, 1), 0)
        b = cell.get((1, 0), 0)
        c = cell.get((0, 1), 0)
        d = cell.get((0, 0), 0)
        n = a + b + c + d
        rows.append({
            "stratum": int(stratum), "a": a, "b": b, "c": c, "d": d,
            "n": n,
            "ad_over_n_micro": (a * d * 2_000_000 + n) // (2 * n),
            "bc_over_n_micro": (b * c * 2_000_000 + n) // (2 * n)})
    out = pd.DataFrame(rows).sort_values(
        "stratum", kind="mergesort").reset_index(drop=True)
    or_mh = np.float64(int(out["ad_over_n_micro"].sum())) \
        / np.float64(int(out["bc_over_n_micro"].sum()))
    out["or_mh"] = or_mh
    for c in ("stratum", "a", "b", "c", "d", "n",
              "ad_over_n_micro", "bc_over_n_micro"):
        out[c] = out[c].astype(np.int64)
    return out
